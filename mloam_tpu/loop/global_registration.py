"""Priorless global registration: batched FPFH features + correspondence
RANSAC.

Counterpart of the reference's FPFH + FastGlobalRegistration stage
(``mloam_loop/src/loop_registration.cpp:37-89`` with the vendored FGR):
used when no pose prior exists for a loop candidate (relocalization,
severely drifted loops). SURVEY §7.4 ranked this the hardest TPU kernel —
the design here keeps every stage a fixed-shape batched tensor op:

  * normals: kNN + closed-form smallest eigenvector (ops/sym3x3)
  * SPFH/FPFH: the Darboux-frame angle triplet (α, φ, θ) over k neighbors,
    histogrammed by one-hot scatter (11 bins x 3 = 33-D), neighbor-averaged
  * correspondences: 33-D feature nearest neighbors — one MXU matmul
  * hypotheses: H random correspondence triplets → batched Kabsch
    (closed-form 3x3 via SVD) → inlier counting on the correspondence set
  * refinement: Kabsch on the best hypothesis's inliers

No RANSAC loop — all H hypotheses are evaluated in parallel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.ops import knn as knn_ops
from mloam_tpu.ops import sym3x3

N_BINS = 11


def estimate_normals(xyz: jnp.ndarray, mask: jnp.ndarray, k: int = 10):
    """[N, 3] unit normals from kNN PCA (sign not disambiguated — FPFH
    angles use them symmetrically enough for matching)."""
    d, idx = knn_ops.knn(xyz, xyz, mask, k)
    nn = xyz[idx]
    centroid = jnp.mean(nn, axis=1)
    rel = nn - centroid[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", rel, rel)
    _, n = sym3x3.smallest_eigvec3(cov)
    return n, idx, d


def _spfh(xyz, normals, idx, valid_pair):
    """Simplified point feature histograms per point. idx [N, k] neighbor
    indices; valid_pair [N, k]. Returns [N, 33]."""
    p = xyz[:, None, :]
    q = xyz[idx]
    n_p = normals[:, None, :]
    n_q = normals[idx]
    dvec = q - p
    dist = jnp.linalg.norm(dvec, axis=-1, keepdims=True)
    dunit = dvec / jnp.maximum(dist, 1e-9)
    u = jnp.broadcast_to(n_p, q.shape)
    v = jnp.cross(dunit, u)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    w = jnp.cross(u, v)
    alpha = jnp.sum(v * n_q, -1)                       # [-1, 1]
    phi = jnp.sum(u * dunit, -1)                       # [-1, 1]
    theta = jnp.arctan2(jnp.sum(w * n_q, -1), jnp.sum(u * n_q, -1))  # [-pi, pi]

    def hist(vals, lo, hi):
        b = jnp.floor((vals - lo) / (hi - lo) * N_BINS).astype(jnp.int32)
        b = jnp.clip(b, 0, N_BINS - 1)
        oh = jax.nn.one_hot(b, N_BINS, dtype=xyz.dtype)
        oh = oh * valid_pair[..., None]
        return jnp.sum(oh, axis=1)                     # [N, N_BINS]

    h = jnp.concatenate(
        [hist(alpha, -1.0, 1.0), hist(phi, -1.0, 1.0),
         hist(theta, -jnp.pi, jnp.pi)], axis=-1
    )
    denom = jnp.maximum(jnp.sum(valid_pair, -1, keepdims=True), 1.0)
    return h / denom


def fpfh(xyz: jnp.ndarray, mask: jnp.ndarray, k: int = 10) -> jnp.ndarray:
    """[N, 33] FPFH descriptors (masked-out rows are zero)."""
    normals, idx, d = estimate_normals(xyz, mask, k)
    valid_pair = mask[:, None] & mask[idx] & (d < 25.0) & (d > 1e-8)
    spfh = _spfh(xyz, normals, idx, valid_pair)
    # neighbor-weighted sum (weights 1/dist)
    wgt = jnp.where(valid_pair, 1.0 / jnp.maximum(jnp.sqrt(d), 1e-3), 0.0)
    neigh = jnp.einsum("nk,nkf->nf", wgt, spfh[idx])
    wsum = jnp.maximum(jnp.sum(wgt, -1, keepdims=True), 1e-9)
    out = spfh + neigh / wsum
    return jnp.where(mask[:, None], out, 0.0)


def _kabsch(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray) -> Pose:
    """Weighted rigid alignment dst ≈ R src + t. src/dst [..., M, 3]."""
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    cs = jnp.sum(src * w[..., None], -2) / wsum
    cd = jnp.sum(dst * w[..., None], -2) / wsum
    s0 = src - cs[..., None, :]
    d0 = dst - cd[..., None, :]
    H = jnp.einsum("...mi,...m,...mj->...ij", s0, w, d0)
    U, S, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik",
                                    jnp.swapaxes(Vt, -1, -2),
                                    jnp.swapaxes(U, -1, -2)))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], -1)
    R = jnp.einsum("...ji,...j,...kj->...ik", Vt, D, U)  # V diag(D) U^T
    t = cd - jnp.einsum("...ij,...j->...i", R, cs)
    return Pose(rot.matrix_to_quat(R), t)


class GlobalRegResult(NamedTuple):
    pose: Pose            # dst <- src
    inlier_frac: jnp.ndarray
    n_corr: jnp.ndarray
    ok: jnp.ndarray


def register_global(
    src_xyz, src_mask, dst_xyz, dst_mask,
    key: jax.Array,
    k_feat: int = 12,
    n_hypotheses: int = 512,
    inlier_dist: float = 0.5,
    ratio: float = 0.95,
    min_inlier_frac: float = 0.2,
    exclude_flat_normals: float = 0.92,
) -> GlobalRegResult:
    """FPFH + parallel-RANSAC estimate of dst <- src.

    Ground-like points (|normal·z| above ``exclude_flat_normals``) are
    excluded from *source* correspondences — their descriptors are all
    identical and swamp the matching (the reference's FGR copes via its
    annealed optimization; here the fix is cheaper). A Lowe ratio test on
    the top-2 feature neighbors replaces mutual gating.
    """
    normals_src, _, _ = estimate_normals(src_xyz, src_mask, k_feat)
    f_src = fpfh(src_xyz, src_mask, k_feat)
    f_dst = fpfh(dst_xyz, dst_mask, k_feat)

    distinctive = jnp.abs(normals_src[:, 2]) < exclude_flat_normals

    # feature correspondences (src -> dst): top-2 for the ratio test
    d_sd, nn_sd = knn_ops.knn(f_src, f_dst, dst_mask, 2)
    corr_dst = nn_sd[:, 0]
    passes_ratio = d_sd[:, 0] < (ratio ** 2) * jnp.maximum(d_sd[:, 1], 1e-12)
    valid = src_mask & distinctive & passes_ratio & (d_sd[:, 0] < 1e8)

    ps = src_xyz
    pd = dst_xyz[corr_dst]
    w_corr = valid.astype(src_xyz.dtype)
    n_corr = jnp.sum(valid)

    # hypotheses: random correspondence triplets, probability ∝ validity
    probs = w_corr / jnp.maximum(jnp.sum(w_corr), 1.0)
    tri = jax.random.choice(
        key, src_xyz.shape[0], shape=(n_hypotheses, 3), p=probs
    )
    T_h = _kabsch(ps[tri], pd[tri], jnp.ones((n_hypotheses, 3)))

    # score every hypothesis on the full correspondence set
    ps_t = rot.quat_rotate(T_h.q[:, None, :], ps[None]) + T_h.t[:, None, :]
    err = jnp.linalg.norm(ps_t - pd[None], axis=-1)
    inl = (err < inlier_dist) & valid[None]
    score = jnp.sum(inl, axis=-1)
    best = jnp.argmax(score)

    # refine on the winning inlier set (two re-weighted rounds)
    w_in = inl[best].astype(src_xyz.dtype)
    T_ref = _kabsch(ps, pd, w_in)
    for _ in range(2):
        ps_r = rot.quat_rotate(T_ref.q[None], ps) + T_ref.t[None]
        inl_r = (jnp.linalg.norm(ps_r - pd, axis=-1) < inlier_dist) & valid
        T_ref = _kabsch(ps, pd, inl_r.astype(src_xyz.dtype))
    ps_r = rot.quat_rotate(T_ref.q[None], ps) + T_ref.t[None]
    inl_r = (jnp.linalg.norm(ps_r - pd, axis=-1) < inlier_dist) & valid
    frac = jnp.sum(inl_r) / jnp.maximum(n_corr, 1)
    return GlobalRegResult(
        pose=T_ref,
        inlier_frac=frac,
        n_corr=n_corr,
        ok=(frac > min_inlier_frac) & (n_corr > 30),
    )


# ---------------------------------------------------------------------------
# correlation-based priorless registration (yaw sweep + FFT translation)
# ---------------------------------------------------------------------------

def occupancy_grid(xyz, mask, extent: float, res: float):
    """[G, G] occupancy image over x-y (soft counts, mean-removed)."""
    g = int(round(2 * extent / res))
    ij = jnp.floor((xyz[:, :2] + extent) / res).astype(jnp.int32)
    ok = (
        mask
        & jnp.all(ij >= 0, axis=-1)
        & jnp.all(ij < g, axis=-1)
    )
    flat = jnp.clip(ij[:, 0] * g + ij[:, 1], 0, g * g - 1)
    img = jnp.zeros((g * g,)).at[flat].add(jnp.where(ok, 1.0, 0.0))
    img = jnp.minimum(img.reshape(g, g), 3.0)  # clip density
    return img - jnp.mean(img)


def _xcorr_peak(a: jnp.ndarray, b: jnp.ndarray):
    """Circular cross-correlation peak of b relative to a via FFT.
    Returns (shift_rows, shift_cols, peak_value) with shifts in (-G/2, G/2]."""
    g = a.shape[0]
    fa = jnp.fft.rfft2(a)
    fb = jnp.fft.rfft2(b)
    corr = jnp.fft.irfft2(fa * jnp.conj(fb), s=(g, g))
    idx = jnp.argmax(corr)
    r, c = idx // g, idx % g
    r = jnp.where(r > g // 2, r - g, r)
    c = jnp.where(c > g // 2, c - g, c)
    return r, c, corr.reshape(-1)[idx]


def register_correlation(
    src_xyz, src_mask, dst_xyz, dst_mask,
    n_yaw: int = 72,
    extent: float = 40.0,
    res: float = 0.5,
    min_score: float = 3.0,
    min_z: float = 0.0,
) -> GlobalRegResult:
    """Priorless coarse registration by exhaustive yaw sweep + FFT
    translation correlation on x-y occupancy grids.

    TPU-natural alternative to FPFH+FGR for structured scenes where planar
    descriptors are ambiguous: all ``n_yaw`` rotations are rendered and
    correlated in one batch (FFTs on the MXU/VPU); z from the mean height
    difference. Score gate = peak/σ of the best correlation surface.
    """
    yaws = jnp.arange(n_yaw) * (2 * jnp.pi / n_yaw)

    # drop the ground: both sensor-frame clouds contain a sensor-centred
    # ground disk whose correlation peak is at zero shift regardless of the
    # true motion — it must not vote. Structure above the sensor plane is
    # position-locked to the world.
    src_mask = src_mask & (src_xyz[:, 2] > min_z)
    dst_mask = dst_mask & (dst_xyz[:, 2] > min_z)

    dst_img = occupancy_grid(dst_xyz, dst_mask, extent, res)
    g0 = dst_img.shape[0]
    g = 2 * g0  # zero-pad to double size: linear (not circular) correlation
    fd = jnp.fft.rfft2(dst_img, s=(g, g))

    def per_yaw(yaw):
        q = rot.so3_exp_quat(jnp.array([0.0, 0.0, 1.0]) * yaw)
        pts = rot.quat_rotate(q[None], src_xyz)
        img = occupancy_grid(pts, src_mask, extent, res)
        fs = jnp.fft.rfft2(img, s=(g, g))
        corr = jnp.fft.irfft2(fd * jnp.conj(fs), s=(g, g))
        idx = jnp.argmax(corr)
        return corr.reshape(-1)[idx], idx, jnp.std(corr)

    scores, idxs, stds = jax.vmap(per_yaw)(yaws)
    best = jnp.argmax(scores / jnp.maximum(stds, 1e-9))
    yaw = yaws[best]
    idx = idxs[best]
    r = idx // g
    c = idx % g
    r = jnp.where(r > g // 2, r - g, r)
    c = jnp.where(c > g // 2, c - g, c)
    # correlation conv theorem: corr[d] = sum_a dst[a] src[a - d] → the peak
    # d is dst_pos - src_pos in grid cells (rows = x, cols = y)
    dx = r.astype(jnp.float32) * res
    dy = c.astype(jnp.float32) * res
    q = rot.so3_exp_quat(jnp.array([0.0, 0.0, 1.0]) * yaw)
    # z: align mean heights
    zs = jnp.sum(jnp.where(src_mask, src_xyz[:, 2], 0.0)) / jnp.maximum(
        jnp.sum(src_mask), 1)
    zd = jnp.sum(jnp.where(dst_mask, dst_xyz[:, 2], 0.0)) / jnp.maximum(
        jnp.sum(dst_mask), 1)
    t = jnp.array([dx, dy, zd - zs])
    snr = scores[best] / jnp.maximum(stds[best], 1e-9)
    return GlobalRegResult(
        pose=Pose(q, t),
        inlier_frac=snr,  # repurposed: correlation SNR
        n_corr=jnp.asarray(n_yaw),
        ok=snr > min_score,
    )
