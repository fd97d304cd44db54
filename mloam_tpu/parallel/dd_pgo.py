"""Nested-dissection pose-sharded PGO/BA: the communication-avoiding
distributed solver.

TPU-native counterpart of the reference's PGO thread
(``mloam_loop/src/pose_graph.cpp:491-653``: Ceres over keyframe (q, t),
sequential RelativeRTError edges to 4 predecessors + loop edges), designed
to meet the >=80% multi-chip/multi-host scaling-efficiency target that the
factor-sharded CG design (``sharded_pgo.py``) cannot: that design psums a
replicated [N,6] vector every CG iteration (~3.3 MB per GN iteration at
1024 poses) against tiny per-shard edge math, so its own comm/compute model
predicts 21% ICI / 2% DCN efficiency.

Here the *poses* are sharded, not just the edges:

  * Each shard owns a contiguous trajectory block. Poses whose edges never
    leave the shard are *interior*; poses touched by a cross-shard edge
    (skip-edge straddling a block boundary, or a loop closure) are
    *separators* — a small set: ~2x(skip width) per boundary + 2 per loop.
  * Per GN iteration each shard linearizes its own edges (+ its poses'
    scan-to-map point factors, re-associated in-step against its map shard)
    and assembles a LOCAL dense Hessian over
    [its interiors | its host's intra separators | global separators].
  * Interiors are eliminated locally: one Cholesky + triangular solves on
    the MXU — this is also where the FLOPs live, the fat local compute
    that hides the reduction.
  * ONE psum of the reduced separator system per GN iteration. On a 2-D
    (host, factor) mesh the reduction is two-level nested dissection: the
    [intra | global] system psums over ICI within the host, each host then
    eliminates its intra separators locally, and only the global
    (host-boundary + cross-host loop) system crosses DCN.
  * The tiny replicated separator solve closes the step; interiors
    back-substitute locally.

The step is algebraically EXACT — identical (up to fp roundoff) to the
dense single-device damped-GN step in ``sharded_pgo.pgo_step``, because
block elimination of a damped SPD system is a reordered factorization.
Equivalence is pinned by tests/test_dd_pgo.py on the virtual 8-device mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from mloam_tpu.core import rotations as rot
from mloam_tpu.core import se3
from mloam_tpu.core.se3 import Pose
from mloam_tpu.parallel.sharded_pgo import (
    PoseGraphEdges,
    boxplus_dof4,
    edge_residual,
    edge_residual_dof4,
)


class DDPartition(NamedTuple):
    """Static partition of a pose graph for nested-dissection SPMD solve.

    Built on host (numpy) from the edge list — graph topology is host data
    (keyframe DB indices), so this never traces. All arrays are padded to
    static shapes; masks mark live entries.

    P = number of shards, H = number of hosts (level-2 groups; 1 = flat).
    The GLOBAL separator slot table is [host0-intra | ... | hostH-1-intra |
    global] with SI intra slots per host and SG global slots. Each shard's
    LOCAL tangent layout is [MI interiors | SI own-host intra | SG global]
    (+ one trash block) — a shard's edges can never touch another host's
    intra separators, so those blocks are structurally zero and are never
    assembled or communicated.
    """

    int_idx: np.ndarray    # [P, MI] global pose index per interior slot
    int_mask: np.ndarray   # [P, MI] 1 = live
    sep_idx: np.ndarray    # [H*SI + SG] global pose index per sep slot
    sep_mask: np.ndarray   # [H*SI + SG]
    sep_owner: np.ndarray  # [H*SI + SG] shard owning each separator pose
    n_hosts: int
    si: int                # intra separator slots per host (0 if H == 1)
    sg: int                # global separator slots
    e_i: np.ndarray        # [P, EM] global source pose index
    e_j: np.ndarray        # [P, EM] global target pose index
    e_li: np.ndarray       # [P, EM] LOCAL slot of i (MI + SI + SG = trash)
    e_lj: np.ndarray       # [P, EM] LOCAL slot of j
    e_gidx: np.ndarray     # [P, EM] index into the global edge array
    e_mask: np.ndarray     # [P, EM]
    # owned separators: each separator pose belongs to exactly one shard,
    # which computes its (per-pose) point factors — no redundant work
    own_rows: np.ndarray   # [P, SO] global pose index of owned separators
    own_slot: np.ndarray   # [P, SO] LOCAL sep slot (trash for padding)
    own_mask: np.ndarray   # [P, SO]
    anchor_slot: int       # rank of the anchor within the GLOBAL block


def build_partition(edge_i: np.ndarray, edge_j: np.ndarray, n_poses: int,
                    n_shards: int, n_hosts: int = 1,
                    anchor_idx: int = 0) -> DDPartition:
    """Classify poses into interiors/separators and assign edges to shards.

    Poses are split into ``n_shards`` contiguous blocks (trajectory order —
    keyframes are created in time order, so sequential/skip edges are
    block-local except near boundaries). A pose is a *separator* iff some
    edge connects it to a pose in another shard, or it is the anchor. With
    ``n_hosts > 1``, shards group contiguously into hosts and a separator
    is *host-intra* iff none of its edges leave its host group.
    """
    edge_i = np.asarray(edge_i)
    edge_j = np.asarray(edge_j)
    block = -(-n_poses // n_shards)  # ceil
    owner = np.minimum(np.arange(n_poses) // block, n_shards - 1)
    shards_per_host = max(n_shards // max(n_hosts, 1), 1)
    host_of_shard = np.minimum(np.arange(n_shards) // shards_per_host,
                               n_hosts - 1)
    host = host_of_shard[owner]

    oi, oj = owner[edge_i], owner[edge_j]
    cross = oi != oj
    is_sep = np.zeros(n_poses, bool)
    is_sep[edge_i[cross]] = True
    is_sep[edge_j[cross]] = True
    is_sep[anchor_idx] = True

    if n_hosts > 1:
        hcross = host[edge_i] != host[edge_j]
        is_glob = np.zeros(n_poses, bool)
        is_glob[edge_i[hcross]] = True
        is_glob[edge_j[hcross]] = True
        is_glob[anchor_idx] = True
        is_glob &= is_sep
    else:
        is_glob = is_sep.copy()
    is_intra = is_sep & ~is_glob

    si = 0
    intra_by_host: list[np.ndarray] = []
    for h in range(n_hosts):
        ids = np.where(is_intra & (host == h))[0]
        intra_by_host.append(ids)
        si = max(si, len(ids))
    if n_hosts == 1:
        si = 0
    glob_ids = np.where(is_glob)[0]
    sg = len(glob_ids)
    S = n_hosts * si + sg
    sep_idx = np.zeros(S, np.int32)
    sep_mask = np.zeros(S, np.float32)
    # intra_rank: rank of an intra separator within its host's block;
    # glob_rank: rank within the global block
    intra_rank = np.full(n_poses, -1, np.int64)
    glob_rank = np.full(n_poses, -1, np.int64)
    for h in range(n_hosts):
        ids = intra_by_host[h]
        sep_idx[h * si:h * si + len(ids)] = ids
        sep_mask[h * si:h * si + len(ids)] = 1.0
        intra_rank[ids] = np.arange(len(ids))
    sep_idx[n_hosts * si:] = glob_ids
    sep_mask[n_hosts * si:] = 1.0
    glob_rank[glob_ids] = np.arange(sg)

    mi = 0
    int_by_shard = []
    for s in range(n_shards):
        ids = np.where((owner == s) & ~is_sep)[0]
        int_by_shard.append(ids)
        mi = max(mi, len(ids))
    mi = max(mi, 1)  # keep A non-empty even if every pose is a separator
    int_idx = np.zeros((n_shards, mi), np.int32)
    int_mask = np.zeros((n_shards, mi), np.float32)
    int_slot = np.full(n_poses, -1, np.int64)
    for s in range(n_shards):
        ids = int_by_shard[s]
        int_idx[s, :len(ids)] = ids
        int_mask[s, :len(ids)] = 1.0
        int_slot[ids] = np.arange(len(ids))

    # edge -> shard of owner(i); cross-shard edges touch only separators so
    # any shard seeing them has both endpoints in its local tangent space
    eshard = oi
    em = max(int(np.bincount(eshard, minlength=n_shards).max()), 1)
    s_loc = si + sg
    trash = mi + s_loc

    def local_slot(p):
        # interiors -> [0, MI); own-host intra -> MI + rank; global ->
        # MI + SI + rank. (Edges of shard s only ever touch host(s) intra.)
        return np.where(
            is_glob[p], mi + si + glob_rank[p],
            np.where(is_sep[p], mi + intra_rank[p], int_slot[p]))

    e_i = np.zeros((n_shards, em), np.int32)
    e_j = np.zeros((n_shards, em), np.int32)
    e_li = np.full((n_shards, em), trash, np.int32)
    e_lj = np.full((n_shards, em), trash, np.int32)
    e_gidx = np.zeros((n_shards, em), np.int32)
    e_mask = np.zeros((n_shards, em), np.float32)
    for s in range(n_shards):
        ids = np.where(eshard == s)[0]
        k = len(ids)
        e_i[s, :k] = edge_i[ids]
        e_j[s, :k] = edge_j[ids]
        e_li[s, :k] = local_slot(edge_i[ids])
        e_lj[s, :k] = local_slot(edge_j[ids])
        e_gidx[s, :k] = ids
        e_mask[s, :k] = 1.0

    # owned-separator tables: the owner shard computes that pose's point
    # factors exactly once and scatters the 6x6 block to its local slot
    sep_pose_ids = np.where(is_sep)[0]
    so = max(int(np.bincount(owner[sep_pose_ids],
                             minlength=n_shards).max()), 1)
    own_rows = np.zeros((n_shards, so), np.int32)
    own_slot = np.full((n_shards, so), trash, np.int32)
    own_mask = np.zeros((n_shards, so), np.float32)
    for s in range(n_shards):
        ids = sep_pose_ids[owner[sep_pose_ids] == s]
        k = len(ids)
        own_rows[s, :k] = ids
        own_slot[s, :k] = local_slot(ids)
        own_mask[s, :k] = 1.0

    return DDPartition(
        int_idx=int_idx, int_mask=int_mask,
        sep_idx=sep_idx, sep_mask=sep_mask,
        sep_owner=owner[sep_idx].astype(np.int32),
        n_hosts=n_hosts, si=si, sg=sg,
        e_i=e_i, e_j=e_j, e_li=e_li, e_lj=e_lj,
        e_gidx=e_gidx, e_mask=e_mask,
        own_rows=own_rows, own_slot=own_slot, own_mask=own_mask,
        anchor_slot=int(glob_rank[anchor_idx]),
    )


class PointFactors(NamedTuple):
    """Per-pose scan-to-map point-to-plane factors (the BA fattener).

    The reference's LidarMapPlaneNormFactor (``estimator/src/factor/
    lidar_map_factor.hpp:26-141``): residual w * (n . (T p) + d) for a
    world-frame plane (n, d) matched to body-frame scan point p. Attached
    per pose, these touch only that pose's 6x6 diagonal block — zero
    communication, pure local VPU/MXU work in the sharded solve.
    """

    pts: jnp.ndarray      # [N, K, 3] scan points in body frame
    normals: jnp.ndarray  # [N, K, 3] world-frame plane unit normals
    d: jnp.ndarray        # [N, K] plane offsets
    w: jnp.ndarray        # [N, K] sqrt-info weights (0 = invalid)


class MapShard(NamedTuple):
    """Per-pose candidate map planes for IN-STEP re-association.

    The reference re-associates every outer mapping iteration
    (``lidar_mapper_keyframe.cpp:423-639``: kd-tree rebuild + match before
    each solve). Here each pose carries M candidate map planes (from the
    voxel map surrounding its trajectory segment); every GN iteration the
    scan points are re-matched to the nearest plane anchor by a [K, M]
    distance matmul — MXU work that stays entirely on the owning shard.
    """

    pts: jnp.ndarray      # [N, K, 3] scan points in body frame
    anchors: jnp.ndarray  # [N, M, 3] world-frame plane anchor points
    normals: jnp.ndarray  # [N, M, 3] world-frame plane unit normals
    w: jnp.ndarray        # [N, K] per-scan-point sqrt-info (0 = invalid)
    valid: jnp.ndarray    # [N, M] candidate validity mask


def associate_block(pose: Pose, ms_pts, ms_anchor, ms_n, ms_w, ms_valid,
                    max_dist: float, m_tile: int = 1024,
                    search_dtype=jnp.bfloat16):
    """Re-associate one pose's scan points against its map candidates and
    return (H [6,6], g [6], cost): nearest-anchor match, gate at
    ``max_dist``, then point-to-plane linearization as :func:`point_block`.

    The nearest-anchor search STREAMS over M in tiles of ``m_tile``: each
    scan step computes one [K, m_tile] sqdist block (an MXU matmul) and
    folds it into a running (best_d2, best_idx) — the full [K, M] distance
    matrix is never materialized. Round-4 measured the materialized form
    at 13-30x the FLOPs ideal: with K=1024 x M=4096 per pose and ~200
    poses per shard, the d2 matrices alone are ~2 GB of HBM round-trips
    per GN iteration, and the assoc_chunk=8 row batching that bounded that
    scratch serialized the shard into 16+ dispater steps. Streaming keeps
    the scratch at [K, m_tile] per pose, so the row dimension can batch
    wide enough to fill the chip (see dd_pgo_step assoc_chunk default)."""
    R = rot.quat_to_matrix(pose.q)
    pw = jnp.einsum("ij,kj->ki", R, ms_pts) + pose.t        # [K, 3]
    M = ms_anchor.shape[0]
    K = ms_pts.shape[0]
    pad = (-M) % m_tile
    anchor_p = jnp.pad(ms_anchor, ((0, pad), (0, 0)))
    valid_p = jnp.pad(ms_valid, (0, pad))
    n_tiles = (M + pad) // m_tile
    # SEARCH precision: the argmin is a selection, not an estimate — a
    # bf16 distance (8x the f32 MXU throughput) can only swap neighbors
    # whose distances agree to ~0.4% relative, which the downstream
    # point-to-plane factor treats identically (both are valid
    # correspondences inside max_dist). The SELECTED pair's
    # linearization stays f32. Centering on the anchor centroid keeps
    # bf16's 8-bit mantissa on the DIFFERENCES, not absolute coords.
    center = jnp.sum(anchor_p, 0) / jnp.maximum(M, 1)
    pw_s = (pw - center[None, :]).astype(search_dtype)
    anchor_s = (anchor_p - center[None, :]).astype(search_dtype)
    anchor_t = anchor_s.reshape(n_tiles, m_tile, 3)
    valid_t = valid_p.reshape(n_tiles, m_tile)
    pw2 = jnp.sum(pw_s.astype(jnp.float32) ** 2, -1)        # [K]
    big = jnp.float32(3.4e38)

    def tile_step(carry, tile):
        best, bj = carry
        a_t, v_t, base = tile
        a32 = a_t.astype(jnp.float32)
        # native-dtype dot with f32 accumulation — explicitly DEFAULT
        # precision so an enclosing "highest" context cannot silently
        # upcast the search back to 3-pass f32
        cross = jnp.matmul(pw_s, a_t.T,
                           precision=jax.lax.Precision.DEFAULT,
                           preferred_element_type=jnp.float32)
        d2 = (pw2[:, None] + jnp.sum(a32 * a32, -1)[None, :]
              - 2.0 * cross)                                # [K, m_tile]
        d2 = jnp.where(v_t[None, :] > 0, d2, big)
        tmin = jnp.min(d2, axis=1)
        targ = jnp.argmin(d2, axis=1) + base
        upd = tmin < best
        return (jnp.where(upd, tmin, best),
                jnp.where(upd, targ, bj)), None

    # derive the carry init from varying data (inside shard_map, a
    # constant init's unvarying manual axes would not match the varying
    # scan outputs)
    init = (jnp.full_like(pw2, jnp.inf),
            jnp.zeros_like(pw2, dtype=jnp.int32))
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * m_tile
    (best, j), _ = jax.lax.scan(tile_step, init,
                                (anchor_t, valid_t, bases))
    n = ms_n[j]                                             # [K, 3]
    a = ms_anchor[j]
    d = -jnp.einsum("ki,ki->k", n, a)
    w = jnp.where(jnp.isfinite(best) & (best < max_dist * max_dist),
                  ms_w, 0.0)
    return point_block(pose, ms_pts, n, d, w)


def point_block(pose: Pose, pts, n, d, w):
    """(H [6,6], g [6], cost) of one pose's point-to-plane factors.

    Right-perturbation analytic Jacobian: with T' = T Exp(xi),
    T' p ~= R (p + rho + phi x p) + t, so with m = R^T n:
      dr/drho = w m^T,    dr/dphi = w (p x m)^T
    (n^T R [phi]_x p = m . (phi x p) = phi . (p x m)).
    """
    R = rot.quat_to_matrix(pose.q)
    pw = jnp.einsum("ij,kj->ki", R, pts) + pose.t      # [K, 3]
    r = w * (jnp.einsum("ki,ki->k", n, pw) + d)        # [K]
    m = jnp.einsum("ki,ij->kj", n, R)                  # [K, 3] = (R^T n)^T
    J = jnp.concatenate(
        [w[:, None] * m, w[:, None] * jnp.cross(pts, m)], axis=-1)  # [K, 6]
    return J.T @ J, J.T @ r, 0.5 * jnp.sum(r * r)


def _schur(A, B, C, gI, gS, eps: float = 1e-8):
    """Eliminate the A block of [[A, B], [B^T, C]] x = -[gI, gS]."""
    dimA = A.shape[0]
    L = jnp.linalg.cholesky(A + eps * jnp.eye(dimA, dtype=A.dtype))
    AinvB = jax.scipy.linalg.cho_solve((L, True), B)
    AinvgI = jax.scipy.linalg.cho_solve((L, True), gI)
    return C - B.T @ AinvB, gS - B.T @ AinvgI, L, AinvgI


def _linearize_shard(poses: Pose, e_i, e_j, e_li, e_lj, z_q, z_t, weight,
                     mi: int, s_loc: int, dof4: bool):
    """Local dense (H_loc, g_loc, cost) over [interiors | intra | global]."""
    res_fn = edge_residual_dof4 if dof4 else edge_residual
    retract = boxplus_dof4 if dof4 else se3.boxplus

    def per_edge(gi, gj, zq, zt, w):
        Ti = Pose(poses.q[gi], poses.t[gi])
        Tj = Pose(poses.q[gj], poses.t[gj])

        def res(xi):
            return res_fn(retract(Ti, xi[:6]), retract(Tj, xi[6:]), zq, zt, w)

        r = res(jnp.zeros(12))
        J = jax.jacfwd(res)(jnp.zeros(12))
        return r, J

    r, J = jax.vmap(per_edge)(e_i, e_j, z_q, z_t, weight)
    Ji, Jj = J[:, :, :6], J[:, :, 6:]

    dim = (mi + s_loc + 1) * 6  # +1 trash block for padded edges
    H = jnp.zeros((dim, dim))
    g = jnp.zeros((dim,))
    bi = e_li[:, None] * 6 + jnp.arange(6)[None, :]
    bj = e_lj[:, None] * 6 + jnp.arange(6)[None, :]
    H = H.at[bi[:, :, None], bi[:, None, :]].add(
        jnp.einsum("eai,eaj->eij", Ji, Ji))
    H = H.at[bj[:, :, None], bj[:, None, :]].add(
        jnp.einsum("eai,eaj->eij", Jj, Jj))
    Hij = jnp.einsum("eai,eaj->eij", Ji, Jj)
    H = H.at[bi[:, :, None], bj[:, None, :]].add(Hij)
    H = H.at[bj[:, :, None], bi[:, None, :]].add(jnp.swapaxes(Hij, -1, -2))
    g = g.at[bi].add(jnp.einsum("eai,ea->ei", Ji, r))
    g = g.at[bj].add(jnp.einsum("eai,ea->ei", Jj, r))
    # trash block retained — point-factor scatters may still target it
    return H, g, 0.5 * jnp.sum(r * r)


def dd_pgo_step(poses: Pose, part: DDPartition, edges_z, pf_local, ms_local,
                mesh_axes: tuple[str, ...], anchor_w: float = 1e3,
                lm_lambda: float = 1e-3, dof4: bool = False,
                reduce_dtype=None, max_dist: float = 1.0,
                assoc_chunk: int | None = None):
    """One exact damped-GN step, executed INSIDE shard_map.

    ``edges_z`` = this shard's (z_q, z_t, weight) [EM, ...].
    ``pf_local`` = None or (PointFactors rows [MI, K, ...] for interiors,
    PointFactors rows [SO, K, ...] for OWNED separators) pre-gathered for
    this shard; ownership means every pose's factors are computed exactly
    once across the mesh — no redundant work.
    ``ms_local`` = None or the analogous (MapShard int rows, MapShard
    owned-sep rows) for in-step re-association.
    Returns (new_poses [replicated], cost).
    """
    mi = part.int_idx.shape[-1]
    nH, si, sg = part.n_hosts, part.si, part.sg
    s_loc = si + sg
    n = poses.q.shape[0]
    z_q, z_t, weight = edges_z

    H_loc, g_loc, cost = _linearize_shard(
        poses, part.e_i, part.e_j, part.e_li, part.e_lj,
        z_q, z_t, weight, mi, s_loc, dof4)

    if nH > 1 and si > 0:
        h = jax.lax.axis_index(mesh_axes[0])
        intra_idx = jax.lax.dynamic_slice(part.sep_idx, (h * si,), (si,))
        intra_mask = jax.lax.dynamic_slice(part.sep_mask, (h * si,), (si,))

    def add_static(H_loc, g_loc, cost, Hb, gb, cb):
        """Interior blocks land at static slots [0, MI)."""
        ii = jnp.arange(Hb.shape[0])[:, None] * 6 + jnp.arange(6)
        H_loc = H_loc.at[ii[:, :, None], ii[:, None, :]].add(Hb)
        g_loc = g_loc.at[ii].add(gb)
        return H_loc, g_loc, cost + jnp.sum(cb)

    def add_owned(H_loc, g_loc, cost, Hb, gb, cb):
        """Owned-separator blocks scatter to their local slots (padding
        rows carry slot = trash and weight 0)."""
        ii = part.own_slot[:, None] * 6 + jnp.arange(6)[None, :]
        H_loc = H_loc.at[ii[:, :, None], ii[:, None, :]].add(Hb)
        g_loc = g_loc.at[ii].add(gb)
        return H_loc, g_loc, cost + jnp.sum(cb)

    def maybe_chunked(fn, n_rows):
        """vmap for small row counts; lax.map batches to bound the [K, M]
        association scratch at realistic map sizes."""
        if assoc_chunk is None or n_rows <= assoc_chunk:
            return jax.vmap(fn)

        def mapped(*xs):
            return jax.lax.map(lambda a: fn(*a), xs,
                               batch_size=assoc_chunk)

        return mapped

    if pf_local is not None:
        pf_int, pf_sep = pf_local

        def pblock(q, t, p, nn, d, w):
            return point_block(Pose(q, t), p, nn, d, w)

        Hp, gp, cp = maybe_chunked(pblock, mi)(
            poses.q[part.int_idx], poses.t[part.int_idx],
            pf_int.pts, pf_int.normals, pf_int.d,
            pf_int.w * part.int_mask[:, None])
        H_loc, g_loc, cost = add_static(H_loc, g_loc, cost, Hp, gp, cp)
        Hs, gs, cs = maybe_chunked(pblock, part.own_rows.shape[-1])(
            poses.q[part.own_rows], poses.t[part.own_rows],
            pf_sep.pts, pf_sep.normals, pf_sep.d,
            pf_sep.w * part.own_mask[:, None])
        H_loc, g_loc, cost = add_owned(H_loc, g_loc, cost, Hs, gs, cs)

    if ms_local is not None:
        ms_int, ms_sep = ms_local

        def ablock(q, t, p, a, nn, w, v):
            return associate_block(Pose(q, t), p, a, nn, w, v, max_dist)

        Hm, gm, cm = maybe_chunked(ablock, mi)(
            poses.q[part.int_idx], poses.t[part.int_idx],
            ms_int.pts, ms_int.anchors, ms_int.normals,
            ms_int.w * part.int_mask[:, None], ms_int.valid)
        H_loc, g_loc, cost = add_static(H_loc, g_loc, cost, Hm, gm, cm)
        Hm, gm, cm = maybe_chunked(ablock, part.own_rows.shape[-1])(
            poses.q[part.own_rows], poses.t[part.own_rows],
            ms_sep.pts, ms_sep.anchors, ms_sep.normals,
            ms_sep.w * part.own_mask[:, None], ms_sep.valid)
        H_loc, g_loc, cost = add_owned(H_loc, g_loc, cost, Hm, gm, cm)

    # drop the trash block, then split
    H_loc = H_loc[:-6, :-6]
    g_loc = g_loc[:-6]
    d_int = mi * 6
    A = H_loc[:d_int, :d_int]
    B = H_loc[:d_int, d_int:]
    C = H_loc[d_int:, d_int:]
    gI = g_loc[:d_int]
    gS = g_loc[d_int:]

    # Marquardt damping, matching the dense path's lm_lambda*(diag + 1e-3).
    # Interior diagonals are complete locally; padded interior slots get
    # lm_lambda*1e-3 which keeps A invertible, and their dx is masked out.
    A = A + jnp.diag(lm_lambda * (jnp.diagonal(A) + 1e-3))
    # the separator diagonal (pre-Schur) travels with the reduction so
    # damping uses the COMPLETE assembled diagonal, as the dense path does
    sep_diag_part = jnp.diagonal(C)

    S_part, g_part, L_A, AinvgI = _schur(A, B, C, gI, gS)

    def reduce_(x, axes):
        if reduce_dtype is not None:
            return jax.lax.psum(x.astype(reduce_dtype), axes).astype(
                poses.q.dtype)
        return jax.lax.psum(x, axes)

    cost = jax.lax.psum(cost, mesh_axes)
    # the dense path adds the anchor weight BEFORE damping, so its diagonal
    # damping includes lm_lambda*anchor_w — replicate that exactly
    anchor_add = anchor_w * (1.0 + lm_lambda)
    d_si, d_sg = si * 6, sg * 6

    if nH > 1 and si > 0:
        host_axis, chip_axis = mesh_axes[0], mesh_axes[-1]
        # level 1: ICI reduction of this host's [intra | global] system
        S1 = reduce_(S_part, chip_axis)
        g1 = reduce_(g_part, chip_axis)
        sd1 = reduce_(sep_diag_part, chip_axis)
        A2 = S1[:d_si, :d_si] + jnp.diag(lm_lambda * (sd1[:d_si] + 1e-3))
        B2 = S1[:d_si, d_si:]
        C2 = S1[d_si:, d_si:]
        S2_part, g2_part, L2, A2invg2 = _schur(
            A2, B2, C2, g1[:d_si], g1[d_si:])
        # level 2: DCN reduction of ONLY the global separator system
        SG = reduce_(S2_part, host_axis)
        gG = reduce_(g2_part, host_axis)
        sdG = reduce_(sd1[d_si:], host_axis)
        SG = SG + jnp.diag(lm_lambda * (sdG + 1e-3))
        ar = part.anchor_slot * 6 + jnp.arange(6)
        SG = SG.at[ar, ar].add(anchor_add)
        LG = jnp.linalg.cholesky(SG + 1e-8 * jnp.eye(d_sg))
        dxG = -jax.scipy.linalg.cho_solve((LG, True), gG)
        # back-substitute this host's intra separators
        dx2 = -(A2invg2 + jax.scipy.linalg.cho_solve((L2, True), B2 @ dxG))
        dx_sep = jnp.concatenate([dx2, dxG])
    else:
        Sred = reduce_(S_part, mesh_axes)
        gred = reduce_(g_part, mesh_axes)
        sd = reduce_(sep_diag_part, mesh_axes)
        Sd = Sred + jnp.diag(lm_lambda * (sd + 1e-3))
        ar = (si + part.anchor_slot) * 6 + jnp.arange(6)
        Sd = Sd.at[ar, ar].add(anchor_add)
        Ls = jnp.linalg.cholesky(Sd + 1e-8 * jnp.eye(s_loc * 6))
        dx_sep = -jax.scipy.linalg.cho_solve((Ls, True), gred)

    # back-substitute interiors: dx_I = -A^-1 (g_I + B dx_sep)
    dx_int = -(AinvgI + jax.scipy.linalg.cho_solve((L_A, True), B @ dx_sep))

    # scatter the full [N, 6] tangent:
    #   interiors: disjoint across shards -> psum over all axes
    #   intra separators: identical across a host's chips, disjoint across
    #     hosts -> psum over the host axis only
    #   global separators: fully replicated -> added directly
    dx_full = jnp.zeros((n, 6))
    dx_full = dx_full.at[part.int_idx].add(
        dx_int.reshape(mi, 6) * part.int_mask[:, None])
    dx_full = jax.lax.psum(dx_full, mesh_axes)
    if nH > 1 and si > 0:
        intra = jnp.zeros((n, 6))
        intra = intra.at[intra_idx].add(
            dx2.reshape(si, 6) * intra_mask[:, None])
        dx_full = dx_full + jax.lax.psum(intra, mesh_axes[0])
        dx_full = dx_full.at[part.sep_idx[nH * si:]].add(
            dxG.reshape(sg, 6) * part.sep_mask[nH * si:][:, None])
    else:
        dx_full = dx_full.at[part.sep_idx].add(
            dx_sep.reshape(s_loc, 6) * part.sep_mask[:, None])

    retract = boxplus_dof4 if dof4 else se3.boxplus
    new = jax.vmap(lambda q, t, d: retract(Pose(q, t), d))(
        poses.q, poses.t, dx_full)
    return Pose(new.q, new.t), cost


def _gather_rows(tree, part: DDPartition, reshard):
    """Host-side per-shard row gather of per-pose factor data.

    Interior rows: [P, MI, ...]; owned-separator rows: [P, SO, ...].
    Padding rows are masked on device via int_mask / own_mask.
    """
    tree_np = jax.tree.map(np.asarray, tree)
    int_rows = jax.tree.map(lambda x: x[part.int_idx], tree_np)
    sep_rows = jax.tree.map(lambda x: x[part.own_rows], tree_np)
    return (jax.tree.map(reshard, int_rows),
            jax.tree.map(reshard, sep_rows))


def _prepare_device_inputs(part: DDPartition, edges: PoseGraphEdges,
                           point_factors, map_shard, mesh: Mesh):
    """Host-side gather of per-shard slices, laid out for the mesh."""
    axes = tuple(mesh.axis_names)
    if len(axes) == 2:
        shp = mesh.devices.shape

        def reshard(x):
            x = np.asarray(x)
            return jnp.asarray(x.reshape((shp[0], shp[1]) + x.shape[1:]))
    else:
        def reshard(x):
            return jnp.asarray(np.asarray(x))

    sharded = dict(
        int_idx=reshard(part.int_idx), int_mask=reshard(part.int_mask),
        e_i=reshard(part.e_i), e_j=reshard(part.e_j),
        e_li=reshard(part.e_li), e_lj=reshard(part.e_lj),
        own_rows=reshard(part.own_rows), own_slot=reshard(part.own_slot),
        own_mask=reshard(part.own_mask),
    )
    z_q = np.asarray(edges.z_q)[part.e_gidx]
    z_t = np.asarray(edges.z_t)[part.e_gidx]
    w = np.asarray(edges.weight)[part.e_gidx] * part.e_mask[..., None]
    z_q = np.where(part.e_mask[..., None] > 0, z_q,
                   np.array([1.0, 0, 0, 0], np.float32))
    ez = (reshard(z_q), reshard(z_t), reshard(w))

    pf_dev = (None if point_factors is None
              else _gather_rows(point_factors, part, reshard))
    ms_dev = (None if map_shard is None
              else _gather_rows(map_shard, part, reshard))

    repl = dict(sep_idx=jnp.asarray(part.sep_idx),
                sep_mask=jnp.asarray(part.sep_mask))
    return sharded, repl, ez, pf_dev, ms_dev


def make_dd_program(part: DDPartition, mesh: Mesh, iters: int = 10,
                    anchor_w: float = 1e3, lm_lambda: float = 1e-3,
                    dof4: bool = False, has_pf: bool = False,
                    has_ms: bool = False, reduce_dtype=None,
                    max_dist: float = 1.0, assoc_chunk: int | None = None):
    """Build the jittable shard_map program for a fixed partition/topology.

    Returned ``run(poses, sharded, repl, ez, pf_dev, ms_dev)`` executes
    ``iters`` exact damped-GN steps -> (poses, final cost).
    """
    axes = tuple(mesh.axis_names)
    n_axes = len(axes)
    shard_spec = P(*axes) if n_axes == 2 else P(axes[0])

    def spec_like(flag, cls, n_fields):
        if not flag:
            return None
        return (cls(*([shard_spec] * n_fields)),
                cls(*([shard_spec] * n_fields)))

    in_specs = (
        P(),
        dict(int_idx=shard_spec, int_mask=shard_spec, e_i=shard_spec,
             e_j=shard_spec, e_li=shard_spec, e_lj=shard_spec,
             own_rows=shard_spec, own_slot=shard_spec, own_mask=shard_spec),
        dict(sep_idx=P(), sep_mask=P()),
        (shard_spec, shard_spec, shard_spec),
        spec_like(has_pf, PointFactors, 4),
        spec_like(has_ms, MapShard, 5),
    )

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P()))
    def run(p, sh, rp, ez, pf, ms):
        # TPU matmuls default to bf16 on the MXU; the elimination's
        # Cholesky/triangular solves and the normal-equation products are
        # numerics-critical (verified on chip: bf16 stalls convergence at
        # ~4x worse error) — force f32 accumulation throughout the solver
        with jax.default_matmul_precision("highest"):
            return _run_inner(p, sh, rp, ez, pf, ms)

    def _run_inner(p, sh, rp, ez, pf, ms):
        def sq(x):
            return x.reshape(x.shape[n_axes:])

        local_part = DDPartition(
            int_idx=sq(sh["int_idx"]), int_mask=sq(sh["int_mask"]),
            sep_idx=rp["sep_idx"], sep_mask=rp["sep_mask"],
            sep_owner=None,
            n_hosts=part.n_hosts, si=part.si, sg=part.sg,
            e_i=sq(sh["e_i"]), e_j=sq(sh["e_j"]),
            e_li=sq(sh["e_li"]), e_lj=sq(sh["e_lj"]),
            e_gidx=None, e_mask=None,
            own_rows=sq(sh["own_rows"]), own_slot=sq(sh["own_slot"]),
            own_mask=sq(sh["own_mask"]),
            anchor_slot=part.anchor_slot,
        )
        ez_l = (sq(ez[0]), sq(ez[1]), sq(ez[2]))
        pf_l = jax.tree.map(sq, pf) if pf is not None else None
        ms_l = jax.tree.map(sq, ms) if ms is not None else None

        def body(_, carry):
            pp, _c = carry
            return dd_pgo_step(pp, local_part, ez_l, pf_l, ms_l, axes,
                               anchor_w=anchor_w, lm_lambda=lm_lambda,
                               dof4=dof4, reduce_dtype=reduce_dtype,
                               max_dist=max_dist, assoc_chunk=assoc_chunk)

        return jax.lax.fori_loop(0, iters, body, (p, jnp.zeros(())))

    return run


def optimize_pose_graph_dd(
    poses: Pose,
    edges: PoseGraphEdges,
    mesh: Mesh,
    iters: int = 10,
    anchor_idx: int = 0,
    anchor_w: float = 1e3,
    lm_lambda: float = 1e-3,
    dof4: bool = False,
    point_factors: PointFactors | None = None,
    map_shard: MapShard | None = None,
    reduce_dtype=None,
    partition: DDPartition | None = None,
    max_dist: float = 1.0,
    assoc_chunk: int | None = None,
):
    """Nested-dissection PGO/BA over a 1-D (factor) or 2-D (host, factor)
    mesh. Per-GN-iteration communication is ONE separator-system reduction
    (+ a [N,6] interior-update psum + a scalar), independent of any inner
    iteration count — vs one [N,6] psum per CG iteration in the
    factor-sharded design.

    ``partition`` may be precomputed with :func:`build_partition` and
    reused across calls sharing the graph topology.
    """
    if dof4 and (point_factors is not None or map_shard is not None):
        # point_block/associate_block linearize with the full 6-DoF
        # right-perturbation Jacobian (body-frame rho, full phi); the dof4
        # step is applied via boxplus_dof4 (world-frame translation +
        # yaw-only left rotation), so mixing them would feed roll/pitch
        # rows into a yaw-only retraction with a mismatched translation
        # frame. The reference's 4-DoF graph is edges-only too
        # (pose_graph.h:199-289).
        raise ValueError(
            "dof4=True is only supported for edge-only pose graphs; "
            "point_factors/map_shard use the 6-DoF linearization")
    axes = tuple(mesh.axis_names)
    n_shards = int(mesh.devices.size)
    n_hosts = int(mesh.devices.shape[0]) if len(axes) == 2 else 1
    if partition is None:
        partition = build_partition(
            np.asarray(edges.i), np.asarray(edges.j), poses.q.shape[0],
            n_shards, n_hosts=n_hosts, anchor_idx=anchor_idx)
    sharded, repl, ez, pf_dev, ms_dev = _prepare_device_inputs(
        partition, edges, point_factors, map_shard, mesh)
    run = make_dd_program(partition, mesh, iters=iters, anchor_w=anchor_w,
                          lm_lambda=lm_lambda, dof4=dof4,
                          has_pf=point_factors is not None,
                          has_ms=map_shard is not None,
                          reduce_dtype=reduce_dtype, max_dist=max_dist,
                          assoc_chunk=assoc_chunk)
    return run(poses, sharded, repl, ez, pf_dev, ms_dev)
