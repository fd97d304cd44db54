"""Measure ONE shard's DD-BA/PGO per-GN-iteration cost on the real chip.

The scaling model's compute term (parallel/scaling_model.py) was FLOPs/2e12
— round-3's own chip measurement contradicted it 3.4x (3.6 ms measured vs
1.06 ms modeled at the deployment shape) because TPU 6x6-block scatter-adds
serialize (~15x their raw FLOPs). This demo measures the real thing:

  * per-shard work (edge linearization + in-step map re-association +
    interior elimination + Schur to the separator system) at the
    1024-pose/8-shard deployment shape, exactly the computation
    dd_pgo_step runs inside shard_map BEFORE its one reduction;
  * the replicated post-reduction separator solve (assemble + Cholesky of
    the (si+sg)*6 system) every device runs AFTER the reduction;
  * both for the BA shape (K=1024 pts x M=4096 candidates per pose,
    assoc_chunk=8) and the bare-PGO shape (edges only).

Timing is chained through a data dependency (poses perturbed by the
output) — unchained submissions fan out across the tunnel's worker pool
and report fantasy numbers (BENCH_NOTES round-1 methodology findings).

Writes results/scaling/shard_chip_ms.json, consumed by
scaling_model.efficiency_from_measured_ms / dd_scaling_report.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))

from mloam_tpu.core.se3 import Pose
from mloam_tpu.parallel import dd_pgo as DD
from mloam_tpu.parallel import scaling_model as SM

N_POSES = 1024
N_SHARDS = 8
K_PTS = 1024
M_CAND = 4096
# row batch for the association map; "none" = vmap all rows at once.
# Measured on chip (demos/profile_assoc.py, 121x1024x4096): the round-4
# MATERIALIZED association at chunk 8 costs 85.8 ms; chunk 32 fixes the
# serialization (15.9) and round-5's streaming-argmin form is best AND
# chunk-insensitive (12.1-13.6 across chunk 8/32/none, m_tile 512-2048)
# because its scratch is [chunk, K, m_tile] with the tile min folded in.
_AC = os.environ.get("DD_ASSOC_CHUNK", "8")
ASSOC_CHUNK = None if _AC == "none" else int(_AC)
REPS = int(os.environ.get("DD_REPS", "20"))


def build_shard0(with_ba: bool):
    poses, edges, _ = SM.make_survey_graph(N_POSES, n_loops=32)
    part = DD.build_partition(np.asarray(edges.i), np.asarray(edges.j),
                              N_POSES, N_SHARDS, n_hosts=1)
    mi = part.int_idx.shape[1]
    so = part.own_rows.shape[1]
    s_loc = part.si + part.sg

    # shard-0 slices (the per-shard arrays dd_pgo_step sees inside
    # shard_map after _prepare_device_inputs gathers + squeezes)
    e_g = part.e_gidx[0]
    ez = (jnp.asarray(np.asarray(edges.z_q)[e_g]),
          jnp.asarray(np.asarray(edges.z_t)[e_g]),
          jnp.asarray(np.asarray(edges.weight)[e_g]
                      * part.e_mask[0][:, None]))
    sh = dict(int_idx=jnp.asarray(part.int_idx[0]),
              int_mask=jnp.asarray(part.int_mask[0]),
              e_i=jnp.asarray(part.e_i[0]), e_j=jnp.asarray(part.e_j[0]),
              e_li=jnp.asarray(part.e_li[0]), e_lj=jnp.asarray(part.e_lj[0]),
              own_rows=jnp.asarray(part.own_rows[0]),
              own_slot=jnp.asarray(part.own_slot[0]),
              own_mask=jnp.asarray(part.own_mask[0]))
    ms = None
    if with_ba:
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)

        def mk(rows):
            pts = 2.0 * jax.random.normal(k1, (rows, K_PTS, 3))
            anchors = 30.0 * jax.random.normal(k2, (rows, M_CAND, 3))
            nrm = jax.random.normal(k3, (rows, M_CAND, 3))
            nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
            return DD.MapShard(pts=pts, anchors=anchors, normals=nrm,
                               w=jnp.ones((rows, K_PTS)),
                               valid=jnp.ones((rows, M_CAND)))

        ms = (mk(mi), mk(so))
    return poses, part, sh, ez, ms, (mi, so, s_loc)


def shard_program(part, shapes, with_ba: bool):
    """The per-shard section of dd_pgo_step (everything before its one
    separator reduction), plus the replicated post-reduction separator
    assembly+solve — measured as two separate jitted programs."""
    mi, so, s_loc = shapes
    lm_lambda = 1e-3

    def per_shard(poses, sh, ez, ms):
        with jax.default_matmul_precision("highest"):
            z_q, z_t, weight = ez
            H_loc, g_loc, cost = DD._linearize_shard(
                poses, sh["e_i"], sh["e_j"], sh["e_li"], sh["e_lj"],
                z_q, z_t, weight, mi, s_loc, False)
            if ms is not None:
                ms_int, ms_sep = ms

                def ablock(q, t, p, a, nn, w, v):
                    return DD.associate_block(Pose(q, t), p, a, nn, w, v,
                                              1.0)

                def mapped(rows, qq, tt, m):
                    xs = (qq, tt, m.pts, m.anchors, m.normals, m.w, m.valid)
                    if ASSOC_CHUNK is None or rows <= ASSOC_CHUNK:
                        return jax.vmap(ablock)(*xs)
                    return jax.lax.map(lambda a: ablock(*a), xs,
                                       batch_size=ASSOC_CHUNK)

                Hm, gm, cm = mapped(mi, poses.q[sh["int_idx"]],
                                    poses.t[sh["int_idx"]],
                                    ms_int._replace(
                                        w=ms_int.w
                                        * sh["int_mask"][:, None]))
                ii = jnp.arange(mi)[:, None] * 6 + jnp.arange(6)
                H_loc = H_loc.at[ii[:, :, None], ii[:, None, :]].add(Hm)
                g_loc = g_loc.at[ii].add(gm)
                Hs, gs, cs = mapped(so, poses.q[sh["own_rows"]],
                                    poses.t[sh["own_rows"]],
                                    ms_sep._replace(
                                        w=ms_sep.w
                                        * sh["own_mask"][:, None]))
                jj = sh["own_slot"][:, None] * 6 + jnp.arange(6)[None, :]
                H_loc = H_loc.at[jj[:, :, None], jj[:, None, :]].add(Hs)
                g_loc = g_loc.at[jj].add(gs)
            H_loc = H_loc[:-6, :-6]
            g_loc = g_loc[:-6]
            d_int = mi * 6
            A = H_loc[:d_int, :d_int]
            B = H_loc[:d_int, d_int:]
            C = H_loc[d_int:, d_int:]
            A = A + jnp.diag(lm_lambda * (jnp.diagonal(A) + 1e-3))
            S_part, g_part, L_A, AinvgI = DD._schur(
                A, B, C, g_loc[:d_int], g_loc[d_int:])
            return S_part, g_part, cost

    def sep_solve(S, g):
        with jax.default_matmul_precision("highest"):
            d = S.shape[0]
            Sd = S + jnp.diag(lm_lambda * (jnp.diagonal(S) + 1e-3)) \
                + 1e-6 * jnp.eye(d)
            L = jnp.linalg.cholesky(Sd)
            return jax.scipy.linalg.cho_solve((L, True), g)

    return jax.jit(per_shard), jax.jit(sep_solve)


def timed_chain(fn, poses, sh, ez, ms, reps):
    """Time ``reps`` chained evaluations inside ONE dispatch (lax.scan
    with the poses perturbed by each iteration's output): measures pure
    device time amortized over reps, immune to host-side dispatch jitter
    (each separate submission costs 3-5 ms on the tunnel, and far more
    when the 2-vCPU host is loaded)."""

    def step(p, _):
        S, g, c = fn(p, sh, ez, ms)
        eps = 1e-9 * jnp.tanh(g[:6])
        return Pose(p.q, p.t.at[0].add(eps[:3])), c

    @jax.jit
    def chain(p):
        return jax.lax.scan(step, p, None, length=reps)

    out = chain(poses)
    jax.block_until_ready(out[1])  # compile + warm
    t0 = time.perf_counter()
    out = chain(Pose(poses.q, poses.t + 1e-6))
    jax.block_until_ready(out[1])
    return (time.perf_counter() - t0) / reps


def main():
    dev = jax.devices()[0]
    print(f"platform={dev.platform}")
    out = {"platform": dev.platform, "n_poses": N_POSES,
           "n_shards": N_SHARDS, "ba": {"K": K_PTS, "M": M_CAND,
                                        "assoc_chunk": ASSOC_CHUNK}}
    for label, with_ba in (("ba", True), ("pgo", False)):
        poses, part, sh, ez, ms, shapes = build_shard0(with_ba)
        per_shard, sep_solve = shard_program(part, shapes, with_ba)
        ms_in = ms if with_ba else None
        t_shard = timed_chain(per_shard, poses, sh, ez, ms_in, REPS)
        # separator solve (replicated on every device after the psum) —
        # same one-dispatch scan-chain methodology. Measured on a
        # synthetic SPD system of the separator's exact dim: its cost is
        # shape-dependent only, and timing it downstream of the BA
        # per_shard state measured 13-28x the pgo value for the IDENTICAL
        # program shape (a tunnel/liveness harness artifact, not compute —
        # observed 2026-08-22).
        S, g, _ = per_shard(poses, sh, ez, ms_in)
        jax.block_until_ready((S, g))
        d_sep = S.shape[0]
        kk = jax.random.PRNGKey(1)
        A_ = jax.random.normal(kk, (d_sep, d_sep)) * 0.05
        S8 = A_ @ A_.T + jnp.eye(d_sep) * (1.0 + jnp.arange(d_sep) * 0.01)
        g8 = jax.random.normal(jax.random.fold_in(kk, 1), (d_sep,))
        jax.block_until_ready((S8, g8))

        @jax.jit
        def sep_chain(gg):
            def step(c, _):
                x = sep_solve(S8, c)
                return gg + 1e-9 * jnp.tanh(x), x[0]

            return jax.lax.scan(step, gg, None, length=REPS)

        o = sep_chain(g8)
        jax.block_until_ready(o[1])
        t0 = time.perf_counter()
        o = sep_chain(g8 + 1e-6)
        jax.block_until_ready(o[1])
        t_sep = (time.perf_counter() - t0) / REPS
        # tunnel artifact (2026-08-22): the IDENTICAL sep program measures
        # 13-28x slower when timed adjacent to the BA label's state, even
        # on a synthetic decoupled SPD system — the post-pgo measurement
        # is the real cost (the program shape is label-independent), so
        # the minimum across labels is recorded for both at the end.
        out[label] = {"shard_ms_per_gn": t_shard * 1e3,
                      "sep_solve_ms_per_gn": t_sep * 1e3,
                      "interiors": shapes[0], "owned_sep": shapes[1],
                      "sep_dim": int(S.shape[0]),
                      "assoc_chunk": ASSOC_CHUNK}
        # MFU of the shard program: XLA cost-analysis FLOPs over the
        # chained chip time (round-5 verdict #6: report utilization, not
        # just ms)
        try:
            ca = per_shard.lower(poses, sh, ez, ms_in).compile(
            ).cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            fl = float(ca.get("flops", 0.0))
            out[label]["gflops"] = fl / 1e9
            out[label]["achieved_tflops_s"] = fl / t_shard / 1e12
            out[label]["mfu_vs_f32_peak"] = fl / t_shard / 49e12
        except Exception as e:
            out[label]["cost_analysis_error"] = f"{type(e).__name__}: {e}"
        print(f"{label}: shard {t_shard*1e3:.2f} ms/GN, "
              f"sep solve {t_sep*1e3:.2f} ms/GN (dim {S.shape[0]}), "
              f"{out[label].get('achieved_tflops_s', 0):.3f} TFLOP/s")
    sep_true = min(out[l]["sep_solve_ms_per_gn"] for l in ("ba", "pgo"))
    for l in ("ba", "pgo"):
        out[l]["sep_solve_ms_per_gn_raw"] = out[l]["sep_solve_ms_per_gn"]
        out[l]["sep_solve_ms_per_gn"] = sep_true
    d = os.path.join("results", "scaling")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "shard_chip_ms.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote results/scaling/shard_chip_ms.json")


if __name__ == "__main__":
    main()
