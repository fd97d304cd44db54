"""Dual-lidar steady-path speed ladder: rig-normalized caps (the
profile_dual_caps winner) combined with skip_steady (drop the scan-to-scan
tracker once the window is warm — the window GN refines a constant-velocity
seed against a richer map) and K=10 scan-chunked replay.

Decides the dual-rig preset defaults for the >=100 fps (5x of the 20 fps
dual-replay envelope) target. Interleaved passes over disjoint sequences.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from mloam_tpu.core import rangeimage as RI
from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import OdometryPipeline
from mloam_tpu.odometry import estimator as E
from mloam_tpu.sim import world as W
from mloam_tpu.utils import evaluation

N = 48
WARM = 10
CHUNK = 10
X = se3.exp(jnp.array([0.25, -0.1, 0.05, 0.05, -0.03, 0.5]))


def make_seq(cfg, n, seed):
    w = W.make_world(jax.random.PRNGKey(seed))
    traj = W.make_trajectory(jax.random.PRNGKey(seed + 1), wobble=0.05)
    model = cfg.rig.models[0]
    s0, gt = W.render_sequence(w, traj, model, n)
    s1, _ = W.render_sequence(w, traj, model, n, extrinsic=X)
    to_np = lambda s: jax.tree.map(np.asarray, s)
    s0, s1 = to_np(s0), to_np(s1)
    packed = []
    for i in range(n):
        f0 = RI.pack_frame(RangeImage(*[x[i] for x in s0]))
        f1 = RI.pack_frame(RangeImage(*[x[i] for x in s1]))
        packed.append((jax.tree.map(np.asarray, f0),
                       jax.tree.map(np.asarray, f1)))
    return packed, np.asarray(gt.t[:n])


def make_pipe(cfg):
    pipe = OdometryPipeline(cfg)
    ext = Pose(jnp.stack([Pose.identity().q, X.q]),
               jnp.stack([Pose.identity().t, X.t]))
    pipe.window = E.set_extrinsics(pipe.window, ext)
    orig = pipe.reset

    def reset():
        orig()
        pipe.window = E.set_extrinsics(pipe.window, ext)

    pipe.reset = reset
    return pipe


def dev_frames(pair):
    return [RI.PackedFrame(*[jnp.asarray(x) for x in f]) for f in pair]


def dev_chunk(pairs):
    out = []
    for l in range(2):
        stacked = [np.stack(x) for x in zip(*[p[l] for p in pairs])]
        out.append(RI.PackedFrame(*[jnp.asarray(x) for x in stacked]))
    return tuple(out)


def run_stream(pipe, seq):
    pipe.reset()
    est_t = []
    for i in range(WARM):
        out = pipe.process(dev_frames(seq[i]))
        est_t.append(out.pose.t)
    jax.block_until_ready(out.pose)
    t0 = time.perf_counter()
    for i in range(WARM, N):
        out = pipe.process(dev_frames(seq[i]))
        est_t.append(out.pose.t)
    jax.block_until_ready(out.pose)
    dt = (time.perf_counter() - t0) / (N - WARM)
    return dt, np.asarray(jnp.stack(est_t))


def run_chunk(pipe, seq):
    pipe.reset()
    est_t = []
    for i in range(WARM):
        out = pipe.process(dev_frames(seq[i]))
        est_t.append(np.asarray(out.pose.t))
    jax.block_until_ready(out.pose)
    t0 = time.perf_counter()
    last = None
    for c in range(WARM, N, CHUNK):
        k = min(CHUNK, N - c)
        q, t, *_ = pipe.process_chunk(dev_chunk(seq[c:c + k]))
        est_t.extend(np.asarray(t))
        last = t
    jax.block_until_ready(last)
    dt = (time.perf_counter() - t0) / (N - WARM)
    return dt, np.stack(est_t)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    base = platforms.synthetic(n_lidars=2, extrinsic_mode=0)
    half = dataclasses.replace(
        base,
        odometry=dataclasses.replace(
            base.odometry,
            cap_frame_corner=512, cap_frame_surf=1024,
            localmap_precap_corner=1024, localmap_precap_surf=5120,
        ),
    )
    half_skip = dataclasses.replace(
        half, tracker=dataclasses.replace(half.tracker, skip_steady=True))
    third = dataclasses.replace(
        base,
        odometry=dataclasses.replace(
            base.odometry,
            cap_frame_corner=384, cap_frame_surf=768,
            localmap_precap_corner=768, localmap_precap_surf=3840,
        ),
    )
    half_tgn2 = dataclasses.replace(
        half, tracker=dataclasses.replace(half.tracker, gn_iters=2))
    third_tgn2 = dataclasses.replace(
        third, tracker=dataclasses.replace(third.tracker, gn_iters=2))

    import os as _os
    lad = _os.environ.get("DUAL_LADDER", "1")
    if lad == "8":
        def combo8(cfg, ratio=0.6, clf=2048, caps=(384, 768)):
            return dataclasses.replace(
                cfg,
                odometry=dataclasses.replace(
                    cfg.odometry, gf_ratio=ratio, gf_method="stride",
                    gf_compact=True, gn_iters=1,
                    cap_frame_corner=caps[0], cap_frame_surf=caps[1],
                    localmap_precap_corner=512, localmap_precap_surf=2560),
                tracker=dataclasses.replace(cfg.tracker, gn_iters=2),
                segmenter=dataclasses.replace(cfg.segmenter, label_iters=8),
                features=dataclasses.replace(cfg.features,
                                             cap_less_flat=clf),
            )

        variants = {
            "w1_clf2k": (make_pipe(combo8(base)), run_stream),
            "w1_clf2k_g075": (make_pipe(combo8(base, ratio=0.75)),
                              run_stream),
            "w1_clf2k_c448": (make_pipe(combo8(base, caps=(448, 896))),
                              run_stream),
            "w1_clf25": (make_pipe(combo8(base, clf=2560)), run_stream),
        }
    elif lad == "7":
        def combo7(cfg, wgn=2, clf=4096, li=8):
            return dataclasses.replace(
                cfg,
                odometry=dataclasses.replace(
                    cfg.odometry, gf_ratio=0.6, gf_method="stride",
                    gf_compact=True, gn_iters=wgn,
                    localmap_precap_corner=512, localmap_precap_surf=2560),
                tracker=dataclasses.replace(cfg.tracker, gn_iters=2),
                segmenter=dataclasses.replace(cfg.segmenter, label_iters=li),
                features=dataclasses.replace(cfg.features,
                                             cap_less_flat=clf),
            )

        variants = {
            "combo": (make_pipe(combo7(third)), run_stream),
            "combo_w1": (make_pipe(combo7(third, wgn=1)), run_stream),
            "combo_clf2k": (make_pipe(combo7(third, clf=2048)), run_stream),
            "combo_w1_clf2k": (make_pipe(combo7(third, wgn=1, clf=2048)),
                               run_stream),
        }
    elif lad == "6":
        # combined micro-cuts: stride compaction + 2-iter tracker +
        # tighter localmap precap + fewer label-prop rounds
        def combo(cfg, ratio=0.6, tgn=2, pc=(512, 2560), li=8):
            cfg = dataclasses.replace(
                cfg,
                odometry=dataclasses.replace(
                    cfg.odometry, gf_ratio=ratio, gf_method="stride",
                    gf_compact=True,
                    localmap_precap_corner=pc[0], localmap_precap_surf=pc[1]),
                tracker=dataclasses.replace(cfg.tracker, gn_iters=tgn),
                segmenter=dataclasses.replace(cfg.segmenter, label_iters=li),
            )
            return cfg

        variants = {
            "third_st06": (make_pipe(dataclasses.replace(
                third, odometry=dataclasses.replace(
                    third.odometry, gf_ratio=0.6, gf_method="stride",
                    gf_compact=True))), run_stream),
            "combo": (make_pipe(combo(third)), run_stream),
            "combo_li12": (make_pipe(combo(third, li=12)), run_stream),
            "combo_tgn3": (make_pipe(combo(third, tgn=3)), run_stream),
        }
    elif lad == "5":
        # tracker-skip ladder: the stage breakdown puts the scan-to-scan
        # tracker at 2.9 ms of the 11.8 ms dual step; skip_steady drops it
        # once warm (CV seed straight into the window solve)
        def gfm(cfg, ratio, method="stride"):
            return dataclasses.replace(
                cfg, odometry=dataclasses.replace(
                    cfg.odometry, gf_ratio=ratio, gf_method=method,
                    gf_compact=True))

        def skp(cfg):
            return dataclasses.replace(
                cfg, tracker=dataclasses.replace(cfg.tracker,
                                                 skip_steady=True))

        variants = {
            "third_st06": (make_pipe(gfm(third, 0.6)), run_stream),
            "third_st06_skip": (make_pipe(skp(gfm(third, 0.6))), run_stream),
            "third_skip": (make_pipe(skp(third)), run_stream),
            "half_st05_skip": (make_pipe(skp(gfm(half, 0.5))), run_stream),
        }
    elif lad == "4":
        # stride-decimation ladder: free even subsampling + compaction
        def gfm(cfg, ratio, method="stride"):
            return dataclasses.replace(
                cfg, odometry=dataclasses.replace(
                    cfg.odometry, gf_ratio=ratio, gf_method=method,
                    gf_compact=True))

        variants = {
            "third": (make_pipe(third), run_stream),
            "third_st06": (make_pipe(gfm(third, 0.6)), run_stream),
            "half_st05": (make_pipe(gfm(half, 0.5)), run_stream),
            "half_st035": (make_pipe(gfm(half, 0.35)), run_stream),
        }
    elif lad == "3":
        # gf-compaction ladder: selection compacts the window-solve
        # correspondence buffers to ~ratio size (estimator gf_compact)
        def gf(cfg, ratio):
            return dataclasses.replace(
                cfg, odometry=dataclasses.replace(
                    cfg.odometry, gf_ratio=ratio, gf_compact=True))

        variants = {
            "third": (make_pipe(third), run_stream),
            "third_gf05": (make_pipe(gf(third, 0.5)), run_stream),
            "half_gf04": (make_pipe(gf(half, 0.4)), run_stream),
            "full_gf025": (make_pipe(gf(base, 0.25)), run_stream),
        }
    elif lad == "2":
        variants = {
            "half": (make_pipe(half), run_stream),
            "third": (make_pipe(third), run_stream),
            "half_tgn2": (make_pipe(half_tgn2), run_stream),
            "third_tgn2": (make_pipe(third_tgn2), run_stream),
        }
    else:
        variants = {
            "half": (make_pipe(half), run_stream),
            "half_skip": (make_pipe(half_skip), run_stream),
            "half_chunk": (make_pipe(half), run_chunk),
            "half_skip_chunk": (make_pipe(half_skip), run_chunk),
        }

    seqs = [make_seq(base, N, seed) for seed in (0, 7, 11)]
    for name, (pipe, runner) in variants.items():  # warm compiles
        runner(pipe, seqs[0][0])
        print(f"warmed {name}", flush=True)

    res = {k: [] for k in variants}
    for p in range(2):
        seq, gt = seqs[1 + p]
        for name, (pipe, runner) in variants.items():
            dt, est = runner(pipe, seq)
            ate = evaluation.ate_rmse(est, gt)
            res[name].append((dt, ate))
            print(f"pass {p} {name:16s} {dt*1e3:7.2f} ms/frame "
                  f"({1/dt:5.1f} fps) ate={ate*100:.2f} cm", flush=True)
    print("--- medians ---")
    for name, rs in res.items():
        dts = [r[0] for r in rs]
        ates = [r[1] for r in rs]
        print(f"{name:16s} {np.median(dts)*1e3:7.2f} ms "
              f"({1.0/np.median(dts):5.1f} fps)  ate max {max(ates)*100:.2f} cm")


if __name__ == "__main__":
    main()
