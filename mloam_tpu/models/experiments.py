"""Batch experiment driver.

Counterpart of the reference's ``estimator/script/run_mloam.py`` programs
(:207-283): single_test/single_eval (one run + ATE/RPE), mc_test (Monte-
Carlo over trials :95-163), calib_test (online-calibration lifecycle), and
inject_ext_uct_test (extrinsic perturbation levels gt/ref/cad/ini/inj
:167-205) — driving simulated sequences instead of rosbag replay, with the
in-repo evaluation stack instead of rpg_trajectory_evaluation.

Usage:
    python -m mloam_tpu.models.experiments single --frames 40
    python -m mloam_tpu.models.experiments mc --trials 3 --frames 30
    python -m mloam_tpu.models.experiments calib
    python -m mloam_tpu.models.experiments inject_ext --frames 30
Results land in results/<program>/ as TUM trajectories + summary JSON.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mloam_tpu.core import se3
from mloam_tpu.core.rangeimage import RangeImage
from mloam_tpu.core.se3 import Pose
from mloam_tpu.models import platforms
from mloam_tpu.models.pipeline import FullPipeline
from mloam_tpu.sim import world as W
from mloam_tpu.utils import evaluation, timing

# extrinsic perturbation levels: tangent-norm magnitudes mirroring the
# reference's gt/ref/cad/ini/inj ladder (run_mloam.py:167-205)
PERTURBATION_LEVELS = {
    "gt": 0.0,
    "ref": 0.01,
    "cad": 0.05,
    "ini": 0.10,
    "inj": 0.20,
}


def run_sequence(cfg, n_frames: int, seed: int = 0, n_lidars: int = 1,
                 ext_true: Pose | None = None, pipe=None):
    """Render + run one sequence; returns dict of metrics + trajectories."""
    w = W.make_world(jax.random.PRNGKey(seed))
    traj = W.make_trajectory(jax.random.PRNGKey(seed + 1), wobble=0.05)
    model = cfg.rig.models[0]
    seqs = [W.render_sequence(w, traj, model, n_frames)]
    gt_poses = seqs[0][1]
    for l in range(1, n_lidars):
        ext = ext_true if ext_true is not None else Pose.identity()
        seqs.append(W.render_sequence(w, traj, model, n_frames, extrinsic=ext))

    pipe = pipe or FullPipeline(cfg)
    est_t, est_q, ts = [], [], []
    t0 = time.perf_counter()
    for i in range(n_frames):
        frames = [
            RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
            for imgs, _ in seqs
        ]
        with timing.timer("odom_process"):
            out = pipe.process(frames)
            jax.block_until_ready(out.map_pose)
        est_t.append(np.asarray(out.map_pose.t))
        est_q.append(np.asarray(out.map_pose.q))
        ts.append(i * model.scan_period)
    wall = time.perf_counter() - t0

    est_t = np.stack(est_t)
    est_q = np.stack(est_q)
    gt_t = np.asarray(gt_poses.t[:n_frames])
    ate = evaluation.ate_rmse(est_t, gt_t)
    return {
        "ate_m": ate,
        "wall_s": wall,
        "fps": n_frames / wall,
        "est_t": est_t,
        "est_q": est_q,
        "times": np.asarray(ts),
        "gt_t": gt_t,
        "pipe": pipe,
    }


def _outdir(program: str) -> str:
    d = os.path.join("results", program)
    os.makedirs(d, exist_ok=True)
    return d


def single_test(args):
    cfg = platforms.synthetic(n_lidars=args.lidars)
    res = run_sequence(cfg, args.frames, seed=args.seed, n_lidars=args.lidars)
    d = _outdir("single")
    evaluation.save_tum(
        os.path.join(d, f"traj_est_seed{args.seed}.tum"),
        res["times"], res["est_t"], res["est_q"],
    )
    from mloam_tpu.utils import viz

    viz.plot_trajectory(
        os.path.join(d, f"traj_seed{args.seed}.png"), res["est_t"],
        res["gt_t"], title=f"single seed={args.seed}",
    )
    summary = {"ate_m": res["ate_m"], "fps": res["fps"],
               "frames": args.frames, "seed": args.seed,
               "timing": timing.all_stats()}
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in ("ate_m", "fps")}))


def mc_test(args):
    """Monte-Carlo trials over world/trajectory seeds."""
    cfg = platforms.synthetic(n_lidars=args.lidars)
    ates, fpss = [], []
    d = _outdir("mc")
    for trial in range(args.trials):
        res = run_sequence(cfg, args.frames, seed=100 + trial,
                           n_lidars=args.lidars)
        ates.append(res["ate_m"])
        fpss.append(res["fps"])
        evaluation.save_tum(
            os.path.join(d, f"traj_trial{trial}.tum"),
            res["times"], res["est_t"], res["est_q"],
        )
        print(f"trial {trial}: ATE {res['ate_m']*100:.2f} cm")
    summary = {
        "trials": args.trials,
        "ate_mean_m": float(np.mean(ates)),
        "ate_std_m": float(np.std(ates)),
        "ate_max_m": float(np.max(ates)),
        "fps_mean": float(np.mean(fpss)),
    }
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


def inject_ext_test(args):
    """Extrinsic-perturbation robustness ladder (dual-lidar, fixed mode)."""
    X_true = se3.exp(jnp.array([0.25, -0.1, 0.05, 0.05, -0.03, 0.5]))
    d = _outdir("inject_ext")
    summary = {}
    for level, mag in PERTURBATION_LEVELS.items():
        key = jax.random.PRNGKey(hash(level) % (2**31))
        delta = mag * jax.random.normal(key, (6,))
        X_used = se3.boxplus(X_true, delta)
        cfg = platforms.synthetic(n_lidars=2, extrinsic_mode=0)
        pipe = FullPipeline(cfg)
        from mloam_tpu.odometry import estimator as E

        ext = Pose(jnp.stack([Pose.identity().q, X_used.q]),
                   jnp.stack([Pose.identity().t, X_used.t]))
        pipe.odom.window = E.set_extrinsics(pipe.odom.window, ext)
        res = run_sequence(cfg, args.frames, seed=args.seed, n_lidars=2,
                           ext_true=X_true, pipe=pipe)
        summary[level] = {"perturb_norm": float(mag),
                          "ate_m": res["ate_m"]}
        print(f"{level}: perturb {mag:.2f} -> ATE {res['ate_m']*100:.2f} cm")
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)


def calib_test(args):
    """Online extrinsic-calibration lifecycle program (the reference's
    calib_test in run_mloam.py: ESTIMATE_EXTRINSIC 2 -> 1 -> 0). Dual-lidar
    rig with a fully unknown second extrinsic; records the mode-transition
    frames, the per-frame extrinsic error trace (the extrinsic_parameter.txt
    / initialization.txt counterpart) and the final error + covariance."""
    X_true = se3.exp(jnp.array([0.25, -0.1, 0.05, 0.05, -0.03, 0.5]))
    cfg = platforms.synthetic(n_lidars=2, extrinsic_mode=2)
    pipe = FullPipeline(cfg)

    w = W.make_world(jax.random.PRNGKey(args.seed))
    # rotation-rich motion: the screw-motion consistency filter needs
    # orientation excitation to accumulate hand-eye pose pairs and push the
    # rotation system's second singular value over the 0.25 gate (reference
    # initial_extrinsics.cpp:104-116,58 — calibration NEEDS excited motion;
    # at wobble 0.1 sigma2 only reaches ~0.18 in 45 frames)
    traj = W.make_trajectory(jax.random.PRNGKey(args.seed + 1), wobble=0.25)
    model = cfg.rig.models[0]
    seqs = [W.render_sequence(w, traj, model, args.frames),
            W.render_sequence(w, traj, model, args.frames, extrinsic=X_true)]

    d = _outdir("calib")
    trace = []
    transitions = {}
    for i in range(args.frames):
        frames = [
            RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
            for imgs, _ in seqs
        ]
        out = pipe.process(frames)
        mode = int(out.odom.ext_mode)
        ext1 = Pose(out.odom.extrinsics.q[1], out.odom.extrinsics.t[1])
        err = np.asarray(se3.boxminus(ext1, X_true))
        # se3 tangent layout: [:3] = rho (translation), [3:] = phi (rotation)
        pos_err = float(np.linalg.norm(err[:3]))
        rot_err = float(np.linalg.norm(err[3:]))
        trace.append({"frame": i, "mode": mode,
                      "rot_err_rad": rot_err, "pos_err_m": pos_err})
        if mode < 2 and "init_done" not in transitions:
            transitions["init_done"] = i          # 2 -> 1 (hand-eye seeded)
        if mode == 0 and "frozen" not in transitions:
            transitions["frozen"] = i             # 1 -> 0 (voting freeze)
    with open(os.path.join(d, "extrinsic_trace.json"), "w") as f:
        json.dump(trace, f, indent=2)
    cov = pipe.odom.ext_cov
    summary = {
        "frames": args.frames,
        "final_mode": trace[-1]["mode"],
        "transitions": transitions,
        "final_rot_err_rad": trace[-1]["rot_err_rad"],
        "final_pos_err_m": trace[-1]["pos_err_m"],
        # ext_cov holds non-reference lidars only: lidar 1 -> index 0
        "ext_cov_trace": (float(np.trace(cov[0])) if cov is not None
                          else None),
    }
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


def scaling_test(args):
    """Distributed-BA scaling harness: factor-sharded PGO throughput at
    1..N devices (BASELINE target: >=80% scaling efficiency).

    On a multi-chip mesh the reduction rides ICI; on the CPU test mesh the
    virtual devices share host cores, so efficiency numbers there validate
    the *mechanism*, not the hardware scaling.
    """
    from mloam_tpu.parallel import mesh as M
    from mloam_tpu.parallel import sharded_pgo as PG

    n_poses = args.poses
    key = jax.random.PRNGKey(0)
    step = se3.exp(jnp.array([0.5, 0, 0, 0, 0, 2 * np.pi / n_poses]))
    gt = [Pose.identity()]
    for _ in range(n_poses - 1):
        gt.append(se3.compose(gt[-1], step))
    # dense-ish graph: sequential + skip-5 + skip-25 edges
    ei, ej = [], []
    for sk in (1, 5, 25):
        ei += list(range(0, n_poses - sk))
        ej += list(range(sk, n_poses))
    rels = [se3.relative(gt[a], gt[b]) for a, b in zip(ei, ej)]
    edges = PG.PoseGraphEdges(
        i=jnp.array(ei, jnp.int32), j=jnp.array(ej, jnp.int32),
        z_q=jnp.stack([r.q for r in rels]),
        z_t=jnp.stack([r.t for r in rels]),
        weight=jnp.ones((len(ei), 6)),
    )
    poses0 = Pose(jnp.stack([p.q for p in gt]), jnp.stack([p.t for p in gt]))
    noise = 0.02 * jax.random.normal(key, (n_poses, 6))
    poses0 = jax.vmap(se3.boxplus)(poses0, noise)
    iters = 10
    n_avail = len(jax.devices())
    results = {}
    for n_dev in [d for d in (1, 2, 4, 8) if d <= n_avail]:
        mesh = M.make_mesh(n_dev) if n_dev > 1 else None
        f = lambda p: PG.optimize_pose_graph(p, edges, iters=iters, mesh=mesh)
        jax.block_until_ready(f(poses0))  # compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = f(poses0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        eps = len(ei) * iters / dt
        results[n_dev] = {"edge_iters_per_s": eps, "wall_s": dt}
        base = results[min(results)]["edge_iters_per_s"]
        eff = eps / (base * n_dev / min(results))
        print(f"devices={n_dev}: {eps:,.0f} edge-iters/s  wall={dt*1e3:.1f}ms"
              f"  efficiency={eff:.2f}")
    d = _outdir("scaling")
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump({str(k): v for k, v in results.items()}, f, indent=2)


def slam_test(args):
    """Full-system run (odometry + mapping + loop closure) exporting every
    observability artifact the reference publishes via rviz/disk: TUM
    trajectory, trajectory plot, keyframe map (PCD + PNG), pose-graph plot
    with loop edges, the last scan-context descriptor image, timing report
    (SURVEY §5.5)."""
    from mloam_tpu.models.pipeline import SlamPipeline
    from mloam_tpu.utils import viz

    cfg = platforms.synthetic(n_lidars=args.lidars)
    cfg = dataclasses.replace(
        cfg,
        mapping=dataclasses.replace(cfg.mapping, keyframe_dist=0.05,
                                    keyframe_angle_deg=0.5),
        loop=dataclasses.replace(cfg.loop, skip_interval=2,
                                 num_exclude_recent=3),
    )
    w = W.make_world(jax.random.PRNGKey(args.seed))
    traj = W.make_trajectory(jax.random.PRNGKey(args.seed + 1), wobble=0.05)
    model = cfg.rig.models[0]
    imgs, gt_poses = W.render_sequence(w, traj, model, args.frames)
    pipe = SlamPipeline(cfg)
    est_t, est_q, ts = [], [], []
    for i in range(args.frames):
        img = RangeImage(*[jax.tree.map(lambda x: x[i], f) for f in imgs])
        with timing.timer("odom_process"):
            out = pipe.process([img])
            jax.block_until_ready(out.full.map_pose)
        est_t.append(np.asarray(out.full.map_pose.t))
        est_q.append(np.asarray(out.full.map_pose.q))
        ts.append(i * model.scan_period)
    est_t, est_q = np.stack(est_t), np.stack(est_q)
    gt_t = np.asarray(gt_poses.t[: args.frames])
    ate = evaluation.ate_rmse(est_t, gt_t)

    d = _outdir("slam")
    evaluation.save_tum(os.path.join(d, "traj_est.tum"),
                        np.asarray(ts), est_t, est_q)
    viz.plot_trajectory(os.path.join(d, "trajectory.png"), est_t, gt_t,
                        title=f"slam seed={args.seed}")
    # keyframe map: project stored base-frame features through keyframe poses
    db = pipe.full.mapper_state.db
    n_kf = int(jax.device_get(db.head))
    if n_kf > 0:
        pts, msk = [], []
        for k in range(n_kf):
            P = Pose(db.poses.q[k], db.poses.t[k])
            pts.append(np.asarray(se3.transform_points(P, db.surf.xyz[k])))
            msk.append(np.asarray(db.surf.mask[k]))
        xyz = np.concatenate(pts)
        mask = np.concatenate(msk)
        viz.export_map_pcd(os.path.join(d, "map.pcd"), xyz, mask)
        viz.plot_map(os.path.join(d, "map.png"), xyz, mask, traj_t=est_t)
    # pose graph + scan context
    n = int(jax.device_get(pipe.loop_state.count))
    if n > 0:
        kf_t = np.asarray(pipe.loop_state.poses.t[:n])
        li = np.asarray(pipe.loop_state.loop_i)
        lj = np.asarray(pipe.loop_state.loop_j)
        lv = np.asarray(pipe.loop_state.loop_valid)
        loop_edges = [(int(a), int(b)) for a, b, v in zip(li, lj, lv) if v]
        viz.plot_pose_graph(os.path.join(d, "pose_graph.png"), kf_t,
                            loop_edges)
        viz.plot_scan_context(
            os.path.join(d, "scan_context.png"),
            np.asarray(pipe.loop_state.sc_db.desc[n - 1]),
        )
    summary = {"ate_m": float(ate), "frames": args.frames,
               "keyframes": n_kf, "loops": pipe.n_loops,
               "timing": timing.all_stats()}
    with open(os.path.join(d, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({"ate_m": float(ate), "keyframes": n_kf,
                      "loops": pipe.n_loops}))


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="program", required=True)
    for name in ("single", "mc", "calib", "inject_ext", "scaling", "slam"):
        p = sub.add_parser(name)
        # calib needs runway: hand-eye pair accumulation + sigma2 gate
        # (~40 frames at wobble 0.25), then n_calib_samples voting frames
        p.add_argument("--frames", type=int,
                       default=90 if name == "calib" else 30)
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--lidars", type=int, default=1)
        if name == "mc":
            p.add_argument("--trials", type=int, default=3)
        if name == "scaling":
            p.add_argument("--poses", type=int, default=256)
    args = ap.parse_args()
    {"single": single_test, "mc": mc_test, "calib": calib_test,
     "inject_ext": inject_ext_test, "scaling": scaling_test,
     "slam": slam_test}[args.program](args)


if __name__ == "__main__":
    main()
