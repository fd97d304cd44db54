"""Deployment-ingest integration: the full wire path
``encode_vlp16_packets -> vlp16_decode -> PackedFrame -> pipeline`` and the
KITTI shard path ``.bin files -> convert_kitti_sequence -> project ->
pipeline`` must drive the SLAM system end-to-end (round-1 gap: only codec
round-trips were tested). Reference counterparts: the rosbag/driver ingest
feeding rosNode*.cpp and kittiHelper.cpp:27-43."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mloam_tpu.core import rangeimage as RI
from mloam_tpu.core.rangeimage import LidarModel, RangeImage
from mloam_tpu.models import platforms
from mloam_tpu.models.run_synthetic import render
from mloam_tpu.utils import dataio, evaluation


def _to_packets(img_np, model):
    """RangeImage (numpy leaves) -> VLP-16 packet bytes via the wire
    quantization (2 mm counts + u8 intensity)."""
    pf = RI.pack_frame(RangeImage(*[jnp.asarray(x) for x in img_np]))
    rng_q = np.asarray(pf.rng_q)
    inten = np.asarray(pf.intensity_q)
    ring, col = np.nonzero(rng_q)
    return dataio.encode_vlp16_packets(
        ring, col, rng_q[ring, col], inten[ring, col], model.n_cols
    ), pf


class TestPacketsToSlam:
    N = 12

    @pytest.mark.skipif(not dataio.native_available(),
                        reason="native library unavailable")
    def test_packet_stream_drives_pipeline(self):
        from mloam_tpu.models.pipeline import FullPipeline

        cfg = platforms.synthetic(n_lidars=1)
        model = cfg.rig.models[0]
        imgs, gt = render(cfg, self.N)
        arr = jax.tree.map(lambda x: np.asarray(x), imgs)
        pipe = FullPipeline(cfg)
        est_t = []
        for i in range(self.N):
            frame = [x[i] for x in arr]
            packets, pf_direct = _to_packets(frame, model)
            rng_q, inten_q, n_ret = dataio.vlp16_decode(packets, model)
            # the decoded wire frame is BIT-IDENTICAL to the direct packing:
            # everything downstream of here is the already-validated path
            np.testing.assert_array_equal(rng_q, np.asarray(pf_direct.rng_q))
            np.testing.assert_array_equal(
                inten_q, np.asarray(pf_direct.intensity_q))
            assert n_ret == int((rng_q > 0).sum())
            pf = RI.PackedFrame(jnp.asarray(rng_q), jnp.asarray(inten_q))
            out = pipe.process([pf])
            est_t.append(np.asarray(out.map_pose.t))
        ate = evaluation.ate_rmse(np.stack(est_t),
                                  np.asarray(gt.t[: self.N]))
        assert np.isfinite(ate)
        assert ate < 0.05, f"packet-ingest ATE {ate*100:.1f} cm"


class TestKittiShardToPipeline:
    N = 8

    @pytest.mark.skipif(not dataio.native_available(),
                        reason="native library unavailable")
    def test_bin_files_to_odometry(self):
        from mloam_tpu.models.pipeline import OdometryPipeline

        cfg = platforms.synthetic(n_lidars=1)
        model = cfg.rig.models[0]
        imgs, gt = render(cfg, self.N)
        arr = jax.tree.map(lambda x: np.asarray(x), imgs)
        d = tempfile.mkdtemp()
        for i in range(self.N):
            img = RangeImage(*[x[i] for x in arr])
            xyz = np.asarray(img.xyz).reshape(-1, 3)
            ok = np.asarray(img.valid).reshape(-1)
            pts = np.concatenate(
                [xyz[ok], np.asarray(img.intensity).reshape(-1)[ok, None]],
                axis=1,
            ).astype(np.float32)
            pts.tofile(os.path.join(d, f"{i:06d}.bin"))
        shard = os.path.join(d, "seq.npz")
        n = dataio.convert_kitti_sequence(d, shard, cap=40_000)
        assert n == self.N
        data = np.load(shard)
        pipe = OdometryPipeline(cfg)
        est_t = []
        for i in range(self.N):
            pts = data["xyzi"][i]
            ok = data["mask"][i]
            img = RI.project(jnp.asarray(pts[:, :3]), jnp.asarray(ok), model,
                             intensity=jnp.asarray(pts[:, 3]))
            out = pipe.process([img])
            est_t.append(np.asarray(out.pose.t))
        ate = evaluation.ate_rmse(np.stack(est_t), np.asarray(gt.t[: self.N]))
        assert np.isfinite(ate)
        assert ate < 0.06, f"kitti-shard ATE {ate*100:.1f} cm"
