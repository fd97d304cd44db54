"""Native dataset runtime: decoders + prefetch ring vs numpy ground truth."""

import os
import tempfile

import numpy as np
import pytest

from mloam_tpu.utils import dataio


@pytest.fixture(scope="module")
def kitti_files():
    d = tempfile.mkdtemp()
    paths = []
    rng = np.random.default_rng(0)
    for i in range(5):
        pts = rng.uniform(-50, 50, (1000 + 100 * i, 4)).astype(np.float32)
        p = os.path.join(d, f"{i:06d}.bin")
        pts.tofile(p)
        paths.append(p)
    return d, paths


def write_pcd_ascii(path, pts):
    with open(path, "w") as f:
        f.write("VERSION .7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
                "TYPE F F F F\nCOUNT 1 1 1 1\n"
                f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
                f"POINTS {len(pts)}\nDATA ascii\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]} {p[3]}\n")


def write_pcd_binary(path, pts):
    with open(path, "wb") as f:
        hdr = ("VERSION .7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
               "TYPE F F F F\nCOUNT 1 1 1 1\n"
               f"WIDTH {len(pts)}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
               f"POINTS {len(pts)}\nDATA binary\n")
        f.write(hdr.encode())
        f.write(np.asarray(pts, np.float32).tobytes())


class TestNative:
    def test_native_builds(self):
        assert dataio.native_available(), "native library failed to build"

    def test_kitti_bin_roundtrip(self, kitti_files):
        _, paths = kitti_files
        want = np.fromfile(paths[0], np.float32).reshape(-1, 4)
        got = dataio.read_kitti_bin(paths[0])
        np.testing.assert_array_equal(got, want)

    def test_pcd_ascii(self):
        pts = np.round(np.random.default_rng(1).uniform(-5, 5, (50, 4)), 3)
        p = tempfile.mktemp(suffix=".pcd")
        write_pcd_ascii(p, pts)
        got = dataio.read_pcd(p)
        np.testing.assert_allclose(got, pts.astype(np.float32), atol=1e-4)

    def test_pcd_binary(self):
        pts = np.random.default_rng(2).uniform(-5, 5, (64, 4)).astype(np.float32)
        p = tempfile.mktemp(suffix=".pcd")
        write_pcd_binary(p, pts)
        got = dataio.read_pcd(p)
        np.testing.assert_array_equal(got, pts)

    def test_prefetch_stream_order_and_content(self, kitti_files):
        _, paths = kitti_files
        reader = dataio.PrefetchReader(paths, "kitti")
        frames = list(reader)
        reader.close()
        assert len(frames) == len(paths)
        for p, fr in zip(paths, frames):
            want = np.fromfile(p, np.float32).reshape(-1, 4)
            np.testing.assert_array_equal(fr, want)

    def test_convert_kitti_sequence(self, kitti_files):
        d, paths = kitti_files
        out = tempfile.mktemp(suffix=".npz")
        n = dataio.convert_kitti_sequence(d, out, cap=2048)
        assert n == len(paths)
        z = np.load(out)
        assert z["xyzi"].shape == (n, 2048, 4)
        assert int(z["mask"][0].sum()) == 1000


class TestRealtimeGate:
    """Frame-drop backpressure (reference rosNodeSR.cpp:111-123 /
    lidar_mapper_keyframe.cpp:1048-1053 load shedding)."""

    def test_keeps_up_no_drops(self):
        from mloam_tpu.utils.realtime import RealtimeGate

        clk = iter([i * 0.1 for i in range(100)])
        gate = RealtimeGate(max_lag_s=0.2, clock=lambda: next(clk))
        # wall advances exactly with the stream: everything admitted
        assert all(gate.admit(i * 0.1) for i in range(50))
        assert gate.n_dropped == 0

    def test_sheds_when_behind(self):
        from mloam_tpu.utils.realtime import RealtimeGate

        # wall clock runs 2x faster than the stream: processing too slow
        clk = iter([i * 0.2 for i in range(100)])
        gate = RealtimeGate(max_lag_s=0.25, clock=lambda: next(clk))
        decisions = [gate.admit(i * 0.1) for i in range(40)]
        assert gate.n_dropped > 10
        # the first frames (within the lag budget) were admitted
        assert decisions[0] and decisions[1]
        assert gate.stats()["dropped"] == gate.n_dropped

    def test_gated_iterator(self):
        from mloam_tpu.utils.realtime import RealtimeGate, gated

        clk = iter([i * 0.3 for i in range(100)])
        gate = RealtimeGate(max_lag_s=0.35, clock=lambda: next(clk))
        frames = [(i * 0.1, f"f{i}") for i in range(20)]
        out = list(gated(iter(frames), gate))
        assert 0 < len(out) < 20
