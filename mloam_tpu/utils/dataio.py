"""Dataset I/O: native-accelerated readers + converters.

The decode/prefetch hot path lives in C++ (``mloam_tpu/native/dataset.cpp``,
built to libmloam_native.so by its Makefile) and is driven here via ctypes;
pure-numpy fallbacks keep everything functional without the native build.

Includes the kittiHelper counterpart (``estimator/src/kittiHelper.cpp``):
KITTI raw velodyne .bin sequences -> packed .npz shards of fixed-capacity
padded clouds, the framework's on-disk frame format (replacing rosbags,
SURVEY §7.2 step 7).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmloam_native.so")
_lib = None


def _load_native(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ds_open.restype = ctypes.c_void_p
    lib.ds_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.ds_next.restype = ctypes.c_int64
    lib.ds_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float)]
    lib.ds_close.argtypes = [ctypes.c_void_p]
    lib.ds_read_kitti_bin.restype = ctypes.c_int64
    lib.ds_read_kitti_bin.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
    ]
    lib.ds_read_pcd.restype = ctypes.c_int64
    lib.ds_read_pcd.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
    ]
    lib.ds_grid_pack.restype = None
    lib.ds_grid_pack.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.ds_vlp16_decode.restype = ctypes.c_int64
    lib.ds_vlp16_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.dsp_open.restype = ctypes.c_void_p
    lib.dsp_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
    ]
    lib.dsp_next.restype = ctypes.c_int64
    lib.dsp_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.dsp_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_native() is not None


def read_kitti_bin(path: str, max_pts: int = 150_000) -> np.ndarray:
    """[N, 4] float32 (x, y, z, intensity)."""
    lib = _load_native()
    if lib is not None:
        buf = np.empty((max_pts, 4), np.float32)
        n = lib.ds_read_kitti_bin(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_pts,
        )
        if n < 0:
            raise IOError(f"failed to read {path}")
        return buf[:n].copy()
    data = np.fromfile(path, dtype=np.float32)
    return data.reshape(-1, 4)[:max_pts]


def read_pcd(path: str, max_pts: int = 500_000) -> np.ndarray:
    """[N, 4] float32 from an ascii/binary PCD with x y z [intensity]."""
    lib = _load_native()
    if lib is not None:
        buf = np.empty((max_pts, 4), np.float32)
        n = lib.ds_read_pcd(
            path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_pts,
        )
        if n < 0:
            raise IOError(f"failed to parse {path}")
        return buf[:n].copy()
    return _read_pcd_numpy(path, max_pts)


def _read_pcd_numpy(path: str, max_pts: int) -> np.ndarray:
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            key, _, rest = line.partition(" ")
            header[key] = rest.split()
            if key == "DATA":
                break
        fields = header["FIELDS"]
        sizes = [int(s) for s in header.get("SIZE", ["4"] * len(fields))]
        types = header.get("TYPE", ["F"] * len(fields))
        n = int(header["POINTS"][0])
        mode = header["DATA"][0]
        np_types = {("F", 4): "f4", ("F", 8): "f8", ("U", 1): "u1",
                    ("U", 4): "u4", ("I", 4): "i4"}
        dtype = np.dtype({
            "names": fields,
            "formats": [np_types[(t, s)] for t, s in zip(types, sizes)],
        })
        if mode == "ascii":
            arr = np.loadtxt(f, max_rows=n)
            rec = {name: arr[:, i] for i, name in enumerate(fields)}
        else:
            raw = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype)
            rec = {name: raw[name] for name in fields}
    n = min(n, max_pts)
    out = np.zeros((n, 4), np.float32)
    out[:, 0] = rec["x"][:n]
    out[:, 1] = rec["y"][:n]
    out[:, 2] = rec["z"][:n]
    if "intensity" in rec:
        out[:, 3] = rec["intensity"][:n]
    return out


class PrefetchReader:
    """Background-thread frame streaming over a file list (native ring)."""

    def __init__(self, paths: list[str], fmt: str = "kitti",
                 max_pts: int = 150_000, capacity: int = 4):
        self.max_pts = max_pts
        self._lib = _load_native()
        self._handle = None
        self._paths = paths
        self._fmt = 0 if fmt == "kitti" else 1
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in paths]
            )
            self._handle = self._lib.ds_open(
                arr, len(paths), self._fmt, max_pts, capacity
            )
        self._fallback_iter = iter(paths) if self._handle is None else None

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._handle is not None:
            buf = np.empty((self.max_pts, 4), np.float32)
            while True:
                n = self._lib.ds_next(
                    self._handle,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                )
                if n <= 0:
                    break
                yield buf[:n].copy()
        else:
            for p in self._paths:
                yield (read_kitti_bin(p, self.max_pts) if self._fmt == 0
                       else read_pcd(p, self.max_pts))

    def close(self):
        if self._handle is not None:
            self._lib.ds_close(self._handle)
            self._handle = None


# hardware laser id -> grid ring (0 = lowest elevation) for the VLP-16's
# interleaved firing ladder: even ids are -15..-1 deg, odd ids +1..+15
VLP16_RING_TABLE = np.array(
    [i // 2 if i % 2 == 0 else 8 + i // 2 for i in range(16)], np.int32
)


def grid_pack(points: np.ndarray, model) -> tuple[np.ndarray, np.ndarray]:
    """[N, 4] xyzi points -> PackedFrame arrays (u16 2 mm ranges, u8
    intensity) via the native gridder (numpy fallback through
    core.rangeimage when unavailable). Mirrors rangeimage.project +
    pack_frame exactly (closest-return-wins, nearest-ring)."""
    pts = np.ascontiguousarray(points, np.float32)
    lib = _load_native()
    if lib is not None:
        rng_q = np.empty((model.n_rings, model.n_cols), np.uint16)
        inten_q = np.empty((model.n_rings, model.n_cols), np.uint8)
        lib.ds_grid_pack(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            pts.shape[0], model.n_rings, model.n_cols,
            model.fov_up_deg, model.fov_down_deg,
            model.min_range, model.max_range,
            rng_q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            inten_q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return rng_q, inten_q
    from mloam_tpu.core import rangeimage as RI

    img = RI.project(pts[:, :3], np.ones(pts.shape[0], bool), model,
                     intensity=pts[:, 3])
    pf = RI.pack_frame(img)
    return np.asarray(pf.rng_q), np.asarray(pf.intensity_q)


def vlp16_decode(packets: bytes | np.ndarray, model,
                 ring_table: np.ndarray | None = None
                 ) -> tuple[np.ndarray, np.ndarray, int]:
    """One sweep of Velodyne-style 1206-byte packets -> PackedFrame arrays.

    The sensor's native 2 mm distance counts pass straight through into the
    wire format (no float conversion anywhere on the host). Returns
    (rng_q [R,C] u16, intensity_q [R,C] u8, n_returns_decoded). The live
    counterpart of the reference's rosbag/driver ingest (rosNodeSR.cpp
    subscribes to the driver's assembled clouds; here the driver itself is
    part of the framework). Requires the native library.
    """
    lib = _load_native()
    if lib is None:
        raise RuntimeError("native library required for packet decoding")
    buf = np.frombuffer(packets, np.uint8) if isinstance(packets, bytes) \
        else np.ascontiguousarray(packets, np.uint8)
    table = np.ascontiguousarray(
        VLP16_RING_TABLE if ring_table is None else ring_table, np.int32
    )
    rng_q = np.empty((model.n_rings, model.n_cols), np.uint16)
    inten_q = np.empty((model.n_rings, model.n_cols), np.uint8)
    n = lib.ds_vlp16_decode(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.size,
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        model.n_rings, model.n_cols,
        rng_q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        inten_q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return rng_q, inten_q, int(n)


def encode_vlp16_packets(ring: np.ndarray, col: np.ndarray,
                         rng_q: np.ndarray, inten: np.ndarray,
                         n_cols: int,
                         ring_table: np.ndarray | None = None) -> bytes:
    """Synthesize Velodyne-style packets from per-return (ring, col, 2 mm
    count, intensity) arrays — the test/simulation encoder dual of
    vlp16_decode. Emits one 16-channel firing sequence per distinct column
    (two sequences per 100-byte block, 12 blocks per 1206-byte packet)."""
    table = VLP16_RING_TABLE if ring_table is None else ring_table
    ring_to_ch = np.empty(16, np.int64)
    ring_to_ch[np.asarray(table)] = np.arange(16)
    cols = np.unique(col)
    # per-sequence channel payloads, keyed by column
    seqs = []
    for c in cols:
        m = col == c
        dist = np.zeros(16, np.uint16)
        ii = np.zeros(16, np.uint8)
        dist[ring_to_ch[ring[m]]] = rng_q[m]
        ii[ring_to_ch[ring[m]]] = inten[m]
        az = int(round(c * 36000 / n_cols))
        seqs.append((az, dist, ii))
    out = bytearray()
    for i in range(0, len(seqs), 24):  # 24 sequences = 12 blocks = 1 packet
        pkt = bytearray()
        chunk = seqs[i:i + 24]
        for b in range(12):
            s1 = chunk[2 * b] if 2 * b < len(chunk) else None
            if s1 is None:
                pkt += b"\x00" * 100  # invalid block (flag != 0xFFEE)
                continue
            pkt += bytes([0xFF, 0xEE, s1[0] & 0xFF, (s1[0] >> 8) & 0xFF])
            for seq in (s1, chunk[2 * b + 1] if 2 * b + 1 < len(chunk) else None):
                for ch in range(16):
                    if seq is None:
                        pkt += b"\x00\x00\x00"
                    else:
                        d, it = int(seq[1][ch]), int(seq[2][ch])
                        pkt += bytes([d & 0xFF, (d >> 8) & 0xFF, it])
        pkt += b"\x00" * 6  # timestamp/factory tail
        assert len(pkt) == 1206
        out += pkt
    return bytes(out)


class PackedPrefetchReader:
    """Background-thread PackedFrame streaming: the native worker decodes
    each file AND grids/quantizes it, so iteration yields ready-to-ship
    (rng_q, intensity_q) wire buffers (86 KB/sweep for a VLP-16)."""

    def __init__(self, paths: list[str], model, fmt: str = "kitti",
                 max_pts: int = 150_000, capacity: int = 4):
        self.model = model
        self._lib = _load_native()
        self._paths = paths
        self._fmt = 0 if fmt == "kitti" else 1
        self._max_pts = max_pts
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(paths))(
                *[p.encode() for p in paths]
            )
            self._handle = self._lib.dsp_open(
                arr, len(paths), self._fmt, max_pts, capacity,
                model.n_rings, model.n_cols, model.fov_up_deg,
                model.fov_down_deg, model.min_range, model.max_range,
            )

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        if self._handle is not None:
            while True:
                rng_q = np.empty((self.model.n_rings, self.model.n_cols),
                                 np.uint16)
                inten_q = np.empty((self.model.n_rings, self.model.n_cols),
                                   np.uint8)
                ok = self._lib.dsp_next(
                    self._handle,
                    rng_q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                    inten_q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                )
                if ok <= 0:
                    break
                yield rng_q, inten_q
        else:
            for p in self._paths:
                pts = (read_kitti_bin(p, self._max_pts) if self._fmt == 0
                       else read_pcd(p, self._max_pts))
                yield grid_pack(pts, self.model)

    def close(self):
        if self._handle is not None:
            self._lib.dsp_close(self._handle)
            self._handle = None


def convert_kitti_sequence(velodyne_dir: str, out_path: str,
                           max_frames: int | None = None,
                           cap: int = 131_072) -> int:
    """KITTI velodyne dir -> one .npz shard of padded clouds + masks
    (kittiHelper counterpart). Returns the number of frames written."""
    files = sorted(
        os.path.join(velodyne_dir, f)
        for f in os.listdir(velodyne_dir) if f.endswith(".bin")
    )
    if max_frames:
        files = files[:max_frames]
    xyzi = np.zeros((len(files), cap, 4), np.float32)
    mask = np.zeros((len(files), cap), bool)
    for i, pts in enumerate(PrefetchReader(files, "kitti", cap)):
        n = pts.shape[0]
        xyzi[i, :n] = pts
        mask[i, :n] = True
    np.savez_compressed(out_path, xyzi=xyzi, mask=mask)
    return len(files)
