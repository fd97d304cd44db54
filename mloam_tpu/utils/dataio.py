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
