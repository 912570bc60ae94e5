"""ctypes binding for the native host engine (csrc/libcsn_coords.so).

Falls back to the pure-numpy path in core/pyramid.py when the library is not
built. Build with `make -C csrc` (done automatically on first import if a
compiler is available)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_SO = os.path.join(_CSRC, "libcsn_coords.so")

KIND = {"same": 0, "down": 1, "up": 2}


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_CSRC, "coords.cpp")
    stale = (not os.path.exists(_SO)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_SO)))
    if stale:
        # rebuild on source changes too: a stale .so with an old C ABI
        # would be called with the new argtypes (silent corruption)
        try:
            subprocess.run(["make", "-C", _CSRC, "-B"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            # never load a stale binary against the new argtypes
            return None
    if not os.path.exists(_SO):
        return None
    lib = ctypes.CDLL(_SO)
    lib.csn_shape_create.restype = ctypes.c_void_p
    lib.csn_shape_create.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32]
    lib.csn_shape_num_voxels.restype = ctypes.c_int64
    lib.csn_shape_num_voxels.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.csn_shape_coords.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64]
    lib.csn_shape_p2v.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int32)]
    lib.csn_shape_kernel_map.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
    lib.csn_shape_interp.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float)]
    lib.csn_shape_destroy.argtypes = [ctypes.c_void_p]
    try:
        lib.csn_window_jobs.restype = ctypes.c_int64
        lib.csn_window_jobs.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
    except AttributeError:  # stale .so without the symbol
        pass
    try:
        lib.csn_encode_kmap16.restype = ctypes.c_int32
        lib.csn_encode_kmap16.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int16)]
    except AttributeError:  # stale .so without the symbol
        pass
    try:
        lib.csn_globalize_kmap.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    except AttributeError:  # stale .so without the symbol
        pass
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


class NativeShape:
    """One shape's coordinate pyramid built in C++."""

    def __init__(self, points: np.ndarray, n_levels: int):
        lib = _load()
        assert lib is not None
        self.lib = lib
        pts = np.ascontiguousarray(points, dtype=np.float32)
        self.n_points = pts.shape[0]
        self.n_levels = n_levels
        self.handle = lib.csn_shape_create(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_points, n_levels)
        if not self.handle:
            raise ValueError(
                "csn_shape_create rejected the point set: a coordinate is "
                "non-finite or |c| >= 2^20 voxel units (the packed 21-bit "
                "key lanes would alias) — check voxel_size and the dataset "
                "for outlier/NaN points")

    def num_voxels(self, level: int) -> int:
        return int(self.lib.csn_shape_num_voxels(self.handle, level))

    def coords(self, level: int, cap: int) -> np.ndarray:
        n = min(self.num_voxels(level), cap)
        out = np.zeros((max(n, 1), 3), dtype=np.int32)
        self.lib.csn_shape_coords(
            self.handle, level,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n)
        return out[:n]

    def p2v(self) -> np.ndarray:
        out = np.zeros(self.n_points, dtype=np.int32)
        self.lib.csn_shape_p2v(
            self.handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def kernel_map(self, kind: str, level: int, ksize: int,
                   cap_dst: int) -> np.ndarray:
        K = ksize ** 3
        out = np.empty((K, cap_dst), dtype=np.int32)
        self.lib.csn_shape_kernel_map(
            self.handle, KIND[kind], level, ksize, cap_dst,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def interp(self) -> tuple:
        idx = np.empty((self.n_points, 8), dtype=np.int32)
        w = np.empty((self.n_points, 8), dtype=np.float32)
        self.lib.csn_shape_interp(
            self.handle, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return idx, w

    def __del__(self):
        try:
            self.lib.csn_shape_destroy(self.handle)
        except Exception:
            pass


def window_jobs_native(kmap: np.ndarray, n_in: int, tile: int, window: int,
                       group: int, cap: int, align: int = 16):
    """C++ window-job worklist (csrc csn_window_jobs). Returns the int32
    [5, cap] meta array, -1 on capacity overflow, or None when the native
    engine is unavailable (callers fall back to the numpy builder)."""
    lib = _load()
    if lib is None or not hasattr(lib, "csn_window_jobs"):
        return None
    kmap = np.ascontiguousarray(kmap, dtype=np.int32)
    meta = np.zeros((5, cap), dtype=np.int32)
    k, n_out = kmap.shape
    n = lib.csn_window_jobs(
        kmap.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        k, n_out, n_in, tile, window, group, cap, align,
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if n < 0:
        return -1
    return meta


def encode_kmap16_native(kmap: np.ndarray, n_in: int, wire_tile: int,
                         sent16: int = 32767):
    """C++ compact kernel-map encode (csrc csn_encode_kmap16). Returns the
    int16 delta table, -1 when the geometry's delta range exceeds int16
    (caller keeps int32), or None when the native engine is unavailable
    (callers fall back to the numpy encoder). Bit-identical to
    core/pyramid.py encode_kmap16 (tested)."""
    lib = _load()
    if lib is None or not hasattr(lib, "csn_encode_kmap16"):
        return None
    if sent16 != 32767:  # the C ABI hardcodes the sentinel; a different
        return None      # constant must use the numpy encoder
    kmap = np.ascontiguousarray(kmap, dtype=np.int32)
    k, n_out = kmap.shape
    out = np.empty((k, n_out), dtype=np.int16)
    rc = lib.csn_encode_kmap16(
        kmap.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        k, n_out, n_in, wire_tile,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    if rc < 0:
        return -1
    return out


def globalize_kmap_native(local: np.ndarray, n_src: int, add: int, sent: int,
                          out: np.ndarray, col0: int) -> bool:
    """Fused C++ form of fill_shape's kmap globalization: write
    `out[:, col0:col0+Ld] = where(0 <= local < n_src, add + local, sent)`
    in one GIL-released pass (csrc csn_globalize_kmap). Returns False when
    the native engine lacks the symbol (caller runs the numpy form).
    `local` must be int32 [K, Ld]; `out` int32 C-contiguous [K, W]."""
    lib = _load()
    if lib is None or not hasattr(lib, "csn_globalize_kmap"):
        return False
    assert local.dtype == np.int32 and local.flags.c_contiguous
    assert out.dtype == np.int32 and out.flags.c_contiguous
    k, ld = local.shape
    base = out.ctypes.data + col0 * 4
    lib.csn_globalize_kmap(
        local.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        k, ld, n_src, add, sent,
        ctypes.cast(base, ctypes.POINTER(ctypes.c_int32)), out.shape[1])
    return True
