"""ctypes bindings for the native host core (native/pfpp_native.cpp).

Lazily compiles the shared library on first use (g++ -O3 -fopenmp) into a build cache and
falls back to numpy implementations when no compiler is available — callers never need to
care. All functions are exact counterparts of their Python references (tests assert parity).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "pfpp_native.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libpfpp_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None | bool = None  # None = untried, False = unavailable


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib
    with _lock:
        if _lib is None:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(_SRC) > os.path.getmtime(
                _LIB_PATH
            ):
                if not _build():
                    _lib = False
                    return None
            lib = ctypes.CDLL(_LIB_PATH)
            f32p = ctypes.POINTER(ctypes.c_float)
            i32p = ctypes.POINTER(ctypes.c_int32)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.pfpp_nn_distance.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int, f32p, i32p]
            lib.pfpp_fps.argtypes = [f32p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                     i32p]
            lib.pfpp_augment_parts.argtypes = [f32p, f32p, ctypes.c_int, ctypes.c_int,
                                               f32p, f32p, f32p, ctypes.c_int]
            lib.pfpp_num_threads.restype = ctypes.c_int
            _lib = lib
        return _lib if _lib is not False else None


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def nn_distance_cpu(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[B, N, 3] x [B, M, 3] -> (sqdist [B, N], idx [B, N]). Native or numpy fallback."""
    x, y = _f32(x), _f32(y)
    B, N, _ = x.shape
    M = y.shape[1]
    lib = get_lib()
    if lib is not None:
        dist = np.empty((B, N), np.float32)
        idx = np.empty((B, N), np.int32)
        c = np.ctypeslib.as_ctypes
        lib.pfpp_nn_distance(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            B, N, M,
            dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        del c
        return dist, idx
    d = np.sum((x[:, :, None, :] - y[:, None, :, :]) ** 2, axis=-1)
    return d.min(-1).astype(np.float32), d.argmin(-1).astype(np.int32)


def fps_cpu(xyz: np.ndarray, npoint: int, mask: np.ndarray | None = None) -> np.ndarray:
    """Deterministic FPS [B, N, 3] -> [B, npoint] i32. Native or numpy fallback."""
    xyz = _f32(xyz)
    B, N, _ = xyz.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty((B, npoint), np.int32)
        m = None
        mp = ctypes.POINTER(ctypes.c_uint8)()
        if mask is not None:
            m = np.ascontiguousarray(mask, np.uint8)
            mp = m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        lib.pfpp_fps(
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), mp, B, N, npoint,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    # numpy fallback (same semantics as ops/fps.py farthest_point_sample_xla)
    if mask is None:
        mask = np.ones((B, N), bool)
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        dist = np.where(mask[b], 1e10, -1e10)
        cur = int(np.argmax(mask[b]))
        for s in range(npoint):
            out[b, s] = cur
            d = np.sum((xyz[b] - xyz[b, cur]) ** 2, axis=-1)
            d = np.where(mask[b], d, -1e10)
            dist = np.minimum(dist, d)
            cur = int(np.argmax(dist))
    return out


def augment_parts_cpu(
    pcs: np.ndarray, rots: np.ndarray, normalize: bool = True
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Recenter + rotate (+ max-abs normalize) all parts: [P, N, 3], [P, 3, 3] ->
    (out [P, N, 3], centroids [P, 3], scales [P])."""
    pcs, rots = _f32(pcs), _f32(rots)
    P, N, _ = pcs.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty_like(pcs)
        centroids = np.empty((P, 3), np.float32)
        scales = np.empty((P,), np.float32)
        lib.pfpp_augment_parts(
            pcs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            rots.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            P, N,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            centroids.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            1 if normalize else 0,
        )
        return out, centroids, scales
    centroids = pcs.mean(axis=1)
    centered = pcs - centroids[:, None, :]
    out = np.einsum("pij,pnj->pni", rots, centered)
    scales = np.maximum(np.abs(out).reshape(P, -1).max(-1), 1e-38)
    scales = np.where(scales == 0, 1.0, scales).astype(np.float32)
    if normalize:
        out = out / scales[:, None, None]
    return out.astype(np.float32), centroids.astype(np.float32), scales


def available() -> bool:
    return get_lib() is not None
