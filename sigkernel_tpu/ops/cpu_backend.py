"""ctypes bindings for the native C++ OpenMP CPU solver.

The compiled library is optional: :func:`available` reports whether it was
built (``python setup.py build_native`` or ``make native``); callers fall
back to the JAX scan solver otherwise. Under ``jit`` the native solver is
reachable through :func:`solve_grid_callback` (``jax.pure_callback``), which
is worthwhile on CPU hosts and used by tests as an independent oracle.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "csrc", "libsigsolver.so")

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i64 = ctypes.c_int64
    lib.sig_solve_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        i64, i64, i64, ctypes.c_int]
    lib.sig_solve_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        i64, i64, i64, ctypes.c_int]
    lib.sig_solve_derivatives_f64.argtypes = [
        ctypes.POINTER(ctypes.c_double)] * 6 + [i64, i64, i64]
    lib.sig_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return lib.sig_num_threads() if lib else 0


def solve_grid_np(inc: np.ndarray, naive: bool = False) -> np.ndarray:
    """``(..., MM, NN)`` increments -> ``(..., MM+1, NN+1)`` solution grids."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native solver not built; run `python setup.py build_native`")
    inc = np.ascontiguousarray(inc)
    batch_shape = inc.shape[:-2]
    MM, NN = inc.shape[-2:]
    B = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    flat = inc.reshape(B, MM, NN)
    if flat.dtype == np.float64:
        out = np.empty((B, MM + 1, NN + 1), np.float64)
        lib.sig_solve_f64(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            B, MM, NN, int(naive))
    elif flat.dtype == np.float32:
        out = np.empty((B, MM + 1, NN + 1), np.float32)
        lib.sig_solve_f32(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            B, MM, NN, int(naive))
    else:
        raise TypeError(f"unsupported dtype {flat.dtype}")
    return out.reshape(batch_shape + (MM + 1, NN + 1))


def solve_final_np(inc: np.ndarray, naive: bool = False) -> np.ndarray:
    return solve_grid_np(inc, naive)[..., -1, -1]


def solve_derivatives_final_np(inc, inc_d, inc_dd) -> tuple:
    """Fused triple solve; returns final ``(K, K_diff, K_diffdiff)``."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native solver not built; run `python setup.py build_native`")
    inc = np.ascontiguousarray(inc, np.float64)
    inc_d = np.ascontiguousarray(inc_d, np.float64)
    inc_dd = np.ascontiguousarray(inc_dd, np.float64)
    batch_shape = inc.shape[:-2]
    MM, NN = inc.shape[-2:]
    B = int(np.prod(batch_shape, dtype=np.int64)) if batch_shape else 1
    outs = [np.empty((B,), np.float64) for _ in range(3)]
    p = ctypes.POINTER(ctypes.c_double)
    lib.sig_solve_derivatives_f64(
        inc.reshape(B, MM, NN).ctypes.data_as(p),
        inc_d.reshape(B, MM, NN).ctypes.data_as(p),
        inc_dd.reshape(B, MM, NN).ctypes.data_as(p),
        outs[0].ctypes.data_as(p), outs[1].ctypes.data_as(p),
        outs[2].ctypes.data_as(p), B, MM, NN)
    return tuple(o.reshape(batch_shape) for o in outs)


def solve_grid_callback(inc, naive: bool = False):
    """jit-compatible wrapper via ``jax.pure_callback`` (host round-trip)."""
    import jax
    import jax.numpy as jnp

    shape = inc.shape[:-2] + (inc.shape[-2] + 1, inc.shape[-1] + 1)
    return jax.pure_callback(
        lambda x: solve_grid_np(np.asarray(x), naive),
        jax.ShapeDtypeStruct(shape, inc.dtype), inc, vmap_method="broadcast_all")
