"""ctypes bindings for the C++ data-path kernels (native/pbe_native.cpp).

Auto-builds the shared library on first import if a toolchain is present;
every entry point has a pure-numpy fallback so the package works without it.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libpbe_native.so"
_lib: ctypes.CDLL | None = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    dptr = ctypes.POINTER(ctypes.c_double)
    u8ptr = ctypes.POINTER(ctypes.c_uint8)
    iptr = ctypes.POINTER(ctypes.c_int)
    lib.pbe_bezier_eval.argtypes = [dptr, ctypes.c_int, ctypes.c_int, dptr]
    lib.pbe_fill_polygon.argtypes = [dptr, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, u8ptr]
    lib.pbe_mask_bbox.argtypes = [u8ptr, ctypes.c_int, ctypes.c_int, iptr]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def bezier_eval(ctrl: np.ndarray, n: int) -> np.ndarray | None:
    """(K,2) control points -> (n,2) curve, or None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    ctrl = np.ascontiguousarray(ctrl, np.float64)
    out = np.empty((n, 2), np.float64)
    lib.pbe_bezier_eval(
        ctrl.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctrl.shape[0] - 1, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def fill_polygon(poly_xy: np.ndarray, h: int, w: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    poly = np.ascontiguousarray(poly_xy, np.float64)
    out = np.zeros((h, w), np.uint8)
    lib.pbe_fill_polygon(
        poly.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        poly.shape[0], h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def mask_bbox(mask01: np.ndarray) -> tuple[int, int, int, int] | None:
    """Returns (x1,y1,x2,y2), None for empty mask, or raises if unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    m = np.ascontiguousarray((mask01 > 0.5).astype(np.uint8))
    out = np.empty(4, np.int32)
    lib.pbe_mask_bbox(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if out[0] < 0:
        return None
    return int(out[0]), int(out[1]), int(out[2]), int(out[3])
