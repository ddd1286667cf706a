"""Native (C++) host data pipeline — ctypes binding and lazy build.

The reference outsources its host pixel work to cv2's C++ kernels and to
torch's C++ DataLoader worker machinery (SURVEY.md section 2.4). This package
is the framework's own native runtime piece: ``edt_native.cpp`` implements a
threaded JPEG-decode -> resize -> flip -> normalize -> pad batch pipeline
behind a plain C ABI, built on demand with g++ and loaded via ctypes (the
environment has no pybind11; ctypes keeps the binding dependency-free).

Public API:
    available() -> bool
    decode_resize_batch(paths, target, flips, mean, std, threads)
        -> (images (B,S,S,3) float32, scales (B,) float32, ok (B,) bool)
    image_dims(path) -> (w, h) or None
    decode_rgb(path) -> (H, W, 3) uint8 or None

Every entry point degrades gracefully: if the toolchain or libjpeg is
missing, ``available()`` is False and callers use the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "edt_native.cpp")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.environ.get("EDT_NATIVE_BUILD_DIR")
    if not d:
        d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def _build_and_load() -> Optional[ctypes.CDLL]:
    so_path = os.path.join(_build_dir(), "libedt_native.so")
    src_mtime = os.path.getmtime(_SRC)
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < src_mtime):
        cmd = [
            os.environ.get("CXX", "g++"), "-O3", "-std=c++17", "-shared",
            "-fPIC", "-pthread", "-o", so_path + ".tmp", _SRC, "-ljpeg",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so_path + ".tmp", so_path)
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    lib.edt_decode_resize_batch.restype = ctypes.c_int
    lib.edt_decode_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.edt_image_dims.restype = ctypes.c_int
    lib.edt_image_dims.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.edt_decode_rgb.restype = ctypes.c_int
    lib.edt_decode_rgb.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _TRIED:
            if os.environ.get("EDT_DISABLE_NATIVE"):
                _LIB = None
            else:
                _LIB = _build_and_load()
            _TRIED = True
    return _LIB


def available() -> bool:
    """True if the native pipeline built and loaded on this machine."""
    return _get_lib() is not None


def decode_resize_batch(
    paths: Sequence[str], target: int,
    flips: Optional[Sequence[bool]] = None,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
    threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused decode+resize+flip+normalize+pad for a batch of JPEG paths.

    Returns (images, scales, ok). images is (B, target, target, 3) float32;
    ok[i] False means image i failed natively (caller should produce it via
    the Python path — its slot is zeroed, scale 1.0).
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native pipeline unavailable")
    n = len(paths)
    images = np.empty((n, target, target, 3), dtype=np.float32)
    scales = np.empty((n,), dtype=np.float32)
    ok = np.empty((n,), dtype=np.uint8)
    flips_arr = np.zeros((n,), dtype=np.uint8)
    if flips is not None:
        flips_arr[:] = np.asarray(flips, dtype=np.uint8)
    mean_arr = np.ascontiguousarray(mean, dtype=np.float32)
    std_arr = np.ascontiguousarray(std, dtype=np.float32)
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths])
    if threads <= 0:
        threads = min(n, os.cpu_count() or 1)
    lib.edt_decode_resize_batch(
        c_paths, n, target,
        flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scales.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        threads)
    return images, scales, ok.astype(bool)


def image_dims(path: str) -> Optional[Tuple[int, int]]:
    """(width, height) from the JPEG header, or None."""
    lib = _get_lib()
    if lib is None:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if lib.edt_image_dims(os.fsencode(path), ctypes.byref(w),
                          ctypes.byref(h)):
        return w.value, h.value
    return None


def decode_rgb(path: str) -> Optional[np.ndarray]:
    """Full-resolution RGB uint8 decode (parity testing), or None."""
    lib = _get_lib()
    if lib is None:
        return None
    dims = image_dims(path)
    if dims is None:
        return None
    w, h = dims
    out = np.empty((h, w, 3), dtype=np.uint8)
    if not lib.edt_decode_rgb(
            os.fsencode(path),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size):
        return None
    return out
