"""Native host-runtime ops: build-at-import C++ (mirrors the reference's
JIT-compiled extension pattern, song_sde/op/upfirdn2d.py:10-16) with a
pure-Python fallback. Multithreaded batch PNG encoding AND decoding for
the 50k-sample eval paths (sample writing; FID / pixel-stats input)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_CACHE = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "psld_tpu_native",
)
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build() -> str:
    os.makedirs(_CACHE, exist_ok=True)
    src = os.path.join(_HERE, "pngio.cpp")
    out = os.path.join(_CACHE, "libpsldio.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        tmp = out + ".tmp"
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", tmp, "-lz"],
            check=True, capture_output=True,
        )
        os.replace(tmp, out)
    return out


def _get_lib():
    global _LIB, _BUILD_FAILED
    if _LIB is not None:
        return _LIB
    if _BUILD_FAILED:
        raise RuntimeError("native build failed earlier")
    with _LOCK:
        if _LIB is not None:
            return _LIB
        try:
            lib = ctypes.CDLL(_build())
        except Exception:
            _BUILD_FAILED = True
            raise
        lib.psld_write_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.psld_write_png.restype = ctypes.c_int
        lib.psld_write_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.psld_write_png_batch.restype = ctypes.c_int
        lib.psld_read_png_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.psld_read_png_info.restype = ctypes.c_int
        lib.psld_read_png.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.psld_read_png.restype = ctypes.c_int
        lib.psld_read_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.psld_read_png_batch.restype = ctypes.c_int
        _LIB = lib
    return _LIB


class UnsupportedPng(ValueError):
    """Valid PNG using a variant the native decoder skips (16-bit,
    interlaced, transparency chunks) -- callers fall back to PIL."""


def _check_read(rc: int, path: str) -> None:
    if rc == 0:
        return
    if rc == -5:
        raise UnsupportedPng(path)
    if rc == -6:
        raise ValueError(f"png shape mismatch: {path}")
    raise OSError(f"native png read failed ({rc}): {path}")


def read_png_info(path: str) -> tuple[int, int, int]:
    """(h, w, c) of the decoded image (palette reports 3 channels)."""
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = _get_lib().psld_read_png_info(
        path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    _check_read(rc, path)
    return h.value, w.value, c.value


def read_png(path: str) -> np.ndarray:
    """Decode one 8-bit non-interlaced PNG to an HWC uint8 array."""
    h, w, c = read_png_info(path)
    out = np.empty((h, w, c), np.uint8)
    rc = _get_lib().psld_read_png(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c)
    _check_read(rc, path)
    return out


def read_png_batch(paths: list[str], h: int, w: int, c: int,
                   threads: int = 0) -> np.ndarray:
    """Decode same-shaped PNGs into an NHWC uint8 batch in parallel."""
    n = len(paths)
    out = np.empty((n, h, w, c), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = _get_lib().psld_read_png_batch(
        arr, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c, threads)
    _check_read(rc, paths[0] if paths else "<empty>")
    return out


def write_png(path: str, img: np.ndarray) -> None:
    """Write one HWC (or HW) uint8 image as PNG."""
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    rc = _get_lib().psld_write_png(
        path.encode(), img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, c)
    if rc != 0:
        raise OSError(f"native png write failed ({rc}): {path}")


def write_png_batch(batch: np.ndarray, file_prefix: str,
                    threads: int = 0) -> None:
    """Write an NHWC uint8 batch as ``<file_prefix>_<i>.png`` in parallel."""
    batch = np.ascontiguousarray(batch, np.uint8)
    if batch.ndim == 3:
        batch = batch[..., None]
    n, h, w, c = batch.shape
    paths = [f"{file_prefix}_{i}.png".encode() for i in range(n)]
    arr = (ctypes.c_char_p * n)(*paths)
    rc = _get_lib().psld_write_png_batch(
        arr, batch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c, threads)
    if rc != 0:
        raise OSError(f"native batch png write failed ({rc})")
