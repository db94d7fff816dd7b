"""ctypes binding for the native frame loader (runtime_native/frame_loader.cpp).

The C++ library decodes PNG/JPEG batches with a persistent worker pool straight
into a contiguous uint8 buffer (one host->HBM transfer per batch), replacing
the reference's GIL-bound per-image cv2.imread generator
(raite_loader.py:129-153). Falls back gracefully when the .so has not been
built — build it with:

    make -C runtime_native        # or: python -m trustedai_cl_vae_ad_tpu.data.native --build
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "runtime_native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libframeloader.so")

_lib = None
_pool = None


def build_native(quiet: bool = False) -> bool:
    """Compile the shared library in-tree. Returns True on success."""
    try:
        result = subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            capture_output=True,
            text=True,
            timeout=120,
        )
        if result.returncode != 0 and not quiet:
            print(result.stdout)
            print(result.stderr)
        return result.returncode == 0
    except Exception as e:
        if not quiet:
            print(f"native build failed: {e}")
        return False


def _stale() -> bool:
    """Is the built .so older than its sources? (The .so is gitignored and
    built in-tree; without this check an edit to frame_loader.cpp would
    silently keep running the previous binary.)"""
    try:
        so_mtime = os.path.getmtime(_SO_PATH)
        return any(
            os.path.getmtime(os.path.join(_NATIVE_DIR, src)) > so_mtime
            for src in ("frame_loader.cpp", "Makefile")
            if os.path.exists(os.path.join(_NATIVE_DIR, src))
        )
    except OSError:
        return False


def _load(auto_build: bool = True):
    global _lib, _pool
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) or _stale():
        if not (auto_build and build_native(quiet=True)) and not os.path.exists(_SO_PATH):
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.fl_pool_create.restype = ctypes.c_void_p
    lib.fl_pool_create.argtypes = [ctypes.c_int]
    lib.fl_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.fl_decode_png.restype = ctypes.c_int
    lib.fl_decode_png.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.fl_png_dims.restype = ctypes.c_int
    lib.fl_png_dims.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.fl_decode_batch.restype = ctypes.c_int
    lib.fl_decode_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    _lib = lib
    _pool = lib.fl_pool_create(0)  # hardware_concurrency
    return _lib


def available() -> bool:
    return _load() is not None


def decode_png(path: str, max_pixels: int = 64 * 1024 * 1024) -> Optional[np.ndarray]:
    """Decode one PNG/JPEG to RGB8 (native; format sniffed). None on failure.

    A header-only IHDR probe supplies the dimensions, then exactly
    w*h*3 bytes are allocated — no oversized scratch per decode. Dims beyond
    ``max_pixels`` (or a corrupt header) return None rather than letting a
    hostile IHDR drive a giant allocation (192 MB cap keeps w*h*3 < 2^31,
    which the C out_cap int also requires).
    """
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    if lib.fl_png_dims(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    if w.value <= 0 or h.value <= 0 or w.value * h.value > max_pixels:
        return None
    buf = np.empty(h.value * w.value * 3, np.uint8)
    rc = lib.fl_decode_png(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        buf.size,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        return None
    return buf.reshape(h.value, w.value, 3)


def decode_batch(
    paths: List[str], frame_hw: Tuple[int, int]
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode a list of PNG/JPEG files into one (N, H, W, 3) uint8 buffer in parallel.

    Returns (batch, ok_mask) or None when the native library is unavailable.
    Frames whose native size differs from frame_hw are nearest-resized by the
    native code (device-side antialias resize is the quality path).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    h, w = frame_hw
    out = np.empty((n, h, w, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.fl_decode_batch(
        ctypes.c_void_p(_pool),
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h,
        w,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out, ok.astype(bool)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--build", action="store_true", help="Compile the native library")
    args = parser.parse_args()
    if args.build:
        ok = build_native()
        print("built" if ok else "build FAILED")
        raise SystemExit(0 if ok else 1)
    print(f"native available: {available()}")
