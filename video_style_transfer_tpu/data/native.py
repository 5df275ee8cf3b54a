"""ctypes bindings for the native preprocessing library (native/).

Builds on demand with the repo Makefile; every entry point has a numpy
fallback so the package works without a toolchain. The fused
preprocess_frames_bgr path replaces the per-frame cv2 + numpy chain in
the video loader (reference animatediff/video_dataset.py:96-132).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libvst_preprocess.so")

_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.u8_to_unit_range.argtypes = [u8p, f32p, ctypes.c_int64]
    lib.resize_bilinear_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                       ctypes.c_int, u8p, ctypes.c_int,
                                       ctypes.c_int]
    lib.preprocess_frames_bgr.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p, f32p,
        ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def u8_to_unit_range(frames: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1]."""
    frames = np.ascontiguousarray(frames, np.uint8)
    lib = _load()
    if lib is None:
        return frames.astype(np.float32) / 127.5 - 1.0
    out = np.empty(frames.shape, np.float32)
    lib.u8_to_unit_range(_u8p(frames), _f32p(out), frames.size)
    return out


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """(H, W, C) uint8 -> (dh, dw, C) uint8, half-pixel-center bilinear."""
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    if lib is None:
        # numpy fallback: vectorized bilinear, same convention
        sh, sw, c = img.shape
        fy = (np.arange(dh) + 0.5) * (sh / dh) - 0.5
        fx = (np.arange(dw) + 0.5) * (sw / dw) - 0.5
        y0 = np.floor(fy).astype(int)
        x0 = np.floor(fx).astype(int)
        wy = (fy - y0)[:, None, None]
        wx = (fx - x0)[None, :, None]
        y0c, y1c = np.clip(y0, 0, sh - 1), np.clip(y0 + 1, 0, sh - 1)
        x0c, x1c = np.clip(x0, 0, sw - 1), np.clip(x0 + 1, 0, sw - 1)
        imgf = img.astype(np.float32)
        v = ((1 - wy) * ((1 - wx) * imgf[y0c][:, x0c]
                         + wx * imgf[y0c][:, x1c])
             + wy * ((1 - wx) * imgf[y1c][:, x0c]
                     + wx * imgf[y1c][:, x1c]))
        return np.clip(np.round(v), 0, 255).astype(np.uint8)
    sh, sw, c = img.shape
    out = np.empty((dh, dw, c), np.uint8)
    lib.resize_bilinear_u8(_u8p(img), sh, sw, c, _u8p(out), dh, dw)
    return out


def preprocess_frames_bgr(frames: np.ndarray, dh: int,
                          dw: int) -> np.ndarray:
    """(F, H, W, 3) uint8 BGR -> (F, dh, dw, 3) float32 RGB in [-1, 1] —
    the fused video-loader pipeline."""
    frames = np.ascontiguousarray(frames, np.uint8)
    f, sh, sw, _ = frames.shape
    lib = _load()
    if lib is None:
        out = np.empty((f, dh, dw, 3), np.float32)
        for i in range(f):
            r = resize_bilinear(frames[i], dh, dw).astype(np.float32)
            out[i] = r[..., ::-1] / 127.5 - 1.0
        return out
    scratch = np.empty((f, dh, dw, 3), np.uint8)
    out = np.empty((f, dh, dw, 3), np.float32)
    lib.preprocess_frames_bgr(_u8p(frames), f, sh, sw, _u8p(scratch),
                              _f32p(out), dh, dw)
    return out
