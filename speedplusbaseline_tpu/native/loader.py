"""ctypes binding for the native decode/crop/resize core (speedloader.cpp).

The C call releases the GIL, so the Python-side thread pool in
data/loader.py scales across host cores without worker processes. Falls back
gracefully (``native_available() == False``) when the .so is not built;
build it with ``make -C speedplusbaseline_tpu/native``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "libspeedloader.so")
_lib = None


def _build():
    """Build the .so on demand (it is a build artifact, not committed — a
    fresh container would otherwise silently lose the native path, e.g.
    BENCH host_native fields coming back null)."""
    import subprocess

    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.decode_crop_resize_file.argtypes = [
        ctypes.c_char_p, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.decode_crop_resize_file.restype = ctypes.c_int
    lib.image_size_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.image_size_file.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def image_size(path: str) -> Tuple[int, int]:
    """(width, height) from the JPEG header without decoding."""
    lib = _load()
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.image_size_file(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"image_size_file({path}) failed: {rc}")
    return w.value, h.value


def decode_crop_resize(path: str, crop_box, out_hw: Tuple[int, int]) -> np.ndarray:
    """Fused decode + crop + bilinear resize -> (H, W, 3) uint8 RGB.

    uint8 keeps the host->device copy 4x smaller than float32; the [0,1]
    normalization runs on-device (engine/steps.py _images_to_float).
    crop_box: (xmin, ymin, width, height) in original pixels, or None for the
    full frame. Uses libjpeg DCT-domain downscaling when the crop is much
    larger than the output.
    """
    lib = _load()
    h, w = out_hw
    out = np.empty((h, w, 3), dtype=np.uint8)
    if crop_box is None:
        xmin = ymin = cw = ch = -1.0
    else:
        xmin, ymin, cw, ch = [float(v) for v in crop_box]
    rc = lib.decode_crop_resize_file(
        path.encode(), xmin, ymin, cw, ch, w, h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"decode_crop_resize_file({path}) failed: {rc}")
    return out
