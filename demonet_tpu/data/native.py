"""ctypes bindings to the native data-loader core (cpp/imageio.cc).

The reference's input pipeline leans on native code through DataLoader
worker processes + compiled image libraries (train.py:137-144). Here the
native core is explicit: libdemonet_imageio.so does JPEG decode + bilinear
resize + float conversion with a thread pool, and the Python loader calls it
for whole batches (one ctypes call per batch, zero per-image Python
overhead). Falls back to PIL/cv2 transparently when the library isn't built.

Build: cmake -S cpp -B cpp/build && cmake --build cpp/build
(the .so lands next to this file).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_SEARCHED = False


def _find_library() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    here = os.path.dirname(__file__)
    candidates = [
        os.path.join(here, "libdemonet_imageio.so"),
        os.path.join(here, "..", "..", "cpp", "build",
                     "libdemonet_imageio.so"),
    ]
    for path in candidates:
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            lib.demonet_decode_jpeg_resize.restype = ctypes.c_int
            lib.demonet_decode_jpeg_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)]
            lib.demonet_decode_jpeg_batch.restype = ctypes.c_int
            lib.demonet_decode_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_library() is not None


def decode_jpeg_resize(data: bytes, out_h: int, out_w: int
                       ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """One JPEG -> (float32 (out_h, out_w, 3) in [0,1], (orig_h, orig_w))."""
    lib = _find_library()
    if lib is None:
        raise RuntimeError("libdemonet_imageio.so not built")
    out = np.empty((out_h, out_w, 3), np.float32)
    hw = (ctypes.c_int * 2)()
    rc = lib.demonet_decode_jpeg_resize(
        data, len(data), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), hw)
    if rc != 0:
        raise ValueError("JPEG decode failed")
    return out, (hw[0], hw[1])


def decode_jpeg_batch(blobs: List[bytes], out_h: int, out_w: int,
                      num_threads: int = 4
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Batch decode+resize: returns (images (N, H, W, 3) f32,
    original sizes (N, 2) int32). Raises on any decode failure."""
    lib = _find_library()
    if lib is None:
        raise RuntimeError("libdemonet_imageio.so not built")
    n = len(blobs)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    hw = np.empty((n, 2), np.int32)
    arr_t = ctypes.c_char_p * n
    data = arr_t(*blobs)
    sizes = (ctypes.c_int64 * n)(*[len(b) for b in blobs])
    rc = lib.demonet_decode_jpeg_batch(
        data, sizes, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads)
    if rc != 0:
        raise ValueError(f"{rc} JPEG decodes failed")
    return out, hw
