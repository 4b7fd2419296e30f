"""ctypes bindings for the native preprocessing library.

Builds lazily with `make` on first use if the .so is missing; all entry points fall
back to the pure-Python/PIL implementations in data/mm_utils.py when the toolchain
or library is unavailable, so the framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libvisper_preprocess.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False

BILINEAR = 0
BICUBIC = 1


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _HERE], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    lib.visper_resize_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.visper_expand2square.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def resize_normalize(
    image: np.ndarray,              # uint8 (H, W, 3)
    size: int | tuple,
    mean: Sequence[float],
    std: Sequence[float],
    mode: int = BICUBIC,
    out: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Fused resize+normalize; returns None when the native lib is unavailable.

    `out`: optional preallocated C-contiguous f32 (dh, dw, 3) destination —
    e.g. one row of a batch slab — skips the per-image alloc + the stack copy
    downstream (the 768^2 seg path moves 7 MB/image)."""
    lib = _load()
    if lib is None:
        return None
    if isinstance(size, int):
        size = (size, size)
    dh, dw = size
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, c = image.shape
    if out is None:
        out = np.empty((dh, dw, c), dtype=np.float32)
    else:
        assert out.shape == (dh, dw, c) and out.dtype == np.float32
        assert out.flags["C_CONTIGUOUS"]
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    lib.visper_resize_normalize(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dh, dw,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mode,
    )
    return out


def expand2square(image: np.ndarray, fill: Sequence[int]) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, c = image.shape
    side = max(h, w)
    out = np.empty((side, side, c), dtype=np.uint8)
    fill_a = np.asarray(fill, np.uint8)
    lib.visper_expand2square(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        fill_a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
