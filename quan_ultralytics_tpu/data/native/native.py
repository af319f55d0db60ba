"""ctypes bindings + on-demand build of the native preprocessing library.

Builds `libquanprep.so` with g++ on first use (cached beside the source);
falls back to the cv2/NumPy path transparently if no toolchain is present.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libquanprep.so"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = _DIR / "preprocess.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(src), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.letterbox_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_uint8,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _load() is not None


def letterbox_native(im: np.ndarray, size: int, pad_value: int = 114
                     ) -> Optional[Tuple[np.ndarray, float, Tuple[int, int]]]:
    """Fused letterbox+normalize: u8 HWC -> f32 [size,size,3] in [0,1].

    Returns None when the native lib is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    im = np.ascontiguousarray(im, dtype=np.uint8)
    h, w = im.shape[:2]
    out = np.empty((size, size, 3), np.float32)
    gain = ctypes.c_float()
    px, py = ctypes.c_int(), ctypes.c_int()
    lib.letterbox_normalize(
        im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size,
        ctypes.c_uint8(pad_value), ctypes.byref(gain),
        ctypes.byref(px), ctypes.byref(py),
    )
    return out, float(gain.value), (int(px.value), int(py.value))
