"""ctypes binding for the in-repo C++ QR decoder (native/qrdecode.cpp).

Replaces the reference's Java-subprocess + temp-file ZXing round trip
(app_camera.py:464, 531-537) with an in-process call on a raw grayscale
buffer. Builds the shared library on first use when a compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libqrdecode.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.qr_decode_gray.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_char_p,
                ctypes.c_int,
            ]
            lib.qr_decode_gray.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _load_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def decode(image) -> List[str]:
    """Decode all QR codes in an image (RGB/gray ndarray or PIL.Image)."""
    lib = _load()
    if lib is None:
        return []
    arr = np.asarray(image.convert("L") if hasattr(image, "convert") else image)
    if arr.ndim == 3:
        arr = (
            0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
        ).astype(np.uint8)
    arr = np.ascontiguousarray(arr, np.uint8)
    h, w = arr.shape
    buf = ctypes.create_string_buffer(1 << 16)
    n = lib.qr_decode_gray(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        w,
        buf,
        len(buf),
    )
    out: List[str] = []
    raw = buf.raw
    pos = 0
    for _ in range(max(0, n)):
        end = raw.find(b"\0", pos)
        if end < 0:
            break
        out.append(raw[pos:end].decode("utf-8", errors="ignore"))
        pos = end + 1
    return out
