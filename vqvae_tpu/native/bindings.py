"""ctypes bindings for the native audio library (native/audio.cpp).

Builds ``_vqa_audio.so`` with g++ on first use (cached next to the
source; rebuilt when the source is newer).  Callers degrade gracefully:
``available()`` is False when no compiler is present, and
audio/wav_io.py falls back to scipy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "audio.cpp")
_SO = os.path.join(_HERE, "_vqa_audio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                if not _build():
                    _failed = True
                    return None
            lib = ctypes.CDLL(_SO)
            lib.vqa_load_wav.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.vqa_load_wav.restype = ctypes.c_int
            lib.vqa_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            lib.vqa_mulaw_encode.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.vqa_mulaw_encode_mode.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32),
            ]
            _lib = lib
        except Exception:
            _failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Decode to (mono float32 in [-1,1], file sample rate)."""
    lib = _load()
    if lib is None:
        raise ImportError("native audio library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.vqa_load_wav(path.encode(), ctypes.byref(out),
                          ctypes.byref(n), ctypes.byref(sr))
    if rc != 0:
        raise ValueError(f"native wav decode failed (code {rc}): {path}")
    try:
        wav = np.ctypeslib.as_array(out, shape=(n.value,)).copy()
    finally:
        lib.vqa_free(out)
    return wav, sr.value


def mulaw_encode(x: np.ndarray, mu: int = 256,
                 mode: str = "round") -> np.ndarray:
    """Host-side mu-law ids (bit-identical to audio/mu_law.py in the
    matching ``mode`` — "round" or the reference's "chainer"
    digitize-parity binning)."""
    lib = _load()
    if lib is None:
        raise ImportError("native audio library unavailable")
    mode_id = {"round": 0, "chainer": 1}[mode]
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.int32)
    lib.vqa_mulaw_encode_mode(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size, mu, mode_id,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
