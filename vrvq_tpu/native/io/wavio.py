"""ctypes bindings for the native C++ WAV reader (libvrvqio.so).

Built by ``make -C vrvq_tpu/native/io``. Optional: data/audio_io.py falls
back to the numpy parser when the shared library is missing. The native
reader exists for bulk training-data decoding throughput (many small random
excerpts per second across dataloader workers).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = Path(__file__).parent / "libvrvqio.so"
    if so.exists():
        try:
            lib = ctypes.CDLL(str(so))
            lib.vrvqio_read_wav.restype = ctypes.c_int
            lib.vrvqio_read_wav.argtypes = [
                ctypes.c_char_p,      # path
                ctypes.c_double,      # offset seconds
                ctypes.c_double,      # duration seconds (<0 => all)
                ctypes.POINTER(ctypes.c_float),  # out buffer (C*T)
                ctypes.c_long,        # out buffer capacity (floats)
                ctypes.POINTER(ctypes.c_int),    # out sample_rate
                ctypes.POINTER(ctypes.c_int),    # out channels
                ctypes.POINTER(ctypes.c_long),   # out frames
            ]
            lib.vrvqio_loudness.restype = ctypes.c_double
            lib.vrvqio_loudness.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ]
            lib.vrvqio_wav_info.restype = ctypes.c_int
            lib.vrvqio_wav_info.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_long),
            ]
            if hasattr(lib, "vrvqio_read_flac"):
                lib.vrvqio_read_flac.restype = ctypes.c_int
                lib.vrvqio_read_flac.argtypes = list(lib.vrvqio_read_wav.argtypes)
                lib.vrvqio_flac_info.restype = ctypes.c_int
                lib.vrvqio_flac_info.argtypes = list(lib.vrvqio_wav_info.argtypes)
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def read_wav(path: str, offset: float = 0.0,
             duration: Optional[float] = None) -> Optional[Tuple[np.ndarray, int]]:
    lib = _load()
    if lib is None:
        return None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    frames = ctypes.c_long()
    if lib.vrvqio_wav_info(path.encode(), ctypes.byref(sr),
                           ctypes.byref(ch), ctypes.byref(frames)) != 0:
        return None
    want = frames.value if duration is None else int(round(duration * sr.value))
    cap = max(want * ch.value, 1)
    buf = np.empty(cap, dtype=np.float32)
    rc = lib.vrvqio_read_wav(
        path.encode(), float(offset),
        -1.0 if duration is None else float(duration),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(frames),
    )
    if rc != 0:
        return None
    t = frames.value
    data = buf[: t * ch.value].reshape(t, ch.value).T.copy()
    return data, sr.value


def loudness(audio, sample_rate: int, block_size: float = 0.4):
    """BS.1770 integrated loudness via the native lib; audio (C, T) float32.
    Returns LUFS float or None if the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    a = np.ascontiguousarray(np.asarray(audio, np.float32).T)  # (T, C)
    t, c = a.shape
    val = lib.vrvqio_loudness(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t, c, int(sample_rate), float(block_size),
    )
    if val <= -1e8:
        return float("-inf")
    return float(val)


def read_flac(path: str, offset: float = 0.0,
              duration: Optional[float] = None) -> Optional[Tuple[np.ndarray, int]]:
    """Native FLAC decode -> ((C, T) float32, sr), or None when the lib is
    missing/old or the decode fails (caller falls back to flac_py)."""
    lib = _load()
    if lib is None or not hasattr(lib, "vrvqio_read_flac"):
        return None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    frames = ctypes.c_long()
    if lib.vrvqio_flac_info(path.encode(), ctypes.byref(sr),
                            ctypes.byref(ch), ctypes.byref(frames)) != 0:
        return None
    want = frames.value if duration is None else int(round(duration * sr.value))
    cap = max(want * ch.value, 1)
    buf = np.empty(cap, dtype=np.float32)
    rc = lib.vrvqio_read_flac(
        path.encode(), float(offset),
        -1.0 if duration is None else float(duration),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
        ctypes.byref(sr), ctypes.byref(ch), ctypes.byref(frames),
    )
    if rc != 0:
        return None
    t = frames.value
    data = buf[: t * ch.value].reshape(t, ch.value).T.copy()
    return data, sr.value
