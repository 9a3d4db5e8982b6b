"""MP4/M4A (AAC — and anything else FFmpeg demuxes) decoding via the
native libvrvqff.so shim (vrvq_tpu/native/io/ffdecode.cc), which links
the system libavformat/libavcodec/libswresample.

Completes the reference's audiotools AUDIO_EXTENSIONS coverage
(reference data/loaders.py:24: wav/flac/mp3/mp4): wav+flac decode
from scratch in this repo, mp3 binds libmpg123 (data/mpeg.py), and this
module covers the general-container tail. Optional: when the shim isn't
built (``make -C vrvq_tpu/native/io``) or the FFmpeg runtime is absent,
``read_ffmpeg``/``ffmpeg_info`` raise ``UnsupportedFormatError`` and the
loaders apply their standard warn-once fault tolerance.
"""

from __future__ import annotations

import ctypes
import dataclasses
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


class FfmpegDecodeError(ValueError):
    """libvrvqff failed to open/decode the bitstream."""


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = Path(__file__).resolve().parents[1] / "native" / "io" / "libvrvqff.so"
        if not so.exists():
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:  # shim built but FFmpeg runtime missing
            return None
        c = ctypes
        lib.vrvqff_audio_info.restype = c.c_int
        lib.vrvqff_audio_info.argtypes = [
            c.c_char_p, c.POINTER(c.c_int), c.POINTER(c.c_int),
            c.POINTER(c.c_long),
        ]
        lib.vrvqff_read_audio.restype = c.c_long
        lib.vrvqff_read_audio.argtypes = [
            c.c_char_p, c.c_double, c.c_double, c.POINTER(c.c_float),
            c.c_long, c.POINTER(c.c_int), c.POINTER(c.c_int),
        ]
        lib.vrvqff_encode_aac.restype = c.c_int
        lib.vrvqff_encode_aac.argtypes = [
            c.c_char_p, c.POINTER(c.c_float), c.c_long, c.c_int, c.c_int,
            c.c_int,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    """True when libvrvqff.so (and its FFmpeg runtime) loaded."""
    return _load() is not None


def _require_lib():
    lib = _load()
    if lib is None:
        from .audio_io import UnsupportedFormatError

        raise UnsupportedFormatError(
            "mp4/AAC decode needs the native FFmpeg shim: build it with "
            "`make -C vrvq_tpu/native/io` (requires libavformat/libavcodec "
            "dev headers), or convert the corpus to wav/flac/mp3"
        )
    return lib


@dataclasses.dataclass
class FfmpegInfo:
    sample_rate: int
    num_channels: int
    num_frames: int  # container metadata; -1 when the container omits it

    @property
    def duration(self) -> float:
        return max(self.num_frames, 0) / self.sample_rate


def ffmpeg_info(path) -> FfmpegInfo:
    """Container-level stream info; demuxes headers, decodes nothing."""
    lib = _require_lib()
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    frames = ctypes.c_long(0)
    if lib.vrvqff_audio_info(str(path).encode(), ctypes.byref(sr),
                             ctypes.byref(ch), ctypes.byref(frames)) != 0:
        raise FfmpegDecodeError(f"cannot open audio stream: {path}")
    return FfmpegInfo(sr.value, ch.value, int(frames.value))


def read_ffmpeg(
    path,
    offset: float = 0.0,
    duration: Optional[float] = None,
) -> Tuple[np.ndarray, int]:
    """Decode any FFmpeg-supported file -> ((C, T) float32, sample_rate).

    ``offset``/``duration`` are seconds; the shim decodes sequentially
    and discards to the exact sample, so a windowed read equals the same
    slice of a full decode bit-for-bit (AAC decodes far above realtime;
    the discard costs tens of ms at song-length offsets).
    """
    lib = _require_lib()
    info = ffmpeg_info(path)
    if duration is not None:
        cap_frames = int(round(duration * info.sample_rate)) + 1
    elif info.num_frames >= 0:
        # container metadata can undercount (priming/edit lists): pad
        cap_frames = info.num_frames + info.sample_rate
    else:
        cap_frames = 3600 * info.sample_rate  # unknown length: 1 h cap
    buf = np.empty(cap_frames * info.num_channels, np.float32)
    sr = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    got = lib.vrvqff_read_audio(
        str(path).encode(), float(offset),
        -1.0 if duration is None else float(duration),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size,
        ctypes.byref(sr), ctypes.byref(ch),
    )
    if got < 0:
        raise FfmpegDecodeError(f"decode failed (rc={got}): {path}")
    data = buf[: got * ch.value].reshape(-1, ch.value).T
    return np.ascontiguousarray(data), sr.value


def encode_aac(path, audio: np.ndarray, sample_rate: int,
               bitrate: int = 192000) -> None:
    """Test-fixture encoder: (C, T) float32 -> AAC in .mp4/.m4a."""
    lib = _require_lib()
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    inter = np.ascontiguousarray(audio.T).reshape(-1)
    rc = lib.vrvqff_encode_aac(
        str(path).encode(),
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        audio.shape[1], audio.shape[0], sample_rate, bitrate,
    )
    if rc != 0:
        raise FfmpegDecodeError(f"AAC encode failed (rc={rc}): {path}")
