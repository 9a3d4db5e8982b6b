"""Test-only MP3 *encoder* via the system ``libmp3lame`` (ctypes).

Counterpart of tests/flac_encoder.py: the decode tests need real MP3
bitstreams to feed vrvq_tpu.data.mpeg, and this container has no ffmpeg
— but it does ship liblame. Never imported by library code.
"""

import ctypes
import ctypes.util

import numpy as np


def _load_lame():
    name = ctypes.util.find_library("mp3lame")
    for cand in ([name] if name else []) + ["libmp3lame.so.0", "libmp3lame.so"]:
        if not cand:
            continue
        try:
            return ctypes.CDLL(cand)
        except OSError:
            continue
    return None


def lame_available() -> bool:
    lib = _load_lame()
    return lib is not None and hasattr(lib, "lame_encode_buffer_ieee_float")


def encode_mp3(audio: np.ndarray, sample_rate: int, bitrate_kbps: int = 192) -> bytes:
    """Encode (C, T) float32 in [-1, 1] (C in {1, 2}) to an MP3 bitstream."""
    lib = _load_lame()
    assert lib is not None, "libmp3lame not found"
    c = ctypes
    lib.lame_init.restype = c.c_void_p
    for fn in ("lame_set_in_samplerate", "lame_set_num_channels",
               "lame_set_brate", "lame_set_quality", "lame_set_mode",
               "lame_init_params"):
        getattr(lib, fn).restype = c.c_int
    lib.lame_set_in_samplerate.argtypes = [c.c_void_p, c.c_int]
    lib.lame_set_num_channels.argtypes = [c.c_void_p, c.c_int]
    lib.lame_set_brate.argtypes = [c.c_void_p, c.c_int]
    lib.lame_set_quality.argtypes = [c.c_void_p, c.c_int]
    lib.lame_set_mode.argtypes = [c.c_void_p, c.c_int]
    lib.lame_init_params.argtypes = [c.c_void_p]
    lib.lame_encode_buffer_ieee_float.restype = c.c_int
    lib.lame_encode_buffer_ieee_float.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.POINTER(c.c_float), c.c_int,
        c.c_char_p, c.c_int,
    ]
    lib.lame_encode_flush.restype = c.c_int
    lib.lame_encode_flush.argtypes = [c.c_void_p, c.c_char_p, c.c_int]
    lib.lame_get_lametag_frame.restype = c.c_size_t
    lib.lame_get_lametag_frame.argtypes = [c.c_void_p, c.c_char_p, c.c_size_t]
    lib.lame_close.argtypes = [c.c_void_p]

    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None]
    channels, n = audio.shape
    assert channels in (1, 2)

    gfp = lib.lame_init()
    assert gfp
    try:
        lib.lame_set_in_samplerate(gfp, sample_rate)
        lib.lame_set_num_channels(gfp, channels)
        lib.lame_set_brate(gfp, bitrate_kbps)
        lib.lame_set_quality(gfp, 2)
        # MONO=3, JOINT_STEREO=1 (lame.h MPEG_mode)
        lib.lame_set_mode(gfp, 3 if channels == 1 else 1)
        assert lib.lame_init_params(gfp) >= 0, "lame_init_params failed"

        left = np.ascontiguousarray(audio[0])
        right = np.ascontiguousarray(audio[1] if channels == 2 else audio[0])
        fp = c.POINTER(c.c_float)
        out = bytearray()
        bufsize = int(1.25 * n + 7200) + 7200
        buf = c.create_string_buffer(bufsize)
        rc = lib.lame_encode_buffer_ieee_float(
            gfp, left.ctypes.data_as(fp), right.ctypes.data_as(fp),
            n, buf, bufsize,
        )
        assert rc >= 0, f"lame_encode_buffer_ieee_float rc={rc}"
        out += buf.raw[:rc]
        rc = lib.lame_encode_flush(gfp, buf, bufsize)
        assert rc >= 0
        out += buf.raw[:rc]
        # The first frame is an Info-tag placeholder; fill in the real
        # delay/padding/length so decoders can reconstruct the exact
        # original sample count (gapless).
        tag_len = lib.lame_get_lametag_frame(gfp, buf, bufsize)
        if 0 < tag_len <= len(out):
            out[:tag_len] = buf.raw[:tag_len]
        return bytes(out)
    finally:
        lib.lame_close(gfp)
