"""Audio file IO: WAV + FLAC + MP3 + MP4/M4A read, WAV write, source
scanning — the full audiotools AUDIO_EXTENSIONS list the reference
trains on (reference data/loaders.py:24).

Replaces the reference's dependence on audiotools/soundfile/ffmpeg
(reference data/loaders.py:81-104). WAV is parsed here (numpy), FLAC
in vrvq_tpu/data/flac_py.py, MP3 via the system libmpg123
(vrvq_tpu/data/mpeg.py), and MP4/AAC via a native FFmpeg shim
(vrvq_tpu/data/ffdecode.py); a native C++ reader (vrvq_tpu/native/io)
accelerates WAV/FLAC when built, with transparent fallback.

``AUDIO_EXTENSIONS`` lists only formats that actually decode — an
undecodable or unknown file raises ``UnsupportedFormatError`` from
``read_audio`` (the loaders turn that into a loud warn-once + silence,
preserving the reference's fault-tolerance without silently training on
zeros).

Reference call sites: data/loaders.py:29 (util.read_sources),
data/loaders.py:75-112 (AudioSignal load paths), scripts/inference.py:114
(.write()).
"""

from __future__ import annotations

import dataclasses
import os
import struct
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

AUDIO_EXTENSIONS = [".wav", ".flac", ".mp3", ".mp4", ".m4a"]


class UnsupportedFormatError(ValueError):
    """File extension/bitstream has no decoder in this build."""


@dataclasses.dataclass
class WavInfo:
    sample_rate: int
    num_channels: int
    num_frames: int
    bit_depth: int
    audio_format: int

    @property
    def duration(self) -> float:
        return self.num_frames / self.sample_rate


def _parse_wav_header(f) -> Tuple[WavInfo, int, int]:
    """Parse RIFF/WAVE chunks; returns (info, data_offset, data_size)."""
    riff = f.read(12)
    if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = None
    data_offset = None
    data_size = None
    while True:
        hdr = f.read(8)
        if len(hdr) < 8:
            break
        cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
        if cid == b"fmt ":
            fmt = f.read(size)
            if size % 2:
                f.read(1)
        elif cid == b"data":
            data_offset = f.tell()
            data_size = size
            f.seek(size + (size % 2), os.SEEK_CUR)
        else:
            f.seek(size + (size % 2), os.SEEK_CUR)
        if fmt is not None and data_offset is not None:
            break
    if fmt is None or data_offset is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate = struct.unpack("<HHI", fmt[:8])
    bits = struct.unpack("<H", fmt[14:16])[0]
    if audio_format == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = struct.unpack("<H", fmt[24:26])[0]
    bytes_per_frame = channels * (bits // 8)
    num_frames = data_size // bytes_per_frame if bytes_per_frame else 0
    return (
        WavInfo(sample_rate, channels, num_frames, bits, audio_format),
        data_offset,
        data_size,
    )


def wav_info(path) -> WavInfo:
    with open(path, "rb") as f:
        info, _, _ = _parse_wav_header(f)
    return info


def read_wav(
    path,
    offset: float = 0.0,
    duration: Optional[float] = None,
) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> ((C, T) float32 in [-1, 1], sample_rate).

    Seeks directly to the requested offset — only the excerpt's bytes are
    read, which is what makes random-excerpt training IO-efficient.
    """
    native = _native_reader()
    if native is not None:
        out = native.read_wav(str(path), offset, duration)
        if out is not None:
            return out

    with open(path, "rb") as f:
        info, data_offset, data_size = _parse_wav_header(f)
        bytes_per_sample = info.bit_depth // 8
        frame_bytes = bytes_per_sample * info.num_channels

        start_frame = int(round(offset * info.sample_rate))
        if duration is None:
            n_frames = info.num_frames - start_frame
        else:
            n_frames = int(round(duration * info.sample_rate))
        n_frames = max(0, min(n_frames, info.num_frames - start_frame))

        f.seek(data_offset + start_frame * frame_bytes)
        raw = f.read(n_frames * frame_bytes)

    n_read = len(raw) // frame_bytes
    if info.audio_format == 1:  # PCM
        if info.bit_depth == 16:
            data = np.frombuffer(raw, dtype="<i2", count=n_read * info.num_channels)
            data = data.astype(np.float32) / 32768.0
        elif info.bit_depth == 32:
            data = np.frombuffer(raw, dtype="<i4", count=n_read * info.num_channels)
            data = data.astype(np.float32) / 2147483648.0
        elif info.bit_depth == 24:
            b = np.frombuffer(raw, dtype=np.uint8, count=n_read * info.num_channels * 3)
            b = b.reshape(-1, 3)
            vals = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            data = vals.astype(np.float32) / 8388608.0
        elif info.bit_depth == 8:
            data = np.frombuffer(raw, dtype=np.uint8, count=n_read * info.num_channels)
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            raise ValueError(f"unsupported PCM bit depth {info.bit_depth}")
    elif info.audio_format == 3:  # IEEE float
        dtype = "<f4" if info.bit_depth == 32 else "<f8"
        data = np.frombuffer(raw, dtype=dtype, count=n_read * info.num_channels)
        data = data.astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format {info.audio_format}")

    data = data.reshape(n_read, info.num_channels).T.copy()
    return data, info.sample_rate


def write_wav(path, data: np.ndarray, sample_rate: int,
              bit_depth: int = 16) -> None:
    """Write (C, T) or (T,) float audio to a PCM WAV."""
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 1:
        data = data[None]
    data = np.clip(data, -1.0, 1.0)
    frames = data.T  # (T, C)
    if bit_depth == 16:
        pcm = np.round(frames * 32767.0).astype("<i2")
    elif bit_depth == 32:
        pcm = np.round(frames * 2147483647.0).astype("<i4")
    else:
        raise ValueError("bit_depth must be 16 or 32")
    channels = pcm.shape[1]
    byte_rate = sample_rate * channels * (bit_depth // 8)
    block_align = channels * (bit_depth // 8)
    payload = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + len(payload)))
        f.write(b"WAVE")
        f.write(b"fmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                            byte_rate, block_align, bit_depth))
        f.write(b"data")
        f.write(struct.pack("<I", len(payload)))
        f.write(payload)


def read_flac(
    path,
    offset: float = 0.0,
    duration: Optional[float] = None,
) -> Tuple[np.ndarray, int]:
    """Read a FLAC file -> ((C, T) float32 in [-1, 1], sample_rate)."""
    native = _native_reader()
    if native is not None and hasattr(native, "read_flac"):
        out = native.read_flac(str(path), offset, duration)
        if out is not None:
            return out
    from .flac_py import read_flac as _read_flac_py

    return _read_flac_py(path, offset=offset, duration=duration)


def audio_info(path):
    """Header-only info (sample_rate/channels/frames) for any supported
    format."""
    suffix = Path(path).suffix.lower()
    if suffix == ".wav":
        return wav_info(path)
    if suffix == ".flac":
        from .flac_py import flac_info

        return flac_info(path)
    if suffix == ".mp3":
        from .mpeg import mp3_info

        return mp3_info(path)
    if suffix in (".mp4", ".m4a"):
        from .ffdecode import ffmpeg_info

        return ffmpeg_info(path)
    raise UnsupportedFormatError(
        f"no decoder for '{suffix}' files (supported: {AUDIO_EXTENSIONS}): {path}"
    )


def read_audio(
    path,
    offset: float = 0.0,
    duration: Optional[float] = None,
) -> Tuple[np.ndarray, int]:
    """Decode any supported format -> ((C, T) float32, sample_rate).

    Raises ``UnsupportedFormatError`` for formats without a decoder
    instead of silently yielding silence.
    """
    suffix = Path(path).suffix.lower()
    if suffix == ".wav":
        return read_wav(path, offset=offset, duration=duration)
    if suffix == ".flac":
        return read_flac(path, offset=offset, duration=duration)
    if suffix == ".mp3":
        from .mpeg import read_mp3

        return read_mp3(path, offset=offset, duration=duration)
    if suffix in (".mp4", ".m4a"):
        from .ffdecode import read_ffmpeg

        return read_ffmpeg(path, offset=offset, duration=duration)
    raise UnsupportedFormatError(
        f"no decoder for '{suffix}' files (supported: {AUDIO_EXTENSIONS}): {path}"
    )


# ----------------------------------------------------------- source scanning
def find_audio(folder, ext: Optional[List[str]] = None) -> List[Path]:
    """Recursively list audio files (audiotools util.find_audio)."""
    ext = ext or AUDIO_EXTENSIONS
    folder = Path(folder)
    files: List[Path] = []
    if folder.is_file() and folder.suffix.lower() in ext:
        return [folder]
    for e in ext:
        files.extend(sorted(folder.rglob(f"*{e}")))
    return sorted(set(files))


def read_sources(
    sources: List[str],
    remove_empty: bool = True,
    relative_path: str = "",
    ext: Optional[List[str]] = None,
) -> List[List[Dict]]:
    """audiotools util.read_sources: each source is a folder (scanned
    recursively) or a csv with a ``path`` column."""
    import csv

    files = []
    relative_path = Path(relative_path)
    for source in sources:
        source = str(source)
        _files = []
        if source.endswith(".csv"):
            with open(source) as f:
                for x in csv.DictReader(f):
                    if remove_empty and x.get("path", "") == "":
                        continue
                    if x.get("path"):
                        x["path"] = str(relative_path / x["path"])
                    _files.append(x)
        else:
            for x in find_audio(source, ext=ext):
                _files.append({"path": str(relative_path / x)})
        files.append(sorted(_files, key=lambda x: x["path"]))
    return files


def choose_from_list_of_lists(state, list_of_lists, p=None):
    """audiotools util.choose_from_list_of_lists."""
    source_idx = state.choice(len(list_of_lists), p=p)
    item_idx = state.randint(len(list_of_lists[source_idx]))
    return list_of_lists[source_idx][item_idx], source_idx, item_idx


# ----------------------------------------------------------------- native
_NATIVE = None
_NATIVE_TRIED = False


def _native_reader():
    """Load the optional C++ WAV reader (vrvq_tpu/native/io)."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from ..native.io import wavio as _wavio

            _NATIVE = _wavio if _wavio.available() else None
        except Exception:
            _NATIVE = None
    return _NATIVE
