"""MP4/M4A (AAC) decode tests: vrvq_tpu.data.ffdecode (native FFmpeg
shim) against AAC streams produced by the shim's own test-fixture
encoder — completing the reference's audiotools AUDIO_EXTENSIONS
coverage (reference data/loaders.py:24).

AAC has no exact gapless contract (encoder priming/padding varies by
muxer), so roundtrips align by cross-correlation before measuring SNR —
the same tolerance a reference user gets from ffmpeg-decoded corpora.
"""

import numpy as np
import pytest

from vrvq_tpu.data.audio_io import AUDIO_EXTENSIONS, audio_info, read_audio
from vrvq_tpu.data.ffdecode import (
    FfmpegDecodeError, available, encode_aac, ffmpeg_info, read_ffmpeg,
)

pytestmark = pytest.mark.skipif(
    not available(),
    reason="libvrvqff.so not built or FFmpeg runtime missing",
)

SR = 44100


def _tone(freqs, secs=1.0, sr=SR):
    t = np.arange(int(secs * sr)) / sr
    return np.stack(
        [0.4 * np.sin(2 * np.pi * f * t) for f in freqs]
    ).astype(np.float32)


def _aligned_snr_db(ref, got, max_lag=5000):
    """SNR after aligning out the AAC priming delay (channel 0)."""
    n = min(ref.shape[-1], got.shape[-1]) - max_lag
    r = ref[0, :n]
    lag = max(range(max_lag), key=lambda l: float(np.dot(r, got[0, l:l + n])))
    snr = []
    for c in range(ref.shape[0]):
        a, b = ref[c, :n], got[c, lag:lag + n]
        snr.append(10 * np.log10((a**2).sum() / (((a - b)**2).sum() + 1e-12)))
    return min(snr), lag


def test_mp4_extensions_registered():
    assert ".mp4" in AUDIO_EXTENSIONS and ".m4a" in AUDIO_EXTENSIONS


@pytest.mark.parametrize("ext", [".m4a", ".mp4"])
@pytest.mark.parametrize("freqs", [(440.0,), (440.0, 554.37)])
def test_roundtrip_tone(tmp_path, ext, freqs):
    pcm = _tone(freqs)
    path = tmp_path / f"t{ext}"
    encode_aac(path, pcm, SR)
    got, sr = read_ffmpeg(path)
    assert sr == SR
    assert got.shape[0] == len(freqs)
    # length within one AAC frame + priming of the original
    assert abs(got.shape[1] - pcm.shape[1]) < 2048
    snr, _ = _aligned_snr_db(pcm, got)
    assert snr > 15.0, snr


def test_info(tmp_path):
    pcm = _tone((440.0, 660.0), secs=0.75)
    path = tmp_path / "t.mp4"
    encode_aac(path, pcm, SR)
    info = ffmpeg_info(path)
    assert info.sample_rate == SR
    assert info.num_channels == 2
    # container duration matches the source within one AAC frame
    assert abs(info.num_frames - pcm.shape[1]) < 2048


def test_offset_duration_window(tmp_path):
    """A windowed read equals the same slice of the full decode — the
    loader's random-excerpt path must be internally consistent."""
    pcm = _tone((440.0,), secs=1.5)
    path = tmp_path / "t.m4a"
    encode_aac(path, pcm, SR)
    full, _ = read_ffmpeg(path)
    part, sr = read_ffmpeg(path, offset=0.4, duration=0.3)
    assert sr == SR
    start, want = int(0.4 * SR), int(0.3 * SR)
    assert part.shape == (1, want)
    sl = full[:, start:start + want]
    err = ((part - sl) ** 2).sum()
    sig = (sl ** 2).sum()
    assert err < 1e-6 * max(sig, 1.0), (err, sig)


def test_read_audio_dispatch(tmp_path):
    pcm = _tone((330.0,), secs=0.5)
    path = tmp_path / "d.mp4"
    encode_aac(path, pcm, SR)
    got, sr = read_audio(path)
    assert sr == SR and got.shape[0] == 1
    info = audio_info(path)
    assert info.sample_rate == SR


def test_corrupt_mp4_raises(tmp_path):
    path = tmp_path / "bad.mp4"
    path.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        read_ffmpeg(path)


def test_loader_trains_on_mp4_corpus(tmp_path):
    """End-to-end: an AudioLoader over an mp4 folder yields non-silent
    excerpts — the reference-user-with-an-AAC-corpus case."""
    from vrvq_tpu.data.loaders import AudioLoader

    folder = tmp_path / "corpus"
    folder.mkdir()
    for i, f in enumerate((261.63, 329.63, 392.0)):
        encode_aac(folder / f"{i}.mp4", _tone((f,)), SR)
    loader = AudioLoader(sources=[str(folder)])
    state = np.random.RandomState(0)
    item = loader(state, SR, duration=0.4, num_channels=1)
    audio = np.asarray(item["signal"].audio_data)
    assert audio.shape[-1] == int(0.4 * SR)
    assert np.abs(audio).max() > 0.05
