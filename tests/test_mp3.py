"""MP3 decode tests: vrvq_tpu.data.mpeg (libmpg123 ctypes binding)
against real LAME-encoded bitstreams, plus the loader-facing dispatch —
the reference trains on mp3 corpora via audiotools/ffmpeg
(reference data/loaders.py:24), so read_audio must too.
"""

import numpy as np
import pytest

from tests.mp3_encoder import encode_mp3, lame_available
from vrvq_tpu.data.audio_io import AUDIO_EXTENSIONS, audio_info, read_audio
from vrvq_tpu.data.mpeg import available, mp3_info, read_mp3

pytestmark = pytest.mark.skipif(
    not (available() and lame_available()),
    reason="libmpg123/libmp3lame not on this system",
)

SR = 44100


def _tone(freqs, secs=1.0, sr=SR):
    t = np.arange(int(secs * sr)) / sr
    chans = [0.4 * np.sin(2 * np.pi * f * t) for f in freqs]
    return np.stack(chans).astype(np.float32)


def _snr_db(ref, got):
    n = min(ref.shape[-1], got.shape[-1])
    ref, got = ref[..., :n], got[..., :n]
    err = ref - got
    return 10 * np.log10((ref**2).sum() / max((err**2).sum(), 1e-12))


def test_mp3_extension_registered():
    assert ".mp3" in AUDIO_EXTENSIONS


@pytest.mark.parametrize("freqs", [(440.0,), (440.0, 554.37)])
def test_roundtrip_tone(tmp_path, freqs):
    pcm = _tone(freqs)
    path = tmp_path / "t.mp3"
    path.write_bytes(encode_mp3(pcm, SR))
    got, sr = read_mp3(path)
    assert sr == SR
    assert got.shape[0] == len(freqs)
    # gapless (LAME info tag) decode restores the original length exactly
    assert got.shape[1] == pcm.shape[1]
    # 192 kbps on pure tones: transparent minus codec noise
    assert _snr_db(pcm, got) > 20.0


def test_info(tmp_path):
    pcm = _tone((440.0, 660.0), secs=0.7)
    path = tmp_path / "t.mp3"
    path.write_bytes(encode_mp3(pcm, SR))
    info = mp3_info(path)
    assert info.sample_rate == SR
    assert info.num_channels == 2
    assert info.num_frames == pcm.shape[1]
    assert abs(info.duration - pcm.shape[1] / SR) < 1e-9


def test_offset_duration_sample_accurate(tmp_path):
    pcm = _tone((440.0,), secs=1.2)
    path = tmp_path / "t.mp3"
    path.write_bytes(encode_mp3(pcm, SR))
    full, _ = read_mp3(path)
    part, sr = read_mp3(path, offset=0.3, duration=0.25)
    assert sr == SR
    start = int(round(0.3 * SR))
    want = int(round(0.25 * SR))
    assert part.shape == (1, want)
    # mpg123_seek must land on the exact sample: the windowed read equals
    # the same slice of the full decode bit-for-bit
    np.testing.assert_array_equal(part, full[:, start : start + want])


def test_read_audio_dispatch(tmp_path):
    pcm = _tone((330.0,), secs=0.5)
    path = tmp_path / "d.mp3"
    path.write_bytes(encode_mp3(pcm, SR))
    got, sr = read_audio(path)
    assert sr == SR and got.shape == (1, pcm.shape[1])
    info = audio_info(path)
    assert info.num_frames == pcm.shape[1]


def test_corrupt_mp3_raises(tmp_path):
    path = tmp_path / "bad.mp3"
    path.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        read_mp3(path)


def test_loader_trains_on_mp3_corpus(tmp_path):
    """End-to-end: an AudioLoader pointed at an mp3 folder yields real
    (non-silent) excerpts — the reference-user-with-an-mp3-corpus case."""
    from vrvq_tpu.data.loaders import AudioLoader

    folder = tmp_path / "corpus"
    folder.mkdir()
    for i, f in enumerate((261.63, 329.63, 392.0)):
        (folder / f"{i}.mp3").write_bytes(encode_mp3(_tone((f,)), SR))
    loader = AudioLoader(sources=[str(folder)])
    state = np.random.RandomState(0)
    item = loader(state, SR, duration=0.4, num_channels=1)
    audio = np.asarray(item["signal"].audio_data)
    assert audio.shape[-1] == int(0.4 * SR)
    assert np.abs(audio).max() > 0.05
