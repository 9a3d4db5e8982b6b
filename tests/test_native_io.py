"""Native C++ IO library tests (built on demand; skipped if no compiler)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

NATIVE_DIR = Path(__file__).resolve().parents[1] / "vrvq_tpu" / "native" / "io"


@pytest.fixture(scope="module")
def native():
    so = NATIVE_DIR / "libvrvqio.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("no C++ toolchain available")
    from vrvq_tpu.native.io import wavio

    if not wavio.available():
        pytest.skip("native lib failed to load")
    return wavio


def test_native_read_matches_python(native, tmp_path):
    from vrvq_tpu.data.audio_io import write_wav, read_wav
    from vrvq_tpu.data import audio_io

    rng = np.random.RandomState(0)
    x = (rng.rand(2, 44100).astype(np.float32) - 0.5)
    p = tmp_path / "x.wav"
    write_wav(p, x, 44100)

    nat, sr = native.read_wav(str(p), 0.25, 0.5)
    # python fallback path
    orig = audio_io._NATIVE
    audio_io._NATIVE = None
    try:
        py, sr2 = read_wav(p, 0.25, 0.5)
    finally:
        audio_io._NATIVE = orig
    assert sr == sr2 == 44100
    np.testing.assert_array_equal(nat, py)


def test_native_info(native, tmp_path):
    from vrvq_tpu.data.audio_io import write_wav

    x = np.zeros((1, 12345), np.float32)
    p = tmp_path / "z.wav"
    write_wav(p, x, 22050)
    from vrvq_tpu.native.io import wavio
    import ctypes

    lib = wavio._load()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    fr = ctypes.c_long()
    assert lib.vrvqio_wav_info(str(p).encode(), ctypes.byref(sr),
                               ctypes.byref(ch), ctypes.byref(fr)) == 0
    assert (sr.value, ch.value, fr.value) == (22050, 1, 12345)


def test_native_loudness_matches_scipy(native):
    from vrvq_tpu.ops.loudness import integrated_loudness

    rng = np.random.RandomState(1)
    for c, t in [(1, 16758), (2, 44100)]:
        x = (rng.randn(c, t) * 0.1).astype(np.float32)
        ref = integrated_loudness(x[None].astype(np.float64), 44100)[0]
        nat = native.loudness(x, 44100)
        assert abs(ref - nat) < 1e-3


def test_native_read_missing_file(native):
    assert native.read_wav("/nonexistent/file.wav") is None
