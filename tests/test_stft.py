"""STFT/mel parity vs torch.stft (the audiotools convention oracle)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vrvq_tpu.ops import stft as stft_ops


def _torch_stft(x, window_length, hop_length, match_stride=False):
    """audiotools AudioSignal.stft semantics re-expressed with torch.stft."""
    x = torch.tensor(x)
    length = x.shape[-1]
    if match_stride:
        assert hop_length == window_length // 4
        right_pad = int(np.ceil(length / hop_length)) * hop_length - length
        pad = (window_length - hop_length) // 2
    else:
        right_pad, pad = 0, 0
    flat = x.reshape(-1, length)
    flat = torch.nn.functional.pad(flat[:, None], (pad, pad + right_pad),
                                   mode="reflect")[:, 0]
    window = torch.hann_window(window_length, periodic=True)
    spec = torch.stft(
        flat, n_fft=window_length, hop_length=hop_length, window=window,
        return_complex=True, center=True,
    )
    spec = spec.reshape(x.shape[:-1] + spec.shape[-2:])
    if match_stride:
        spec = spec[..., 2:-2]
    return spec.numpy()


@pytest.mark.parametrize("w,hop,ms", [(512, 128, False), (256, 64, True),
                                      (2048, 512, True)])
def test_stft_matches_torch(w, hop, ms):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 8000).astype(np.float32)
    ref = _torch_stft(x, w, hop, ms)
    out = np.asarray(stft_ops.stft(jnp.asarray(x), w, hop, None, ms))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.abs(out), np.abs(ref), rtol=1e-4, atol=1e-4)


def test_match_stride_frame_count():
    """match_stride makes #frames == ceil(L / hop) (audiotools invariant)."""
    x = jnp.zeros((1, 1, 44100))
    spec = stft_ops.stft(x, 2048, 512, None, match_stride=True)
    assert spec.shape[-1] == int(np.ceil(44100 / 512))


def test_mel_filterbank_matches_librosa_formula():
    """Slaney filterbank sanity: rows sum to the slaney normalization and
    peak positions are monotone."""
    fb = stft_ops.mel_filterbank(44100, 2048, 80)
    assert fb.shape == (80, 1025)
    assert np.all(fb >= 0)
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0)
    # every filter has support
    assert np.all(fb.sum(axis=1) > 0)


def test_mel_spectrogram_shapes():
    x = jnp.zeros((2, 1, 22050))
    m = stft_ops.mel_spectrogram(x, 44100, 80, 2048, 512)
    assert m.shape[:-1] == (2, 1, 80)


def test_istft_roundtrip():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 1, 4096).astype(np.float32)
    spec = stft_ops.stft(jnp.asarray(x), 512, 128)
    rec = np.asarray(stft_ops.istft(spec, 512, 128, 4096))
    np.testing.assert_allclose(rec, x, rtol=1e-3, atol=1e-4)


def test_resample_jax_matches_scipy_gain():
    """In-graph resampler must be unity-gain and track scipy's polyphase
    (code-review finding: the old kernel had ~`down`x DC gain)."""
    from vrvq_tpu.ops.resample import resample_jax, resample_poly_np

    t = np.arange(8192) / 44100
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    for new_sr in (22050, 88200):
        ref = resample_poly_np(x, 44100, new_sr)
        out = np.asarray(resample_jax(jnp.asarray(x), 44100, new_sr))
        n = min(ref.shape[-1], out.shape[-1]) - 200
        # compare away from the edges; amplitudes must match (unity gain)
        a, b = ref[0, 100:n], out[0, 100:n]
        assert abs(np.abs(a).max() - np.abs(b).max()) < 0.02
        np.testing.assert_allclose(a, b, atol=0.02)


def test_resample_jax_odd_rational_ratios():
    """Parity vs scipy's polyphase at odd rational ratios — the MSD path
    when `rates` is enabled divides the sample rate by small integers
    (reference models/discriminator.py:85-88), but the resampler must also
    hold up at awkward up/down fractions (e.g. 44100->16000 = 160/441,
    44100->22000 = 220/441, 44100->48000 = 160/147)."""
    from vrvq_tpu.ops.resample import resample_jax, resample_poly_np

    rng = np.random.RandomState(7)
    t = np.arange(16384) / 44100
    # band-limited test signal (tones well under the lowest Nyquist) plus
    # a little band-limited noise so the comparison isn't tone-specific
    x = (
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.2 * np.sin(2 * np.pi * 1337 * t + 0.3)
        + 0.1 * np.sin(2 * np.pi * 3500 * t + 1.1)
    ).astype(np.float32)[None]
    for new_sr in (16000, 22000, 48000, 14700):
        ref = resample_poly_np(x, 44100, new_sr)
        out = np.asarray(resample_jax(jnp.asarray(x), 44100, new_sr))
        # output length must match ceil(T*up/down) like scipy's resample_poly
        assert out.shape[-1] == ref.shape[-1], (new_sr, out.shape, ref.shape)
        n = min(ref.shape[-1], out.shape[-1]) - 400
        a, b = ref[0, 400:n], out[0, 400:n]
        err = np.abs(a - b).max()
        assert err < 0.02, f"sr {new_sr}: max err {err}"
        # agreement in dB well above what a codec eval would perturb
        snr = 10 * np.log10((a**2).sum() / ((a - b) ** 2).sum())
        assert snr > 35.0, f"sr {new_sr}: SNR {snr:.1f} dB"
