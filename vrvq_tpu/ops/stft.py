"""STFT / mel-spectrogram ops with audiotools-compatible conventions.

The reference leans on ``descript-audiotools`` for all spectral transforms
(models/loss.py:247-253,367-368; models/discriminator.py:129-158). Those
semantics are:

  * torch.stft with ``center=True`` (reflect padding of n_fft//2) and a
    periodic window;
  * ``match_stride=True`` additionally right-pads the signal to a hop
    multiple, pads (win - hop)//2 reflect on both sides, and drops the first
    and last two frames, so #frames == ceil(L / hop);
  * mel filterbanks are librosa-style (slaney scale + slaney norm).

Everything here is pure XLA: framing is an overlapping gather that XLA
vectorizes, and the DFT runs as jnp.fft.rfft (or, for mel losses, folds into
the mel matmul on the MXU).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------- windows
@functools.lru_cache(maxsize=64)
def get_window(window_type: Optional[str], window_length: int) -> np.ndarray:
    """Periodic windows matching scipy.signal.get_window(..., fftbins=True)."""
    if window_type in (None, "hann"):
        n = np.arange(window_length)
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_length)
    elif window_type == "sqrt_hann":
        n = np.arange(window_length)
        w = np.sqrt(0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_length))
    elif window_type == "ones" or window_type == "rectangular":
        w = np.ones(window_length)
    else:
        raise ValueError(f"Unsupported window type: {window_type}")
    return w.astype(np.float32)


def compute_stft_padding(
    length: int, window_length: int, hop_length: int, match_stride: bool
) -> Tuple[int, int]:
    """audiotools AudioSignal.compute_stft_padding semantics."""
    if match_stride:
        assert hop_length == window_length // 4, (
            "match_stride requires hop == window_length // 4"
        )
        right_pad = -(-length // hop_length) * hop_length - length
        pad = (window_length - hop_length) // 2
    else:
        right_pad = 0
        pad = 0
    return right_pad, pad


def _frame(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """(..., L) -> (..., n_frames, frame_length) overlapping frames."""
    length = x.shape[-1]
    n_frames = 1 + (length - frame_length) // hop_length
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return x[..., idx]


def stft(
    x: jnp.ndarray,
    window_length: int,
    hop_length: int,
    window_type: Optional[str] = None,
    match_stride: bool = False,
    padding_type: str = "reflect",
) -> jnp.ndarray:
    """Complex STFT of (..., T) audio -> (..., n_freq, n_frames).

    Matches audiotools AudioSignal.stft (torch.stft center=True).
    """
    length = x.shape[-1]
    right_pad, pad = compute_stft_padding(
        length, window_length, hop_length, match_stride
    )
    if pad or right_pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad + right_pad)],
                    mode=padding_type)
    # torch.stft center=True: reflect-pad n_fft//2 on both sides
    half = window_length // 2
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(half, half)], mode="reflect")

    window = jnp.asarray(get_window(window_type, window_length))
    frames = _frame(x, window_length, hop_length)  # (..., n_frames, win)
    spec = jnp.fft.rfft(frames * window, axis=-1)  # (..., n_frames, n_freq)
    spec = jnp.swapaxes(spec, -1, -2)              # (..., n_freq, n_frames)

    if match_stride:
        # audiotools drops the two edge frames introduced by centering
        spec = spec[..., 2:-2]
    return spec


def istft(
    spec: jnp.ndarray,
    window_length: int,
    hop_length: int,
    length: int,
    window_type: Optional[str] = None,
) -> jnp.ndarray:
    """Inverse STFT (overlap-add), center=True convention.

    spec: (..., n_freq, n_frames) -> (..., length).
    """
    window = jnp.asarray(get_window(window_type, window_length))
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=window_length, axis=-1)
    frames = frames * window

    n_frames = frames.shape[-2]
    total = window_length + hop_length * (n_frames - 1)
    lead_shape = frames.shape[:-2]

    idx = (np.arange(n_frames) * hop_length)[:, None] + np.arange(window_length)[None, :]
    flat_idx = idx.reshape(-1)
    sig = jnp.zeros(lead_shape + (total,), frames.dtype)
    sig = sig.at[..., flat_idx].add(frames.reshape(lead_shape + (-1,)))
    wsum = jnp.zeros((total,), frames.dtype)
    wsum = wsum.at[flat_idx].add(jnp.tile(window * window, (n_frames,)))
    sig = sig / jnp.maximum(wsum, 1e-11)

    half = window_length // 2
    return sig[..., half:half + length]


# ------------------------------------------------------------------- mel
def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = f >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=64)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> np.ndarray:
    """librosa.filters.mel(htk=False, norm='slaney') equivalent.

    Returns (n_mels, n_fft//2 + 1) float32.
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    mel_min = _hz_to_mel_slaney(np.array([fmin]))[0]
    mel_max = _hz_to_mel_slaney(np.array([fmax]))[0]
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def mel_spectrogram(
    x: jnp.ndarray,
    sample_rate: int,
    n_mels: int,
    window_length: int,
    hop_length: int,
    window_type: Optional[str] = None,
    match_stride: bool = False,
    mel_fmin: float = 0.0,
    mel_fmax: Optional[float] = None,
) -> jnp.ndarray:
    """(..., T) -> (..., n_mels, n_frames) — |STFT| through a slaney mel
    filterbank, matching audiotools AudioSignal.mel_spectrogram."""
    spec = stft(x, window_length, hop_length, window_type, match_stride)
    mag = jnp.abs(spec)
    basis = jnp.asarray(
        mel_filterbank(sample_rate, window_length, n_mels,
                       mel_fmin, mel_fmax)
    )
    # (..., F, T) x (M, F) -> (..., M, T): MXU matmul
    return jnp.einsum("...ft,mf->...mt", mag, basis)
