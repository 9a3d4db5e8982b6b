"""Reconstruction losses: L1/L2, SI-SDR, multi-scale STFT and mel.

Reference: models/loss.py:19-401 (which wraps audiotools spectral ops).
These are pure-jnp callables, jit-safe inside the train step: each accepts
either a ``vrvq_tpu.audio.Signal`` or a raw (B, C, T) array. The mel/STFT
transforms run as XLA ops (framing gather + rfft + mel matmul on the MXU).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp

from ..audio import Signal
from ..ops import stft as stft_ops


def _data(x) -> jnp.ndarray:
    if isinstance(x, Signal):
        return jnp.asarray(x.audio_data)
    return jnp.asarray(x)


def _sr(x, default: Optional[int] = None) -> Optional[int]:
    if isinstance(x, Signal):
        return x.sample_rate
    return default


@dataclasses.dataclass
class L1Loss:
    """L1 between signals (reference: models/loss.py:19-56)."""

    attribute: str = "audio_data"
    weight: float = 1.0

    def __call__(self, x, y) -> jnp.ndarray:
        if isinstance(x, Signal) and self.attribute != "audio_data":
            xv, yv = getattr(x, self.attribute), getattr(y, self.attribute)
        else:
            xv, yv = _data(x), _data(y)
        return jnp.mean(jnp.abs(xv - yv))


@dataclasses.dataclass
class L2Loss:
    """MSE between signals (reference: models/loss.py:59-69)."""

    attribute: str = "audio_data"
    weight: float = 1.0

    def __call__(self, x, y) -> jnp.ndarray:
        xv, yv = _data(x), _data(y)
        return jnp.mean(jnp.square(xv - yv))


@dataclasses.dataclass
class SISDRLoss:
    """Negative scale-invariant SDR (reference: models/loss.py:73-165).

    NOTE: the reference (inherited from audiotools) treats the FIRST
    argument as the reference signal and the second as the estimate; we
    preserve that argument order for parity.
    """

    scaling: bool = True
    reduction: str = "mean"
    zero_mean: bool = True
    clip_min: Optional[float] = None
    weight: float = 1.0

    def __call__(self, x, y) -> jnp.ndarray:
        eps = 1e-8
        references = _data(x)
        estimates = _data(y)
        nb = references.shape[0]
        references = references.reshape(nb, 1, -1).transpose(0, 2, 1)
        estimates = estimates.reshape(nb, 1, -1).transpose(0, 2, 1)

        if self.zero_mean:
            references = references - references.mean(axis=1, keepdims=True)
            estimates = estimates - estimates.mean(axis=1, keepdims=True)

        ref_proj = jnp.sum(references ** 2, axis=-2) + eps
        ref_on_est = jnp.sum(estimates * references, axis=-2) + eps
        scale = (ref_on_est / ref_proj)[:, None, :] if self.scaling else 1.0

        e_true = scale * references
        e_res = estimates - e_true
        signal = jnp.sum(e_true ** 2, axis=1)
        noise = jnp.sum(e_res ** 2, axis=1)
        sdr = -10.0 * jnp.log10(signal / noise + eps)

        if self.clip_min is not None:
            sdr = jnp.maximum(sdr, self.clip_min)
        if self.reduction == "mean":
            return jnp.mean(sdr)
        if self.reduction == "sum":
            return jnp.sum(sdr)
        return sdr


@dataclasses.dataclass
class MultiScaleSTFTLoss:
    """Multi-scale log+linear STFT magnitude L1
    (reference: models/loss.py:168-254)."""

    window_lengths: Sequence[int] = (2048, 512)
    clamp_eps: float = 1e-5
    mag_weight: float = 1.0
    log_weight: float = 1.0
    pow: float = 2.0
    weight: float = 1.0
    match_stride: bool = False
    window_type: Optional[str] = None

    def __call__(self, x, y) -> jnp.ndarray:
        xd, yd = _data(x), _data(y)
        loss = 0.0
        for w in self.window_lengths:
            hop = w // 4
            xs = jnp.abs(stft_ops.stft(xd, w, hop, self.window_type,
                                       self.match_stride))
            ys = jnp.abs(stft_ops.stft(yd, w, hop, self.window_type,
                                       self.match_stride))
            loss = loss + self.log_weight * jnp.mean(jnp.abs(
                jnp.log10(jnp.maximum(xs, self.clamp_eps) ** self.pow)
                - jnp.log10(jnp.maximum(ys, self.clamp_eps) ** self.pow)
            ))
            loss = loss + self.mag_weight * jnp.mean(jnp.abs(xs - ys))
        return loss


@dataclasses.dataclass
class MelSpectrogramLoss:
    """Multi-scale mel L1, optionally with per-sample 1/level weighting
    (reference: models/loss.py:257-401; the vrvq_a2 config uses 7 scales,
    pow=1, mag_weight=0).

    Deviation: the reference's (unused) ``levels`` branch drops the
    ``log_weight`` factor (models/loss.py:381-389); we apply it in both
    branches for consistency.
    """

    n_mels: Sequence[int] = (150, 80)
    window_lengths: Sequence[int] = (2048, 512)
    clamp_eps: float = 1e-5
    mag_weight: float = 1.0
    log_weight: float = 1.0
    pow: float = 2.0
    weight: float = 1.0
    match_stride: bool = False
    mel_fmin: Sequence[float] = (0.0, 0.0)
    mel_fmax: Sequence[Optional[float]] = (None, None)
    window_type: Optional[str] = None
    sample_rate: int = 44100

    def __call__(self, x, y, levels: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        xd, yd = _data(x), _data(y)
        sr = _sr(x, self.sample_rate)
        loss = 0.0
        if levels is not None:
            levels = levels.reshape(-1)  # (B,)
        for n_mels, fmin, fmax, w in zip(
            self.n_mels, self.mel_fmin, self.mel_fmax, self.window_lengths
        ):
            hop = w // 4
            x_mels = stft_ops.mel_spectrogram(
                xd, sr, n_mels, w, hop, self.window_type, self.match_stride,
                fmin, fmax,
            )
            y_mels = stft_ops.mel_spectrogram(
                yd, sr, n_mels, w, hop, self.window_type, self.match_stride,
                fmin, fmax,
            )
            log_diff = jnp.abs(
                jnp.log10(jnp.maximum(x_mels, self.clamp_eps) ** self.pow)
                - jnp.log10(jnp.maximum(y_mels, self.clamp_eps) ** self.pow)
            )
            mag_diff = jnp.abs(x_mels - y_mels)
            if levels is None:
                loss = loss + self.log_weight * jnp.mean(log_diff)
                loss = loss + self.mag_weight * jnp.mean(mag_diff)
            else:
                per = self.log_weight * jnp.mean(log_diff, axis=(1, 2, 3)) + \
                    self.mag_weight * jnp.mean(mag_diff, axis=(1, 2, 3))
                loss = loss + jnp.mean(per / levels)
        return loss
