"""Framewise (per-512-sample-window) loss variants.

Reference: models/loss.py:454-611 — rate-distortion experiment utilities
(not used by the training loop, kept for capability parity). All return
per-frame loss maps (B, n_frames).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp

from ..ops import stft as stft_ops
from .recon import SISDRLoss


@dataclasses.dataclass
class SISDRLossFramewise:
    """Reference: models/loss.py:454-487."""

    scaling: bool = True
    zero_mean: bool = True
    clip_min: Optional[float] = None
    weight: float = 1.0

    def __call__(self, x, y, window_size: int = 512) -> jnp.ndarray:
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        nb, nc, nt = x.shape
        assert nt % window_size == 0, f"nt: {nt}, window_size: {window_size}"
        n_frames = nt // window_size
        xf = x.reshape(nb, nc, n_frames, window_size)
        xf = xf.transpose(0, 2, 1, 3).reshape(nb * n_frames, nc, window_size)
        yf = y.reshape(nb, nc, n_frames, window_size)
        yf = yf.transpose(0, 2, 1, 3).reshape(nb * n_frames, nc, window_size)
        loss = SISDRLoss(
            scaling=self.scaling, reduction="none", zero_mean=self.zero_mean,
            clip_min=self.clip_min,
        )(xf, yf)
        return loss.reshape(nb, n_frames)


@dataclasses.dataclass
class L1LossFramewise:
    """Reference: models/loss.py:490-509."""

    def __call__(self, x, y, window_size: int = 512) -> jnp.ndarray:
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        nb, nc, nt = x.shape
        assert nt % window_size == 0
        n_frames = nt // window_size
        diff = jnp.abs(x - y).reshape(nb, nc, n_frames, window_size)
        return jnp.mean(diff, axis=(1, 3))


@dataclasses.dataclass
class MelSpectrogramLossFramewise:
    """Per-frame mel loss with hop=window (center=False framing)
    (reference: models/loss.py:512-611)."""

    n_mels: Sequence[int] = (160, 80, 40, 20)
    window_lengths: Sequence[int] = (512, 512, 512, 512)
    clamp_eps: float = 1e-5
    mag_weight: float = 0.0
    log_weight: float = 1.0
    pow: float = 1.0
    weight: float = 1.0
    mel_fmin: Sequence[float] = (0.0, 0.0, 0.0, 0.0)
    mel_fmax: Sequence[Optional[float]] = (None, None, None, None)
    sr: int = 44100

    def _mel_center_false(self, x, n_mels, w, fmin, fmax):
        # torchaudio MelSpectrogram(center=False, hop=w): non-overlapping
        # frames, power spectrogram (power=2.0), HTK-free slaney mel? NB:
        # torchaudio uses HTK=False, norm=None by default; we keep the
        # slaney-scale filterbank (norm='slaney') used everywhere else for
        # internal consistency of this experimental loss.
        nb, nc, nt = x.shape
        n_frames = nt // w
        frames = x[..., : n_frames * w].reshape(nb, nc, n_frames, w)
        window = jnp.asarray(stft_ops.get_window("hann", w))
        spec = jnp.abs(jnp.fft.rfft(frames * window, axis=-1)) ** 2
        basis = jnp.asarray(
            stft_ops.mel_filterbank(self.sr, w, n_mels, fmin, fmax or self.sr / 2)
        )
        return jnp.einsum("bctf,mf->bcmt", spec, basis)

    def __call__(self, x, y, window_size=None) -> jnp.ndarray:
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        loss = 0.0
        for n_mels, w, fmin, fmax in zip(
            self.n_mels, self.window_lengths, self.mel_fmin, self.mel_fmax
        ):
            xm = self._mel_center_false(x, n_mels, w, fmin, fmax)
            ym = self._mel_center_false(y, n_mels, w, fmin, fmax)
            il = self.log_weight * jnp.abs(
                jnp.log10(jnp.maximum(xm, self.clamp_eps) ** self.pow)
                - jnp.log10(jnp.maximum(ym, self.clamp_eps) ** self.pow)
            )
            if self.mag_weight > 0:
                il = il + self.mag_weight * jnp.abs(xm - ym)
            loss = loss + jnp.mean(il, axis=2)  # (B, C, frames)
        return loss[:, 0, :]
