"""ITU-R BS.1770 integrated loudness (K-weighting + gating).

Re-provides the audiotools/pyloudnorm loudness meter the reference's data
pipeline depends on (salient excerpt cutoff, data/loaders.py:81-86;
normalize in compress, models/dac_base.py:183-186). Host-side numpy.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np


@functools.lru_cache(maxsize=8)
def _k_weighting_coeffs(fs: float) -> Tuple[tuple, tuple]:
    """High-shelf + high-pass biquads per BS.1770-4, bilinear-matched to fs."""
    # Stage 1: spherical-head high shelf
    f0, G, Q = 1681.9744509555319, 3.99984385397917, 0.7071752369554193
    K = np.tan(np.pi * f0 / fs)
    Vh = 10.0 ** (G / 20.0)
    Vb = Vh ** 0.499666774155
    a0_ = 1.0 + K / Q + K * K
    b0 = (Vh + Vb * K / Q + K * K) / a0_
    b1 = 2.0 * (K * K - Vh) / a0_
    b2 = (Vh - Vb * K / Q + K * K) / a0_
    a1 = 2.0 * (K * K - 1.0) / a0_
    a2 = (1.0 - K / Q + K * K) / a0_
    shelf = ((b0, b1, b2), (1.0, a1, a2))

    # Stage 2: high pass
    f0, Q = 38.13547087613982, 0.5003270373253953
    K = np.tan(np.pi * f0 / fs)
    a0_ = 1.0 + K / Q + K * K
    a1 = 2.0 * (K * K - 1.0) / a0_
    a2 = (1.0 - K / Q + K * K) / a0_
    hp = ((1.0, -2.0, 1.0), (1.0, a1, a2))
    return shelf, hp


def k_weight(x: np.ndarray, fs: float) -> np.ndarray:
    """Apply the two K-weighting biquads along the last axis."""
    from scipy.signal import lfilter

    shelf, hp = _k_weighting_coeffs(fs)
    y = lfilter(shelf[0], shelf[1], x, axis=-1)
    y = lfilter(hp[0], hp[1], y, axis=-1)
    return y


def integrated_loudness(
    audio: np.ndarray, fs: int, block_size: float = 0.4
) -> np.ndarray:
    """BS.1770-4 gated loudness. audio: (B, C, T) -> (B,) LUFS."""
    audio = np.atleast_3d(np.asarray(audio, dtype=np.float64))
    b, c, t = audio.shape
    if t < int(block_size * fs):
        # pad to one block
        pad = int(block_size * fs) - t
        audio = np.pad(audio, ((0, 0), (0, 0), (0, pad)))
        t = audio.shape[-1]

    y = k_weight(audio, fs)

    frame_len = int(block_size * fs)
    hop = int(frame_len * 0.25)  # 75% overlap
    n_frames = 1 + (t - frame_len) // hop
    if n_frames < 1:
        n_frames = 1
    idx = (np.arange(n_frames) * hop)[:, None] + np.arange(frame_len)[None, :]
    frames = y[..., idx]  # (B, C, F, L)
    z = np.mean(frames ** 2, axis=-1)  # (B, C, F)

    # channel weights (stereo/mono: 1.0 each; surround weights for 4,5ch)
    g = np.ones(c)
    if c >= 4:
        g[3:] = 1.41
    zw = np.einsum("bcf,c->bf", z, g)

    loudness_blocks = -0.691 + 10.0 * np.log10(np.maximum(zw, 1e-12))

    out = np.empty(b)
    for i in range(b):
        lb = loudness_blocks[i]
        zb = zw[i]
        # absolute gate at -70 LUFS
        m = lb > -70.0
        if not m.any():
            out[i] = -np.inf
            continue
        z_abs = zb[m].mean()
        rel_thresh = -0.691 + 10.0 * np.log10(max(z_abs, 1e-12)) - 10.0
        m2 = m & (lb > rel_thresh)
        if not m2.any():
            out[i] = -np.inf
            continue
        out[i] = -0.691 + 10.0 * np.log10(zb[m2].mean())
    return out
