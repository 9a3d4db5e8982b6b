"""Sample-rate conversion.

Host-side path: polyphase resampling via scipy (kaiser-windowed sinc,
comparable to the julius resampler audiotools uses). In-graph path: a
jit-safe windowed-sinc implemented as a strided conv so resampling can live
inside an XLA program (used by the MSD discriminator when rates are
enabled, reference models/discriminator.py:85-88).
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np


def resample_poly_np(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase resample along the last axis (host-side, numpy)."""
    from scipy.signal import resample_poly

    if orig_sr == new_sr:
        return x
    frac = Fraction(new_sr, orig_sr)
    up, down = frac.numerator, frac.denominator
    return resample_poly(x, up, down, axis=-1).astype(x.dtype, copy=False)


def resample_jax(x, orig_sr: int, new_sr: int, zeros: int = 24):
    """Windowed-sinc resample of (..., T) inside an XLA program."""
    import jax.numpy as jnp
    import jax

    if orig_sr == new_sr:
        return x
    frac = Fraction(new_sr, orig_sr)
    up, down = frac.numerator, frac.denominator

    # lowpass at the zero-stuffed intermediate rate sr*up: normalized
    # cutoff c = min(1/up, 1/down) (anti-image + anti-alias), passband
    # gain `up` to undo the zero-stuffing attenuation
    c = min(1.0 / up, 1.0 / down)
    halfwidth = int(np.ceil(zeros / c))
    n = np.arange(-halfwidth, halfwidth + 1)
    window = np.kaiser(len(n), 14.769656459379492)
    filt = (up * c * np.sinc(c * n) * window).astype(np.float32)
    # Build polyphase bank: phase p uses taps filt[p::up] after upsampling.
    # Implement via lhs_dilation (upsample) + conv + stride (downsample).
    lead = x.shape[:-1]
    sig = x.reshape((-1, x.shape[-1], 1))
    k = len(filt)
    pad = k // 2
    # right-pad one extra `down` so the strided conv always yields at least
    # ceil(T*up/down) samples (matching scipy.signal.resample_poly's length
    # contract) — at awkward fractions the symmetric pad alone can land one
    # output short
    y = jax.lax.conv_general_dilated(
        sig,
        jnp.asarray(filt).reshape(k, 1, 1),
        window_strides=(down,),
        padding=[(pad, pad + down)],
        lhs_dilation=(up,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    new_len = int(math.ceil(x.shape[-1] * up / down))
    return y[:, :new_len, 0].reshape(lead + (-1,))
