"""GAN discriminator ensemble: MPD (period-folded 2D convs), MSD
(multi-scale waveform), MRD (multi-band complex-STFT).

Reference: models/discriminator.py. Channels-last layouts throughout:
waveform (B, T, C), 2-D feature maps (B, H, W, C) so conv channels ride the
TPU lanes. Each sub-discriminator returns its feature-map list (all
intermediate activations + the final logit map), exactly the structure the
GAN/feature-matching losses consume (models/loss.py:404-447).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import WNConv1d
from ..ops.resample import resample_jax
from ..ops.stft import stft as stft_op

BANDS = [(0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0)]


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.1)


class WNConv2d(nn.Module):
    """Weight-normalized 2-D conv, channels-last (HWIO kernel), matching
    torch ``weight_norm(nn.Conv2d, dim=0)`` grouping."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        cin, cout = self.in_channels, self.out_channels
        fan_in = cin * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        v = self.param(
            "v",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (kh, kw, cin, cout),
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v.reshape(-1, cout), axis=0).reshape(shape),
            (cout,),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True))
        w = v * (g[None, None, None, :] / jnp.maximum(norm, 1e-32))
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (cout,))
        return (y + b).astype(x.dtype)


class MPD(nn.Module):
    """Multi-period discriminator (reference: models/discriminator.py:30-65).

    Folds the waveform into (time/period, period) and runs 2-D convs with
    (5,1) kernels striding over time.
    """

    period: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # x: (B, T, 1)
        t = x.shape[1]
        pad = self.period - t % self.period  # always pads (torch parity)
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        b = x.shape[0]
        x = x.reshape(b, -1, self.period, 1)  # (B, L, P, 1) NHWC

        fmap = []
        chans = [(1, 32), (32, 128), (128, 512), (512, 1024)]
        for i, (cin, cout) in enumerate(chans):
            x = WNConv2d(cin, cout, (5, 1), (3, 1), (2, 0), name=f"conv_{i}")(x)
            x = _leaky(x)
            fmap.append(x)
        x = WNConv2d(1024, 1024, (5, 1), (1, 1), (2, 0), name="conv_4")(x)
        x = _leaky(x)
        fmap.append(x)
        x = WNConv2d(1024, 1, (3, 1), (1, 1), (1, 0), name="conv_post")(x)
        fmap.append(x)
        return fmap


class MSD(nn.Module):
    """Multi-scale waveform discriminator
    (reference: models/discriminator.py:68-98; disabled by default config —
    ``Discriminator.rates: []`` in conf/base.yml)."""

    rate: int = 1
    sample_rate: int = 44100

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # x: (B, T, 1)
        if self.rate != 1:
            sig = x[..., 0]
            sig = resample_jax(sig, self.sample_rate, self.sample_rate // self.rate)
            x = sig[..., None]
        fmap = []
        specs = [
            (1, 16, 15, 1, 1, 7),
            (16, 64, 41, 4, 4, 20),
            (64, 256, 41, 4, 16, 20),
            (256, 1024, 41, 4, 64, 20),
            (1024, 1024, 41, 4, 256, 20),
            (1024, 1024, 5, 1, 1, 2),
        ]
        for i, (cin, cout, k, s, g, p) in enumerate(specs):
            x = WNConv1d(cin, cout, kernel_size=k, stride=s, padding=p,
                         groups=g, name=f"conv_{i}")(x)
            x = _leaky(x)
            fmap.append(x)
        x = WNConv1d(1024, 1, kernel_size=3, stride=1, padding=1,
                     name="conv_post")(x)
        fmap.append(x)
        return fmap


class MRD(nn.Module):
    """Multi-band complex-spectrogram discriminator
    (reference: models/discriminator.py:101-175)."""

    window_length: int
    hop_factor: float = 0.25
    sample_rate: int = 44100
    bands: Sequence[Tuple[float, float]] = tuple(BANDS)

    def spectrogram(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # x: (B, T, 1) -> complex STFT with match_stride (audiotools default
        # STFTParams(match_stride=True), reference discriminator.py:129-133)
        sig = x[..., 0]
        hop = int(self.window_length * self.hop_factor)
        spec = stft_op(sig, self.window_length, hop, None, match_stride=True)
        # (B, F, T) complex -> (B, T, F, 2) channels-last real/imag
        z = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        z = z.transpose(0, 2, 1, 3)  # (B, T, F, 2)
        n_fft = self.window_length // 2 + 1
        bands = [(int(lo * n_fft), int(hi * n_fft)) for lo, hi in self.bands]
        return [z[:, :, lo:hi, :] for lo, hi in bands]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        x_bands = self.spectrogram(x)
        fmap = []
        outs = []
        ch = 32
        specs = [
            (2, ch, (3, 9), (1, 1), (1, 4)),
            (ch, ch, (3, 9), (1, 2), (1, 4)),
            (ch, ch, (3, 9), (1, 2), (1, 4)),
            (ch, ch, (3, 9), (1, 2), (1, 4)),
            (ch, ch, (3, 3), (1, 1), (1, 1)),
        ]
        for bi, band in enumerate(x_bands):
            z = band
            for li, (cin, cout, k, s, p) in enumerate(specs):
                z = WNConv2d(cin, cout, k, s, p, name=f"band_{bi}_conv_{li}")(z)
                z = _leaky(z)
                fmap.append(z)
            outs.append(z)
        z = jnp.concatenate(outs, axis=2)  # cat along freq
        z = WNConv2d(ch, 1, (3, 3), (1, 1), (1, 1), name="conv_post")(z)
        fmap.append(z)
        return fmap


class Discriminator(nn.Module):
    """Ensemble of MPD(periods) + MSD(rates) + MRD(fft_sizes)
    (reference: models/discriminator.py:178-220)."""

    rates: Sequence[int] = ()
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    fft_sizes: Sequence[int] = (2048, 1024, 512)
    sample_rate: int = 44100
    bands: Sequence[Tuple[float, float]] = tuple(BANDS)

    def setup(self):
        discs = []
        discs += [MPD(p, name=f"mpd_{p}") for p in self.periods]
        discs += [
            MSD(r, sample_rate=self.sample_rate, name=f"msd_{r}")
            for r in self.rates
        ]
        discs += [
            MRD(f, sample_rate=self.sample_rate, bands=tuple(self.bands),
                name=f"mrd_{f}")
            for f in self.fft_sizes
        ]
        self.discriminators = discs

    def preprocess(self, y: jnp.ndarray) -> jnp.ndarray:
        # y: (B, T, 1); remove DC offset, peak normalize to 0.8
        y = y - jnp.mean(y, axis=1, keepdims=True)
        peak = jnp.max(jnp.abs(y), axis=1, keepdims=True)
        return 0.8 * y / (peak + 1e-9)

    def __call__(self, x: jnp.ndarray) -> List[List[jnp.ndarray]]:
        """x: (B, 1, T) reference orientation -> list of fmap lists."""
        y = x.transpose(0, 2, 1)  # (B, T, 1)
        y = self.preprocess(y)
        return [d(y) for d in self.discriminators]
