"""Importance subnet: per-frame importance map from an encoder feature.

Reference: models/importance_subnet.py:6-55 — a Snake+k=3-conv head
(1024 -> 1024 -> 512 -> 128 -> 32 -> 8 -> 1) with a final sigmoid, fed by
the activation after the last EncoderBlock. (The reference's
``_init_weights_zero`` runs before any layers exist so it is a no-op; real
init comes from the model-level init. We simply use the standard conv init.)
Channels-last: input (B, T, d_input) -> output (B, T, 1).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import Snake1d, WNConv1d


class ImportanceSubnet(nn.Module):
    d_input: int
    d_feat: int
    intermediate_channels: Sequence[int] = (512, 128, 32, 8)
    out_channels: int = 1
    detach_input: bool = False
    precision: "str | None" = None  # see nn.WNConv1d.precision

    @nn.compact
    def __call__(self, x_in: jnp.ndarray) -> jnp.ndarray:
        if self.detach_input:
            x_in = jax.lax.stop_gradient(x_in)
        x = Snake1d(self.d_input, name="in_snake")(x_in)
        x = WNConv1d(self.d_input, self.d_feat, kernel_size=3, padding=1,
                     precision=self.precision, name="in_conv")(x)
        in_channels = [self.d_feat] + list(self.intermediate_channels)
        out_channels = list(self.intermediate_channels) + [self.out_channels]
        for i, (cin, cout) in enumerate(zip(in_channels, out_channels)):
            x = Snake1d(cin, name=f"snake_{i}")(x)
            x = WNConv1d(cin, cout, kernel_size=3, padding=1,
                         precision=self.precision, name=f"conv_{i}")(x)
        return jax.nn.sigmoid(x)  # (B, T, 1)
