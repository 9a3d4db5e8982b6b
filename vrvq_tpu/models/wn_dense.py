"""Weight-normalized 1x1 "conv" as a dense matmul.

The reference's quantizer projections are kernel-size-1 WNConv1d's
(models/quantize.py:38-39); on TPU a k=1 conv IS a matmul, so we express it
directly as one — (B*T, in) @ (in, out) on the MXU — while keeping torch
``weight_norm(dim=0)`` parity (per-out-channel norm over the input axis).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


class WNDense1x1(nn.Module):
    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin, cout = self.in_features, self.out_features
        bound = 1.0 / math.sqrt(cin)
        v = self.param(
            "v",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (cin, cout),
        )
        g = self.param(
            "g",
            lambda key, shape: jnp.linalg.norm(v, axis=0).reshape(shape),
            (cout,),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=0, keepdims=True))
        w = v * (g[None, :] / jnp.maximum(norm, 1e-32))
        # highest precision: these k=1 projections feed the codebook
        # nearest-neighbor search whose argmax must be bit-stable
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32,
                    precision="highest")
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (cout,))
            y = y + b
        return y.astype(x.dtype)
