"""Snake activation: ``x + sin^2(alpha * x) / (alpha + 1e-9)``.

Reference: models/layers.py:26-32 (torch.jit.script'd there for a claimed
1.4x speedup). On TPU the plain jnp expression is a VPU elementwise chain
that XLA fuses into the neighboring convolution's epilogue, so the default
path is pure XLA. A Pallas kernel is provided for the standalone case (large
activations streamed HBM->VMEM once instead of materializing sin/square
temporaries) and is used by the fused inference pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def snake_reference(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA snake. ``x``: (..., C) channels-last; ``alpha``: (C,)."""
    s = jnp.sin(alpha * x)
    return x + (1.0 / (alpha + 1e-9)) * (s * s)


def _snake_kernel(x_ref, alpha_ref, out_ref):
    x = x_ref[...]
    alpha = alpha_ref[...]
    s = jnp.sin(alpha * x)
    out_ref[...] = x + (s * s) / (alpha + 1e-9)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def snake_pallas(x: jnp.ndarray, alpha: jnp.ndarray, block_t: int = 512,
                 interpret: bool = False) -> jnp.ndarray:
    """Pallas snake for (B, T, C) blocks; one pass over HBM.

    Only used when the activation is not adjacent to a conv XLA could fuse
    it into; falls back to the XLA path for awkward shapes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if x.ndim != 3 or x.shape[1] % block_t != 0:
        return snake_reference(x, alpha)
    b, t, c = x.shape
    grid = (b, t // block_t)
    return pl.pallas_call(
        _snake_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, alpha.astype(x.dtype))


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Default snake entrypoint: XLA expression (fuses into conv epilogues)."""
    return snake_reference(x, alpha)
