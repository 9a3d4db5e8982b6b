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


# ------------------------------------------------------------------ approx
# Measured on v5e (b8 x (441344, 96)): jnp.sin costs 9.6 ms per snake while
# the identical op without the transcendental is 0.8 ms (= memory floor) —
# the decoder is sin()-bound, not conv- or HBM-bound. The polynomial below
# replaces sin^2 with a Cody-Waite period-pi range reduction plus a
# degree-6 Chebyshev-node least-squares fit in r^2 (pipeline max abs error
# 2.6e-7 in f32 over |alpha*x| <= 40 — within ~2x of f32 jnp.sin's own
# rounding, and the fit itself is 2.6e-10 in f64), turning snake back into
# a ~memory-bound VPU chain.
_INV_PI = 1.0 / 3.14159265358979323846
# pi split for Cody-Waite: PI_HI exact in f32, PI_LO the f32 remainder —
# r = (u - k*PI_HI) - k*PI_LO keeps the reduction exact for the k (tens)
# these activations reach, where single-constant pi loses ~1e-6.
_PI_HI = 3.140625
_PI_LO = 9.67653589793e-04
# sin^2(r) ~= s * P(s), s = r^2, r in [-pi/2, pi/2], P degree 6
_SIN2_C = (
    1.000000000e+00, -3.333333305e-01, 4.444442364e-02, -3.174549052e-03,
    1.410278879e-04, -4.235064360e-06, 8.151456250e-08,
)


def snake_approx(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake with polynomial sin^2 (fast mode).

    Not structurally bit-identical to :func:`snake_reference` (|sin^2
    error| <= 2.6e-7 — comparable to f32 sin's own rounding), so the
    encode->codes path keeps exact sin by default; the inference wrapper
    enables it for the decoder (infer/fast.py), with the encoder side an
    explicit opt-in (``encode_snake_approx``).
    """
    f32 = jnp.float32
    xf = x.astype(f32)
    af = alpha.astype(f32)
    u = af * xf
    # Cody-Waite period-pi reduction: r in [-pi/2, pi/2]
    k = jnp.round(u * _INV_PI)
    r = (u - k * _PI_HI) - k * _PI_LO
    s = r * r
    acc = jnp.asarray(_SIN2_C[-1], f32)
    for c in _SIN2_C[-2::-1]:
        acc = acc * s + c
    sin2 = s * acc
    return (xf + sin2 * (1.0 / (af + 1e-9))).astype(x.dtype)
