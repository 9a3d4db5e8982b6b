"""Importance-map -> codebook-mask generation with straight-through estimators.

Reference: models/utils.py:11-61. The scaled importance map ``x`` (B, 1, T)
is compared against per-stage thresholds 0..Nq-1; stage i of the RVQ is kept
for a frame iff ``x - i >= 0``. Training uses a smooth logcosh sigmoid-step
with a straight-through hard mask so gradients flow into the importance
subnet.

All functions take/return the reference shapes: ``x`` (B, 1, T) or
(B, Nq, T), masks (B, Nq, T). Everything is elementwise VPU work that XLA
fuses with the masked z_q summation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPS = 1e-10


def logcosh(alpha: float, pmk: jnp.ndarray) -> jnp.ndarray:
    """Smooth step in [0, 1] centered at 0, split into pmk>=0 / pmk<0
    branches for numerical stability (reference: models/utils.py:11-32)."""
    mask1 = (pmk >= 0).astype(pmk.dtype)
    pmk1 = pmk * mask1
    numer1 = math.exp(alpha) + jnp.exp(-2.0 * pmk1 * alpha)
    denom1 = jnp.exp(alpha * (-2.0 * pmk1 + 1.0)) + 1.0
    m1 = (jnp.log(numer1 + EPS) - jnp.log(denom1 + EPS)) / (2.0 * alpha) + 0.5

    mask2 = (pmk < 0).astype(pmk.dtype)
    pmk2 = pmk * mask2
    numer2 = jnp.exp(alpha * (2.0 * pmk2 + 1.0)) + 1.0
    denom2 = math.exp(alpha) + jnp.exp(alpha * 2.0 * pmk2)
    m2 = (jnp.log(numer2 + EPS) - jnp.log(denom2 + EPS)) / (2.0 * alpha) + 0.5

    return m1 * mask1 + m2 * mask2


def _stage_thresholds(nq: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.arange(nq, dtype=dtype).reshape(1, nq, 1)


def generate_mask_ste(x: jnp.ndarray, nq: int, alpha: float = 1.0) -> jnp.ndarray:
    """Soft-quantized mask with straight-through hard values.

    ``x``: (B, 1, T) scaled importance map. Returns (B, Nq, T) whose forward
    value is the hard mask and whose gradient is the logcosh smooth mask
    (reference: models/utils.py:45-53).
    """
    xmnq = x - _stage_thresholds(nq, x.dtype)
    mask_smooth = logcosh(alpha, xmnq)
    mask_quant = (xmnq >= 0).astype(x.dtype)
    return mask_smooth + jax.lax.stop_gradient(mask_quant - mask_smooth)


def generate_mask_hard(x: jnp.ndarray, nq: int) -> jnp.ndarray:
    """Hard mask: stage i on iff ``x - i >= 0``; stage 0 is always on for a
    sigmoid importance map (reference: models/utils.py:55-61)."""
    xmnq = x - _stage_thresholds(nq, x.dtype)
    return (xmnq >= 0).astype(x.dtype)


def generate_mask_ste_moe(
    x: jnp.ndarray, nq: int, alpha: float = 1.0, ns: int = 2
) -> jnp.ndarray:
    """MOE-router mask: per-stage scores thresholded at 0.5, first ``ns``
    stages forced on; STE forward=hard / grad=scores
    (reference: models/utils.py:34-43; alpha is accepted but unused there too).
    """
    del alpha
    stage = jnp.arange(nq).reshape(1, nq, 1)
    forced = stage < ns
    xm = jnp.where(forced, jnp.ones_like(x), x)
    mask_quant = (xm >= 0.5).astype(x.dtype)
    return xm + jax.lax.stop_gradient(mask_quant - xm)
