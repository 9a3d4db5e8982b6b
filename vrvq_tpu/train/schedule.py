"""LR schedules: per-step exponential decay with optional linear warmup.

Reference: scripts/train.py:64-76 (ExponentialLR gamma=0.999996 stepped
every iteration; warmup ramps linearly then decays).
"""

from __future__ import annotations

import jax.numpy as jnp


def exponential_lr(base_lr: float, gamma: float = 1.0, warmup: int = 0):
    """Returns an optax-compatible schedule fn step -> lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        decay = base_lr * jnp.power(gamma, jnp.maximum(step - warmup, 0.0))
        if warmup == 0:
            return decay
        ramp = base_lr * step / max(1, warmup)
        return jnp.where(step < warmup, ramp, decay)

    return schedule
