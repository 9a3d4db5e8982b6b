"""Training state pytree + optimizer construction.

Reference: scripts/train.py:117-229 (State dataclass + load()). The
generator/discriminator params, both AdamW states, and the step counter
live in one flax.struct pytree so the whole update is a single jit'd
function over donated buffers.

ZeRO note: the reference shards AdamW state across ranks
(ZeroRedundancyOptimizer, scripts/train.py:185-188). At 82M params the
replicated opt state is ~1 GB in f32 — comfortably inside one TPU chip's
HBM, so the default here is replication; pass ``zero=True`` to shard the
optimizer state over the data axis (params stay replicated, updates
all-gather over ICI).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from flax import struct

from .schedule import exponential_lr


@struct.dataclass
class TrainState:
    step: jax.Array
    gen_params: Any
    disc_params: Any
    opt_g: Any
    opt_d: Any


def make_optimizer(
    lr: float = 1e-4,
    betas=(0.8, 0.99),
    weight_decay: float = 1e-2,
    gamma: float = 0.999996,
    warmup: int = 0,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW + ExponentialLR(+warmup) + grad clipping
    (reference: scripts/train.py:42,64-76,293-297: clip 10.0 disc / 1e3 gen).
    """
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            learning_rate=exponential_lr(lr, gamma, warmup),
            b1=betas[0],
            b2=betas[1],
            eps=1e-8,
            weight_decay=weight_decay,
        )
    )
    return optax.chain(*chain)
