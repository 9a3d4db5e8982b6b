"""LSGAN adversarial + feature-matching losses.

Reference: models/loss.py:404-447. Functional form (discriminator params
passed explicitly) so the two-optimizer train step can take gradients wrt
generator and discriminator params independently within one jit program.
"""

from __future__ import annotations

from typing import Any, List

import jax
import jax.numpy as jnp


def discriminator_loss(fmaps_fake: List[List[jnp.ndarray]],
                       fmaps_real: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """LSGAN disc loss: mean(fake^2) + mean((1-real)^2) over the final
    logit map of each sub-discriminator (reference: models/loss.py:421-428).
    The fake branch must already be stop_gradient'd by the caller."""
    loss_d = 0.0
    for f, r in zip(fmaps_fake, fmaps_real):
        loss_d = loss_d + jnp.mean(jnp.square(f[-1]))
        loss_d = loss_d + jnp.mean(jnp.square(1.0 - r[-1]))
    return loss_d


def generator_loss(fmaps_fake: List[List[jnp.ndarray]],
                   fmaps_real: List[List[jnp.ndarray]]):
    """LSGAN gen loss + L1 feature matching over all feature maps except the
    final logits (reference: models/loss.py:430-447)."""
    loss_g = 0.0
    for f in fmaps_fake:
        loss_g = loss_g + jnp.mean(jnp.square(1.0 - f[-1]))

    loss_feature = 0.0
    for f, r in zip(fmaps_fake, fmaps_real):
        for j in range(len(f) - 1):
            loss_feature = loss_feature + jnp.mean(
                jnp.abs(f[j] - jax.lax.stop_gradient(r[j]))
            )
    return loss_g, loss_feature


class GANLoss:
    """Object wrapper matching the reference API shape
    (reference: models/loss.py:404-447): holds a Discriminator module and
    its params; exposes discriminator_loss / generator_loss on signals."""

    def __init__(self, discriminator, params: Any):
        self.discriminator = discriminator
        self.params = params

    def _fmaps(self, audio):
        return self.discriminator.apply(self.params, audio)

    def forward(self, fake, real):
        from ..audio import Signal

        fa = jnp.asarray(fake.audio_data if isinstance(fake, Signal) else fake)
        ra = jnp.asarray(real.audio_data if isinstance(real, Signal) else real)
        return self._fmaps(fa), self._fmaps(ra)

    def discriminator_loss(self, fake, real):
        from ..audio import Signal

        fa = jnp.asarray(fake.audio_data if isinstance(fake, Signal) else fake)
        ra = jnp.asarray(real.audio_data if isinstance(real, Signal) else real)
        d_fake = self._fmaps(jax.lax.stop_gradient(fa))
        d_real = self._fmaps(ra)
        return discriminator_loss(d_fake, d_real)

    def generator_loss(self, fake, real):
        d_fake, d_real = self.forward(fake, real)
        return generator_loss(d_fake, d_real)
