"""Mask-generation tests: logcosh numerics vs torch oracle + STE gradients."""

import math

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vrvq_tpu.ops.masks import (
    logcosh, generate_mask_ste, generate_mask_hard, generate_mask_ste_moe,
)


def _torch_logcosh(alpha, pmk):
    """Direct re-expression of reference models/utils.py:11-32."""
    EPS = 1e-10
    mask1 = pmk >= 0
    pmk1 = pmk * mask1
    numer1 = math.exp(alpha) + torch.exp(-2 * pmk1 * alpha)
    denom1 = torch.exp(alpha * (-2 * pmk1 + 1)) + 1
    m1 = (torch.log(numer1 + EPS) - torch.log(denom1 + EPS)) / (2 * alpha) + 0.5
    mask2 = pmk < 0
    pmk2 = pmk * mask2
    numer2 = torch.exp(alpha * (2 * pmk2 + 1)) + 1
    denom2 = math.exp(alpha) + torch.exp(alpha * 2 * pmk2)
    m2 = (torch.log(numer2 + EPS) - torch.log(denom2 + EPS)) / (2 * alpha) + 0.5
    return m1 * mask1 + m2 * mask2


def test_logcosh_matches_torch():
    rng = np.random.RandomState(0)
    x = (rng.randn(2, 8, 30) * 10).astype(np.float32)
    for alpha in (1.0, 2.0, 4.0):
        ref = _torch_logcosh(alpha, torch.tensor(x)).numpy()
        out = np.asarray(logcosh(alpha, jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_logcosh_extreme_values_stable():
    x = jnp.asarray([[-1e4, -50.0, 0.0, 50.0, 1e4]]).reshape(1, 1, 5)
    out = np.asarray(logcosh(2.0, x))
    assert np.all(np.isfinite(out))
    assert out[0, 0, 0] <= 0.01 and out[0, 0, -1] >= 0.99


def test_generate_mask_hard_monotone():
    imp = jnp.asarray(np.linspace(0, 8, 20).reshape(1, 1, 20).astype(np.float32))
    mask = np.asarray(generate_mask_hard(imp, 8))
    assert mask.shape == (1, 8, 20)
    # stage i on iff imp >= i; stage 0 on whenever imp >= 0
    for i in range(8):
        np.testing.assert_array_equal(
            mask[0, i], (np.linspace(0, 8, 20) >= i).astype(np.float32)
        )


def test_generate_mask_ste_forward_is_hard():
    rng = np.random.RandomState(1)
    imp = jnp.asarray((rng.rand(2, 1, 16) * 8).astype(np.float32))
    ste = np.asarray(generate_mask_ste(imp, 8, alpha=2.0))
    hard = np.asarray(generate_mask_hard(imp, 8))
    np.testing.assert_array_equal(ste, hard)


def test_generate_mask_ste_gradient_is_smooth():
    """STE backward = logcosh gradient, not the (zero) hard-mask gradient."""
    imp = jnp.asarray(np.full((1, 1, 4), 1.5, np.float32))

    def f(x):
        return jnp.sum(generate_mask_ste(x, 4, alpha=2.0))

    def f_smooth(x):
        thresholds = jnp.arange(4, dtype=x.dtype).reshape(1, 4, 1)
        return jnp.sum(logcosh(2.0, x - thresholds))

    g = jax.grad(f)(imp)
    g_smooth = jax.grad(f_smooth)(imp)
    assert np.abs(np.asarray(g)).max() > 0
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_smooth), rtol=1e-5)


def test_generate_mask_ste_moe():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 6, 10).astype(np.float32))
    mask = np.asarray(generate_mask_ste_moe(x, 6, ns=2))
    assert np.all(mask[:, :2] == 1.0)
    np.testing.assert_array_equal(
        mask[:, 2:], (np.asarray(x)[:, 2:] >= 0.5).astype(np.float32)
    )
