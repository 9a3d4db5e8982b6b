"""Fused ResidualUnit kernel + fast decoder: parity with the module path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.models.dac_vrvq import Decoder
from vrvq_tpu.nn.layers import ResidualUnit
from vrvq_tpu.ops.residual_kernel import (
    fast_decoder_apply, fused_residual_unit, fused_residual_unit_reference,
    _ru_params,
)


@pytest.mark.parametrize("dilation", [1, 3, 9])
def test_fused_ru_matches_module(dilation):
    c = 16
    unit = ResidualUnit(dim=c, dilation=dilation)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 600, c).astype(np.float32) * 0.5)
    params = unit.init(jax.random.PRNGKey(0), x)
    ref = unit.apply(params, x)

    a1, w7, b7, a2, w1, b1 = _ru_params(params["params"])
    out_x = fused_residual_unit_reference(x, a1, w7, b7, a2, w1, b1,
                                          dilation=dilation)
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    out_k = fused_residual_unit(x, a1, w7, b7, a2, w1, b1,
                                dilation=dilation, t_blk=512, interpret=True,
                                mxu_dtype='float32')
    out_b = fused_residual_unit(x, a1, w7, b7, a2, w1, b1,
                                dilation=dilation, t_blk=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_ru_non_multiple_length():
    c = 8
    unit = ResidualUnit(dim=c, dilation=3)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 777, c).astype(np.float32) * 0.5)
    params = unit.init(jax.random.PRNGKey(0), x)
    ref = unit.apply(params, x)
    a1, w7, b7, a2, w1, b1 = _ru_params(params["params"])
    out = fused_residual_unit(x, a1, w7, b7, a2, w1, b1, dilation=3,
                              t_blk=512, interpret=True, mxu_dtype='float32')
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fast_decoder_matches_module():
    rates = (8, 8, 4, 2)
    dec = Decoder(input_channel=32, channels=64, rates=rates)
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(1, 12, 32).astype(np.float32) * 0.5)
    params = dec.init(jax.random.PRNGKey(0), z)
    ref = dec.apply(params, z)
    out = fast_decoder_apply(params["params"], z, rates=rates, channels=64,
                             t_blk=512, interpret=True, mxu_dtype='float32')
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_level_sweep_fast_path_matches():
    """LevelSweep(fast=True) (interpret-mode kernels on CPU) matches the
    module decode path."""
    from vrvq_tpu.models import DAC_VRVQ
    from vrvq_tpu.infer.sweep import LevelSweep
    import vrvq_tpu.ops.residual_kernel as rk

    m = DAC_VRVQ(encoder_dim=8, decoder_dim=64, n_codebooks=2,
                 codebook_size=16, codebook_dim=4, model_type="VBR",
                 level_min=0.125, level_max=6.0)
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, jnp.zeros((1, 1, 2048)), level=1.0)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(1, 1, 2048).astype(np.float32) * 0.1)

    slow = LevelSweep(m, params, fast=False)
    fast = LevelSweep(m, params, fast=True)
    enc = slow.encode(audio)
    a_slow, _ = slow.decode_at_level(enc, 1.0)
    a_fast, _ = fast.decode_at_level(enc, 1.0)
    np.testing.assert_allclose(np.asarray(a_fast), np.asarray(a_slow),
                               rtol=1e-4, atol=1e-5)
