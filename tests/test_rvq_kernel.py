"""Fused RVQ kernel: parity with the module path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.models.quantize import VBRResidualVectorQuantize
from vrvq_tpu.ops.rvq_kernel import (
    fused_rvq, fused_rvq_reference, quantize_fused, stack_quantizer_weights,
)


@pytest.fixture(scope="module")
def quantizer():
    m = VBRResidualVectorQuantize(
        input_dim=128, n_codebooks=4, codebook_size=128, codebook_dim=8,
        level_min=0.125, level_max=6.0,
    )
    z = jnp.zeros((2, 16, 128))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
         "vbr_dropout": jax.random.PRNGKey(2)},
        z, feat_enc=z, level=1.0,
    )
    return m, variables


def test_reference_matches_module(quantizer):
    m, variables = quantizer
    rng = np.random.RandomState(0)
    z = jnp.asarray(rng.randn(2, 16, 128).astype(np.float32))
    out = m.apply(variables, z, feat_enc=z, level=100.0)  # all stages on

    wi, bi, wo, bo, cb = stack_quantizer_weights(
        variables["params"], m.n_codebooks
    )
    z_q, codes = fused_rvq_reference(z.reshape(-1, 128), wi, bi, wo, bo, cb)
    np.testing.assert_array_equal(
        codes.reshape(2, 16, 4).transpose(0, 2, 1), np.asarray(out["codes"])
    )
    np.testing.assert_allclose(
        z_q.reshape(2, 16, 128), np.asarray(out["z_q"]), rtol=1e-4, atol=1e-5
    )


def test_pallas_interpret_matches_reference(quantizer):
    m, variables = quantizer
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(300, 128).astype(np.float32))  # non-multiple of block
    mask = jnp.asarray((rng.rand(300, 4) > 0.3).astype(np.float32))

    wi, bi, wo, bo, cb = stack_quantizer_weights(
        variables["params"], m.n_codebooks
    )
    ref_zq, ref_codes = fused_rvq_reference(z, wi, bi, wo, bo, cb, mask)
    ker_zq, ker_codes = fused_rvq(z, wi, bi, wo, bo, cb, mask,
                                  block_f=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(ker_codes), np.asarray(ref_codes))
    np.testing.assert_allclose(np.asarray(ker_zq), np.asarray(ref_zq),
                               rtol=1e-5, atol=1e-5)


def test_quantize_fused_wrapper_vbr_gating(quantizer):
    m, variables = quantizer
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(2, 16, 128).astype(np.float32))
    out = m.apply(variables, z, feat_enc=z, level=0.5)
    mask = out["mask_imp"]
    z_q, codes = quantize_fused(m, variables, z, mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(out["codes"]))
    np.testing.assert_allclose(np.asarray(z_q), np.asarray(out["z_q"]),
                               rtol=1e-4, atol=1e-5)
