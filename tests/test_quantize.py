"""Quantizer tests: VQ index parity vs torch, RVQ round trips, VBR paths."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vrvq_tpu.models.quantize import (
    VectorQuantize, ResidualVectorQuantize, VBRResidualVectorQuantize,
)
from tests import torch_oracle as oracle


def test_vq_indices_bit_exact_vs_torch():
    """Codebook indices must match torch exactly (BASELINE north-star)."""
    rng = np.random.RandomState(0)
    b, t, d, k = 3, 50, 8, 256
    latents = rng.randn(b, d, t).astype(np.float32)
    codebook = rng.randn(k, d).astype(np.float32)

    _, ref_idx = oracle.vq_decode_latents(
        torch.tensor(latents), torch.tensor(codebook)
    )

    vq = VectorQuantize(input_dim=16, codebook_size=k, codebook_dim=d)
    variables = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)))
    variables = jax.tree_util.tree_map(lambda x: x, variables)
    params = dict(variables["params"])
    params["codebook"] = jnp.asarray(codebook)
    z_q, idx = vq.apply(
        {"params": params},
        jnp.asarray(latents.transpose(0, 2, 1)),
        method=VectorQuantize.decode_latents,
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx.numpy())
    # z_q is the raw (unnormalized) codebook vector
    np.testing.assert_allclose(
        np.asarray(z_q), codebook[np.asarray(idx)], rtol=1e-6
    )


def _init_rvq(cls, **kw):
    m = cls(input_dim=32, n_codebooks=4, codebook_size=64, codebook_dim=4, **kw)
    z = jnp.zeros((2, 10, 32))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
         "vbr_dropout": jax.random.PRNGKey(2)},
        z, **({"feat_enc": z, "level": 1.0} if cls is VBRResidualVectorQuantize else {}),
    )
    return m, variables


def test_rvq_eval_shapes_and_reconstruction():
    m, variables = _init_rvq(ResidualVectorQuantize)
    rng = np.random.RandomState(1)
    z = jnp.asarray(rng.randn(2, 10, 32).astype(np.float32))
    out = m.apply(variables, z)
    assert out["z_q"].shape == (2, 10, 32)
    assert out["codes"].shape == (2, 4, 10)
    assert out["latents"].shape == (2, 10, 16)
    # from_codes must reproduce the quantized representation exactly
    z_q2, z_p, codes = m.apply(variables, out["codes"],
                               method=ResidualVectorQuantize.from_codes)
    np.testing.assert_allclose(
        np.asarray(z_q2), np.asarray(out["z_q"]), rtol=1e-5, atol=1e-5
    )
    # from_latents recovers the same codes
    _, _, codes2 = m.apply(variables, out["latents"],
                           method=ResidualVectorQuantize.from_latents)
    np.testing.assert_array_equal(np.asarray(codes2), np.asarray(out["codes"]))


@pytest.mark.parametrize("n_q", [1, 2, 4])
def test_rvq_eval_truncation(n_q):
    """Eval with n_quantizers=k runs exactly k stages (reference break)."""
    m, variables = _init_rvq(ResidualVectorQuantize)
    rng = np.random.RandomState(2)
    z = jnp.asarray(rng.randn(2, 10, 32).astype(np.float32))
    out = m.apply(variables, z, n_quantizers=n_q)
    assert out["codes"].shape == (2, n_q, 10)
    # first stages agree with the full run
    full = m.apply(variables, z)
    np.testing.assert_array_equal(
        np.asarray(out["codes"]), np.asarray(full["codes"][:, :n_q])
    )


def test_rvq_train_mode_runs_all_stages():
    m, variables = _init_rvq(ResidualVectorQuantize, quantizer_dropout=0.5)
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(4, 10, 32).astype(np.float32))
    out = m.apply(variables, z, train=True,
                  rngs={"vbr": jax.random.PRNGKey(7)})
    assert out["codes"].shape == (4, 4, 10)
    assert np.isfinite(float(out["commitment_loss"]))


def test_vbr_eval_level_controls_mask():
    m, variables = _init_rvq(
        VBRResidualVectorQuantize,
        level_min=0.125, level_max=6.0, full_codebook_rate=0.25,
    )
    rng = np.random.RandomState(4)
    z = jnp.asarray(rng.randn(2, 10, 32).astype(np.float32))
    lo = m.apply(variables, z, feat_enc=z, level=0.01)
    hi = m.apply(variables, z, feat_enc=z, level=100.0)
    # stage 0 is always on (sigmoid > 0); high level turns everything on
    assert np.all(np.asarray(lo["mask_imp"])[:, 0] == 1.0)
    assert np.asarray(lo["mask_imp"]).sum() <= np.asarray(hi["mask_imp"]).sum()
    assert np.all(np.asarray(hi["mask_imp"]) == 1.0)
    assert lo["imp_map"].shape == (2, 1, 10)
    assert lo["z_q_is"].shape == (2, 4, 10, 32)
    # masked sum identity
    zq = (np.asarray(lo["z_q_is"]) * np.asarray(lo["mask_imp"])[:, :, :, None]).sum(1)
    np.testing.assert_allclose(zq, np.asarray(lo["z_q"]), rtol=1e-5, atol=1e-6)


def test_vbr_cbr_fallback():
    m, variables = _init_rvq(
        VBRResidualVectorQuantize, level_min=0.125, level_max=6.0,
    )
    rng = np.random.RandomState(5)
    z = jnp.asarray(rng.randn(2, 10, 32).astype(np.float32))
    out = m.apply(variables, z, n_quantizers=2)
    assert out["codes"].shape == (2, 2, 10)
    assert out["imp_map"] is None
    assert np.all(np.asarray(out["mask_imp"]) == 1.0)


def test_vbr_train_batch_partition():
    bs = 8
    m = VBRResidualVectorQuantize(
        input_dim=32, n_codebooks=4, codebook_size=64, codebook_dim=4,
        quantizer_dropout=0.25, full_codebook_rate=0.25,
        level_min=0.125, level_max=6.0,
    )
    z = jnp.zeros((bs, 10, 32))
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
         "vbr_dropout": jax.random.PRNGKey(2)},
        z, feat_enc=z, level=1.0,
    )
    rng = np.random.RandomState(6)
    z = jnp.asarray(rng.randn(bs, 10, 32).astype(np.float32))
    out = m.apply(
        variables, z, feat_enc=z, train=True,
        rngs={"vbr": jax.random.PRNGKey(3), "vbr_dropout": jax.random.PRNGKey(4)},
    )
    mask = np.asarray(out["mask_imp"])
    n_full = int(bs * 0.25)
    n_dropout = int(bs * 0.25)
    n_imps = bs - n_full - n_dropout
    # imp_map output only covers the importance-partition samples
    assert out["imp_map"].shape == (n_imps, 1, 10)
    # full-codebook partition is all ones
    assert np.all(mask[n_imps + n_dropout:] == 1.0)
    # dropout partition is a per-sample constant-depth mask
    dp = mask[n_imps:n_imps + n_dropout]
    for i in range(n_dropout):
        depths = dp[i].sum(axis=0)
        assert np.all(depths == depths[0])
        assert 1 <= depths[0] <= 4


def test_vbr_from_codes_with_mask():
    """codes+mask -> z_q must equal the masked sum of per-stage z_q_is."""
    m, variables = _init_rvq(
        VBRResidualVectorQuantize, level_min=0.125, level_max=6.0,
    )
    rng = np.random.RandomState(7)
    z = jnp.asarray(rng.randn(2, 10, 32).astype(np.float32))
    out = m.apply(variables, z, feat_enc=z, level=0.5)
    z_q2, _, _ = m.apply(
        variables, out["codes"], out["mask_imp"],
        method=VBRResidualVectorQuantize.from_codes,
    )
    np.testing.assert_allclose(
        np.asarray(z_q2), np.asarray(out["z_q"]), rtol=1e-5, atol=1e-6
    )


def test_decode_latents_tie_break_first_index():
    """Exact distance ties must resolve to the FIRST codebook index
    (torch .max semantics, reference models/quantize.py:101)."""
    vq = VectorQuantize(input_dim=8, codebook_size=4, codebook_dim=2)
    variables = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 8)))
    params = dict(variables["params"])
    # duplicate codebook rows -> guaranteed ties
    cb = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]], np.float32)
    params["codebook"] = jnp.asarray(cb)
    latents = jnp.asarray(np.array([[[2.0, 0.0], [0.0, 3.0]]], np.float32))
    _, idx = vq.apply({"params": params}, latents,
                      method=VectorQuantize.decode_latents)
    np.testing.assert_array_equal(np.asarray(idx), [[0, 2]])
