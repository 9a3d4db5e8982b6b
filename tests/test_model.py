"""Top-model tests: forward shapes, encode/decode API, receptive field.

Mirrors + extends the reference's only test (test_model.py:8-41).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.models import DAC_VRVQ, DAC_MOE

TINY = dict(
    encoder_dim=8,
    encoder_rates=(2, 4, 8, 8),
    decoder_dim=128,
    decoder_rates=(8, 8, 4, 2),
    n_codebooks=4,
    codebook_size=32,
    codebook_dim=4,
    sample_rate=44100,
)


def _init(model, x, train=False):
    rngs = {
        "params": jax.random.PRNGKey(0),
        "vbr": jax.random.PRNGKey(1),
        "vbr_dropout": jax.random.PRNGKey(2),
    }
    return model.init(rngs, x, level=1.0, train=train)


@pytest.fixture(scope="module")
def vbr_model():
    m = DAC_VRVQ(model_type="VBR", level_min=0.125, level_max=6.0,
                 full_codebook_rate=0.25, **TINY)
    x = jnp.zeros((2, 1, 2048))
    return m, _init(m, x)


def test_vbr_forward_shapes(vbr_model):
    m, params = vbr_model
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 1, 2000).astype(np.float32))
    out = m.apply(params, x, level=1.0)
    assert out["audio"].shape == (2, 1, 2000)
    frames = 2048 // 512
    assert out["z"].shape == (2, 128, frames)
    assert out["codes"].shape == (2, 4, frames)
    assert out["latents"].shape == (2, 16, frames)
    assert out["imp_map"].shape == (2, 1, frames)
    assert out["mask_imp"].shape == (2, 4, frames)
    assert np.all(np.abs(np.asarray(out["audio"])) <= 1.0)  # tanh output


def test_vbr_encode_decode_roundtrip(vbr_model):
    """encode once -> remask -> decode: the canonical VBR inference pattern
    (reference scripts/inference.py:88-119)."""
    from vrvq_tpu.ops.masks import generate_mask_hard

    m, params = vbr_model
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 1, 2048).astype(np.float32))
    enc = m.apply(params, x, level=1.0, method=DAC_VRVQ.encode)
    imp = enc["imp_map"]
    for level in (0.2, 1.0, 3.0):
        mask = generate_mask_hard(imp * level * m.n_codebooks, m.n_codebooks)
        z_q = jnp.sum(enc["z_q_is"] * mask[:, :, None, :], axis=1)
        audio = m.apply(params, z_q, method=DAC_VRVQ.decode)
        assert audio.shape == (1, 1, 2048)


def test_vbr_decode_from_codes(vbr_model):
    m, params = vbr_model
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 1, 2048).astype(np.float32))
    enc = m.apply(params, x, level=1.0, method=DAC_VRVQ.encode)
    audio_codes = m.apply(params, enc["codes"], enc["mask_imp"],
                          method=DAC_VRVQ.decode_from_codes)
    audio_direct = m.apply(params, enc["z_q"], method=DAC_VRVQ.decode)
    np.testing.assert_allclose(
        np.asarray(audio_codes), np.asarray(audio_direct), rtol=1e-4, atol=1e-5
    )


def test_cbr_forward(vbr_model):
    m = DAC_VRVQ(model_type="CBR", quantizer_dropout=0.5, **TINY)
    x = jnp.zeros((2, 1, 2048))
    params = _init(m, x)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 1, 2048).astype(np.float32))
    out = m.apply(params, x, n_quantizers=2)
    assert out["codes"].shape == (2, 2, 4)
    assert out["imp_map"] is None


def test_moe_forward():
    m = DAC_MOE(model_type="VBR", level_min=1.0, level_max=1.0,
                full_codebook_rate=0.25, **TINY)
    x = jnp.zeros((2, 1, 2048))
    params = _init(m, x)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 1, 2048).astype(np.float32))
    out = m.apply(params, x, level=1.0)
    assert out["audio"].shape == (2, 1, 2048)
    assert out["mask_imp"].shape == (2, 4, 4)
    # first Ns=2 stages forced on by the MOE mask
    assert np.all(np.asarray(out["mask_imp"])[:, :2] == 1.0)


def test_train_mode_runs(vbr_model):
    m, params = vbr_model
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 1, 2048).astype(np.float32))
    out = m.apply(
        params, x, level=1.0, train=True,
        rngs={"vbr": jax.random.PRNGKey(3), "vbr_dropout": jax.random.PRNGKey(4)},
    )
    assert np.isfinite(float(out["vq/commitment_loss"]))
    assert np.isfinite(float(out["vq/codebook_loss"]))


@pytest.mark.slow
def test_gradients_flow_to_encoder(vbr_model):
    """Backward works end-to-end and reaches the encoder + importance subnet
    through the STE (reference test_model.py checks backward runs)."""
    m, params = vbr_model
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 1, 2048).astype(np.float32))

    def loss_fn(p):
        out = m.apply(
            p, x, level=1.0, train=True,
            rngs={"vbr": jax.random.PRNGKey(3),
                  "vbr_dropout": jax.random.PRNGKey(4)},
        )
        return (
            jnp.mean(jnp.abs(out["audio"]))
            + out["vq/commitment_loss"]
            + jnp.mean(out["imp_map"])
        )

    grads = jax.grad(loss_fn)(params)
    g_enc = grads["params"]["encoder"]["in_conv"]["v"]
    g_imp = grads["params"]["quantizer"]["imp_subnet"]["in_conv"]["v"]
    assert float(jnp.abs(g_enc).sum()) > 0
    assert float(jnp.abs(g_imp).sum()) > 0


def test_receptive_field_finite():
    """Receptive field via input-gradient support (reference test_model.py:30-41).

    The CBR topology's analytic two-sided receptive field is ~2*delay+1
    (delay 7904 for the [2,4,8,8]/[8,8,4,2] stack), so a 32768-sample window
    must contain it.
    """
    from vrvq_tpu.models import codec

    m = DAC_VRVQ(model_type="CBR", **TINY)
    T = 32768
    x = jnp.zeros((1, 1, T))
    params = _init(m, x)

    def center_out(xin):
        out = m.apply(params, xin, n_quantizers=1)
        return out["audio"][0, 0, T // 2]

    g = jax.grad(center_out)(x)
    support = np.nonzero(np.asarray(g)[0, 0])[0]
    assert len(support) > 0
    rf = support.max() - support.min() + 1
    specs = codec.model_conv_specs(
        TINY["encoder_rates"], TINY["decoder_rates"], TINY["n_codebooks"],
        vbr=False,
    )
    analytic = 2 * codec.delay(specs) + 4 * m.hop_length
    assert 1000 < rf <= analytic
    assert rf < T


@pytest.mark.slow
def test_flagship_param_counts_match_reference():
    """Parameter counts of the full-size vrvq_a2 topology must match the
    reference-derived sizes (SURVEY: enc 22.3M + dec 54.1M + RVQ 0.21M +
    imp 4.9M = 81.6M gen; disc 42.5M)."""
    m = DAC_VRVQ(
        encoder_dim=64, encoder_rates=(2, 4, 8, 8), decoder_dim=1536,
        decoder_rates=(8, 8, 4, 2), n_codebooks=8, codebook_size=1024,
        codebook_dim=8, model_type="VBR", level_min=0.125, level_max=6.0,
    )
    params = _init(m, jnp.zeros((1, 1, 1024)))
    tree = params["params"]

    def count(sub):
        return sum(x.size for x in jax.tree_util.tree_leaves(sub))

    assert abs(count(tree["encoder"]) / 1e6 - 22.31) < 0.05
    assert abs(count(tree["decoder"]) / 1e6 - 54.10) < 0.05
    assert abs(count(tree) / 1e6 - 81.56) < 0.1


def test_encode_precision_option(vbr_model):
    """``encode_precision='highest'`` is compute-only: same param tree, and
    on CPU (always f32 convs) identical codes. On TPU it makes codes match
    this CPU path bit-for-bit (measured: default precision flips ~2.5% of
    flagship indices; see BASELINE.md)."""
    import dataclasses

    m, params = vbr_model
    m_exact = dataclasses.replace(m, encode_precision="highest")
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 1, 2048).astype(np.float32))
    out = m.apply(params, x, level=1.0)
    out_exact = m_exact.apply(params, x, level=1.0)
    np.testing.assert_array_equal(np.asarray(out["codes"]),
                                  np.asarray(out_exact["codes"]))
    np.testing.assert_array_equal(np.asarray(out["mask_imp"]),
                                  np.asarray(out_exact["mask_imp"]))
