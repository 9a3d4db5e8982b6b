"""Weight-norm folding + fast-inference model (nn/fold.py, infer/fast.py).

The folded path must be numerically identical to the live weight-norm path
in f32 (same effective kernels, same conv calls), and the bf16 decoder must
agree with the f32 decoder far above the codec's own reconstruction error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vrvq_tpu.infer.fast import make_inference_model
from vrvq_tpu.nn.fold import fold_weight_norm
from vrvq_tpu.nn.layers import WNConv1d, WNConvTranspose1d


def _tiny_model():
    from vrvq_tpu.models import DAC_VRVQ

    return DAC_VRVQ(
        encoder_dim=8,
        encoder_rates=(2, 4, 4),
        decoder_dim=64,
        decoder_rates=(4, 4, 2),
        n_codebooks=4,
        codebook_size=64,
        codebook_dim=4,
        sample_rate=44100,
        model_type="VBR",
        level_min=0.125,
        level_max=6.0,
        imp2mask_alpha=2.0,
    )


def _init(model, audio):
    rngs = {
        "params": jax.random.PRNGKey(0),
        "vbr": jax.random.PRNGKey(1),
        "vbr_dropout": jax.random.PRNGKey(2),
    }
    return model.init(rngs, audio, level=1.0)


def test_folded_conv_matches_live():
    conv = WNConv1d(6, 10, kernel_size=7, padding=3, dilation=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 33, 6), jnp.float32)
    params = conv.init(jax.random.PRNGKey(3), x)
    y_live = conv.apply(params, x)

    folded = {"params": fold_weight_norm(params["params"])}
    assert set(folded["params"].keys()) == {"w", "bias"}
    import dataclasses

    y_fold = dataclasses.replace(conv, folded=True).apply(folded, x)
    np.testing.assert_allclose(np.asarray(y_live), np.asarray(y_fold),
                               rtol=1e-6, atol=1e-6)


def test_folded_transposed_conv_matches_live():
    conv = WNConvTranspose1d(6, 10, kernel_size=8, stride=4, padding=2)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 17, 6), jnp.float32)
    params = conv.init(jax.random.PRNGKey(4), x)
    y_live = conv.apply(params, x)

    # the transposed conv is only reached through its DecoderBlock name 'up'
    folded = {"params": fold_weight_norm({"up": params["params"]})["up"]}
    import dataclasses

    y_fold = dataclasses.replace(conv, folded=True).apply(folded, x)
    np.testing.assert_allclose(np.asarray(y_live), np.asarray(y_fold),
                               rtol=1e-6, atol=1e-6)


def test_inference_model_f32_forward_identical():
    """folded f32 model == live model: same codes, same audio (tiny tol)."""
    model = _tiny_model()
    audio = jnp.asarray(
        np.random.RandomState(2).randn(2, 1, 4096).astype(np.float32) * 0.3
    )
    params = _init(model, audio)
    fast_model, fast_params = make_inference_model(
        model, params, decode_dtype=None, snake_approx=False
    )
    out = model.apply(params, audio, level=1.0)
    out_f = fast_model.apply(fast_params, audio, level=1.0)
    np.testing.assert_array_equal(np.asarray(out["codes"]),
                                  np.asarray(out_f["codes"]))
    np.testing.assert_allclose(np.asarray(out["audio"]),
                               np.asarray(out_f["audio"]),
                               rtol=1e-5, atol=1e-6)


def test_inference_model_bf16_decode_quality():
    """bf16 folded decode: codes still bit-exact (f32 encode), audio close."""
    model = _tiny_model()
    audio = jnp.asarray(
        np.random.RandomState(3).randn(2, 1, 4096).astype(np.float32) * 0.3
    )
    params = _init(model, audio)
    fast_model, fast_params = make_inference_model(
        model, params, decode_dtype="bfloat16"
    )
    # decoder kernels genuinely bf16; quantizer subtree untouched (still
    # live weight-norm {v, g}, still f32)
    w = fast_params["params"]["decoder"]["in_conv"]["w"]
    assert w.dtype == jnp.bfloat16
    imp_in = fast_params["params"]["quantizer"]["imp_subnet"]["in_conv"]
    assert "v" in imp_in and imp_in["v"].dtype == jnp.float32
    out = model.apply(params, audio, level=1.0)
    out_f = fast_model.apply(fast_params, audio, level=1.0)
    np.testing.assert_array_equal(np.asarray(out["codes"]),
                                  np.asarray(out_f["codes"]))
    y32 = np.asarray(out["audio"], np.float64)
    y16 = np.asarray(out_f["audio"], np.float64)
    snr = 10 * np.log10(np.sum(y32 ** 2) / max(np.sum((y32 - y16) ** 2), 1e-30))
    # bf16 rounding noise: far above any useful codec SI-SDR (< ~25 dB)
    assert snr > 35.0, f"bf16 decode agreement only {snr:.1f} dB"


def test_snake_approx_decode_quality():
    """Polynomial-snake decode stays within bf16-level agreement of exact."""
    model = _tiny_model()
    audio = jnp.asarray(
        np.random.RandomState(7).randn(2, 1, 4096).astype(np.float32) * 0.3
    )
    params = _init(model, audio)
    exact_m, exact_p = make_inference_model(
        model, params, decode_dtype=None, snake_approx=False)
    approx_m, approx_p = make_inference_model(
        model, params, decode_dtype=None, snake_approx=True)
    out_e = exact_m.apply(exact_p, audio, level=1.0)
    out_a = approx_m.apply(approx_p, audio, level=1.0)
    np.testing.assert_array_equal(np.asarray(out_e["codes"]),
                                  np.asarray(out_a["codes"]))
    ye = np.asarray(out_e["audio"], np.float64)
    ya = np.asarray(out_a["audio"], np.float64)
    snr = 10 * np.log10(np.sum(ye ** 2) / max(np.sum((ye - ya) ** 2), 1e-30))
    assert snr > 60.0, f"approx snake decode agreement only {snr:.1f} dB"


@pytest.mark.slow
def test_level_sweep_with_inference_model():
    """LevelSweep on the folded bf16 model: same masks/bpf as the live one."""
    from vrvq_tpu.infer import LevelSweep

    model = _tiny_model()
    audio = jnp.asarray(
        np.random.RandomState(4).randn(1, 1, 4096).astype(np.float32) * 0.3
    )
    params = _init(model, audio)
    fast_model, fast_params = make_inference_model(model, params)

    res_live = LevelSweep(model, params).sweep(audio, levels=(0.5, 1.0))
    res_fast = LevelSweep(fast_model, fast_params).sweep(audio, levels=(0.5, 1.0))
    for lv in (0.5, 1.0):
        np.testing.assert_array_equal(np.asarray(res_live[lv]["mask"]),
                                      np.asarray(res_fast[lv]["mask"]))
        assert res_live[lv]["bpf"] == pytest.approx(res_fast[lv]["bpf"])
        y32 = np.asarray(res_live[lv]["audio"], np.float64)
        y16 = np.asarray(res_fast[lv]["audio"], np.float64)
        snr = 10 * np.log10(
            np.sum(y32 ** 2) / max(np.sum((y32 - y16) ** 2), 1e-30)
        )
        assert snr > 35.0


def test_inference_model_moe():
    """make_inference_model works on DAC_MOE: bit-equal codes, bf16 decode."""
    from vrvq_tpu.models import DAC_MOE

    model = DAC_MOE(
        encoder_dim=8, encoder_rates=(2, 4, 4), decoder_dim=64,
        decoder_rates=(4, 4, 2), n_codebooks=4, codebook_size=64,
        codebook_dim=4, sample_rate=44100, model_type="VBR",
    )
    audio = jnp.asarray(
        np.random.RandomState(6).randn(2, 1, 4096).astype(np.float32) * 0.3
    )
    params = _init(model, audio)
    fast_model, fast_params = make_inference_model(model, params)
    out = model.apply(params, audio, level=1.0)
    out_f = fast_model.apply(fast_params, audio, level=1.0)
    np.testing.assert_array_equal(np.asarray(out["codes"]),
                                  np.asarray(out_f["codes"]))
    y32 = np.asarray(out["audio"], np.float64)
    y16 = np.asarray(out_f["audio"], np.float64)
    snr = 10 * np.log10(np.sum(y32 ** 2) / max(np.sum((y32 - y16) ** 2), 1e-30))
    assert snr > 35.0, f"bf16 MOE decode agreement only {snr:.1f} dB"


@pytest.mark.slow
def test_chunked_decode_with_inference_model():
    """decode_chunked builds the folded decoder from the model flags."""
    from vrvq_tpu.infer.chunked import decode_chunked

    model = _tiny_model()
    audio = jnp.asarray(
        np.random.RandomState(5).randn(1, 1, 8192).astype(np.float32) * 0.3
    )
    params = _init(model, audio)
    fast_model, fast_params = make_inference_model(model, params)
    enc = fast_model.apply(fast_params, audio, level=1.0,
                           method=type(fast_model).encode)
    one_shot = fast_model.apply(fast_params, enc["z_q"],
                                method=type(fast_model).decode)
    chunked = decode_chunked(fast_model, fast_params, enc["z_q"],
                             chunk_frames=64)
    np.testing.assert_allclose(np.asarray(one_shot), np.asarray(chunked),
                               rtol=1e-2, atol=2e-3)


def test_snake_approx_gradients():
    """snake_approx is trainable: gradients flow and match exact-snake
    gradients closely (d/du sin^2(u) = sin(2u) approximated by the poly's
    derivative; round() contributes zero gradient so the range reduction
    is transparent)."""
    from vrvq_tpu.ops.snake import snake_reference, snake_approx

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(2, 256, 8).astype(np.float32))
    a = jnp.asarray(np.abs(rng.randn(8)).astype(np.float32) + 0.5)

    def loss_exact(x, a):
        return jnp.sum(snake_reference(x, a) ** 2)

    def loss_approx(x, a):
        return jnp.sum(snake_approx(x, a) ** 2)

    gx_e, ga_e = jax.grad(loss_exact, argnums=(0, 1))(x, a)
    gx_a, ga_a = jax.grad(loss_approx, argnums=(0, 1))(x, a)
    assert np.all(np.isfinite(np.asarray(gx_a)))
    np.testing.assert_allclose(np.asarray(gx_e), np.asarray(gx_a),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga_e), np.asarray(ga_a),
                               rtol=1e-3, atol=1e-4)
