"""Time-packed (space-to-depth) encoder layout: exact-sums parity.

The flagship encoder's first stage computes at C=64, half-filling the
TPU's 128 lanes — measured 4.9% MXU and 177 ms of the 295 ms turbo
encode (BASELINE.md roofline). nn/layers.pack_conv_kernel re-expresses
its convs as dense convs over a (B, T/2, 2C) layout with the SAME
parameters. These tests pin that the packed programs compute the same
sums (up to f32 summation-order ulps) at every level: raw kernel
transform, ResidualUnit/EncoderBlock modules, and the full model via
``encoder_packed`` / ``make_inference_model(encode_packed=True)``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vrvq_tpu.nn.layers import (
    DecoderBlock,
    EncoderBlock,
    ResidualUnit,
    WNConv1d,
    WNConvTranspose1d,
    pack_conv_kernel,
    pack_convtranspose_kernel,
)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize(
    "k,dilation,stride,padding,pack_in,pack_out",
    [
        (7, 1, 1, 3, 2, 2),    # ResidualUnit conv1, d=1
        (7, 3, 1, 9, 2, 2),    # d=3
        (7, 9, 1, 27, 2, 2),   # d=9
        (1, 1, 1, 0, 2, 2),    # ResidualUnit conv2 (pointwise)
        (4, 1, 2, 1, 2, 1),    # EncoderBlock 'down' (k=2*stride, s=2)
        (7, 1, 1, 3, 4, 4),    # deeper packing (not used by the flagship)
        (7, 3, 1, 9, 4, 2),    # pack_in=4 through a stride-2 conv
        (4, 1, 2, 1, 4, 2),
    ],
)
def test_pack_conv_kernel_matches_conv(k, dilation, stride, padding,
                                       pack_in, pack_out):
    cin, cout, B, T = 6, 10, 2, 96
    kw, kx = jax.random.split(jax.random.PRNGKey(hash((k, dilation, stride))
                                                 % (2 ** 31)))
    w = _rand(kw, (k, cin, cout))
    x = _rand(kx, (B, T, cin))

    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NWC", "WIO", "NWC"))

    if pack_in == pack_out * stride:
        Kp, lo, tau_max = pack_conv_kernel(
            w, dilation=dilation, stride=stride, padding=padding,
            pack_in=pack_in, pack_out=pack_out)
        X = x.reshape(B, T // pack_in, pack_in * cin)
        t_out = (T + 2 * padding - (k - 1) * dilation - 1) // stride + 1
        hi = tau_max + (t_out // pack_out - X.shape[1])
        Y = jax.lax.conv_general_dilated(
            X, Kp, window_strides=(1,), padding=[(lo, hi)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        got = Y.reshape(B, -1, cout)[:, :t_out]
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
    else:
        with pytest.raises(ValueError):
            pack_conv_kernel(w, dilation=dilation, stride=stride,
                             padding=padding, pack_in=pack_in,
                             pack_out=pack_out)


@pytest.mark.parametrize(
    "k,stride,padding,pack_in",
    [
        (4, 2, 1, 1),    # flagship dec block_3 'up' (k=2s, p=ceil(s/2))
        (8, 4, 2, 1),    # dec block_2 'up'
        (16, 8, 4, 1),   # dec block_0/1 'up'
        (4, 2, 1, 4),    # chained: block_3 fed by a packed block_2
        (8, 4, 2, 2),    # deeper chains
    ],
)
def test_pack_convtranspose_kernel_matches(k, stride, padding, pack_in):
    """Packed transposed conv == torch-semantics transposed conv
    (lhs-dilated conv), same params, up to f32 summation-order ulps."""
    cin, cout, B = 6, 10, 2
    T = 96  # unpacked input length
    kw, kx = jax.random.split(jax.random.PRNGKey(hash((k, stride, pack_in))
                                                 % (2 ** 31)))
    w = _rand(kw, (cin, cout, k))  # torch ConvTranspose1d layout
    x = _rand(kx, (B, T, cin))

    # reference: the module's own unpacked lowering (flipped kernel,
    # lhs_dilation) — itself parity-tested vs torch in test_parity_torch
    w_ref = jnp.flip(w, axis=2).transpose(2, 0, 1)
    ref = jax.lax.conv_general_dilated(
        x, w_ref, window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,), dimension_numbers=("NWC", "WIO", "NWC"))

    P, Q = pack_in, pack_in * stride
    Kp, lo, tau_min = pack_convtranspose_kernel(
        w, stride=stride, padding=padding, pack_in=P, pack_out=Q)
    X = x.reshape(B, T // P, P * cin)
    t_out = (T - 1) * stride - 2 * padding + k
    assert t_out % Q == 0
    hi = t_out // Q - X.shape[1] - tau_min
    Y = jax.lax.conv_general_dilated(
        X, Kp, window_strides=(1,), padding=[(lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    got = Y.reshape(B, -1, cout)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_convtranspose_kernel_rejects_bad_packing():
    w = jnp.zeros((4, 4, 4))
    with pytest.raises(ValueError, match="pack_out"):
        pack_convtranspose_kernel(w, stride=2, padding=1,
                                  pack_in=1, pack_out=4)


def test_packed_wnconvtranspose_module_matches():
    x = _rand(jax.random.PRNGKey(7), (2, 64, 6))
    normal = WNConvTranspose1d(6, 10, kernel_size=4, stride=2, padding=1)
    packed = WNConvTranspose1d(6, 10, kernel_size=4, stride=2, padding=1,
                               time_pack_in=1, time_pack_out=2)
    params = normal.init(jax.random.PRNGKey(0), x)
    y_n = normal.apply(params, x)
    y_p = packed.apply(params, x).reshape(y_n.shape)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_n),
                               rtol=1e-5, atol=1e-5)


def test_packed_decoder_block_matches():
    x = _rand(jax.random.PRNGKey(8), (2, 64, 16))
    normal = DecoderBlock(16, 8, stride=2)
    packed = DecoderBlock(16, 8, stride=2, packed=True)
    params = normal.init(jax.random.PRNGKey(0), x)
    y_n = normal.apply(params, x)
    y_p = packed.apply(params, x)  # (B, T/2, 2*8)
    y_p = y_p.reshape(y_n.shape)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_n),
                               rtol=1e-5, atol=1e-5)


def test_packed_decoder_block_chains():
    """A packed block's output feeds the next packed block directly."""
    x = _rand(jax.random.PRNGKey(9), (2, 32, 16))
    n0, n1 = DecoderBlock(16, 8, stride=4), DecoderBlock(8, 4, stride=2)
    p0 = DecoderBlock(16, 8, stride=4, packed=True)
    p1 = DecoderBlock(8, 4, stride=2, packed=True, time_pack_in=4)
    params0 = n0.init(jax.random.PRNGKey(0), x)
    y_n = n0.apply(params0, x)
    params1 = n1.init(jax.random.PRNGKey(1), y_n)
    z_n = n1.apply(params1, y_n)
    y_p = p0.apply(params0, x)          # (B, T*4/4, 4*8)
    z_p = p1.apply(params1, y_p)        # (B, T*8/8, 8*4)
    z_p = z_p.reshape(z_n.shape)
    np.testing.assert_allclose(np.asarray(z_p), np.asarray(z_n),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("packed_blocks", [1, 2])
def test_packed_decoder_model_matches(tiny_model, packed_blocks):
    """Full Decoder with packed tail: same decode, ulp-level waveform."""
    from dataclasses import replace

    model, params, x = tiny_model
    out_n = model.apply(params, x, level=1.0)
    packed = replace(model, decoder_packed=packed_blocks)
    out_p = packed.apply(params, x, level=1.0)
    # codes must be BIT-identical: the encoder/quantizer are untouched
    np.testing.assert_array_equal(np.asarray(out_p["codes"]),
                                  np.asarray(out_n["codes"]))
    np.testing.assert_allclose(np.asarray(out_p["audio"]),
                               np.asarray(out_n["audio"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("packed_up_blocks", [1, 2])
def test_packed_up_decoder_model_matches(tiny_model, packed_up_blocks):
    """Decoder with only the trailing 'up' convs packed (r5 retry of the
    r4 packed-tail negative): bit-identical codes, ulp-level waveform."""
    from dataclasses import replace

    model, params, x = tiny_model
    out_n = model.apply(params, x, level=1.0)
    packed = replace(model, decoder_packed_up=packed_up_blocks)
    out_p = packed.apply(params, x, level=1.0)
    np.testing.assert_array_equal(np.asarray(out_p["codes"]),
                                  np.asarray(out_n["codes"]))
    np.testing.assert_allclose(np.asarray(out_p["audio"]),
                               np.asarray(out_n["audio"]),
                               rtol=1e-4, atol=1e-5)


def test_packed_and_packed_up_are_exclusive(tiny_model):
    from dataclasses import replace

    model, params, x = tiny_model
    bad = replace(model, decoder_packed=1, decoder_packed_up=1)
    with pytest.raises(ValueError, match="exclusive"):
        bad.apply(params, x, level=1.0)


@pytest.mark.slow
def test_make_inference_model_decode_packed(tiny_model):
    from vrvq_tpu.infer.fast import make_inference_model

    model, params, x = tiny_model
    fast_m, fast_p = make_inference_model(model, params, decode_packed=1)
    assert fast_m.decoder_packed == 1
    out = fast_m.apply(fast_p, x, level=1.0)
    ref_m, ref_p = make_inference_model(model, params)
    ref = ref_m.apply(ref_p, x, level=1.0)
    # folded bf16 decoder both sides: identical up to bf16-level reorder
    np.testing.assert_allclose(np.asarray(out["audio"]),
                               np.asarray(ref["audio"]),
                               rtol=1e-2, atol=3e-3)


def test_pack_conv_kernel_rejects_bad_packing():
    w = jnp.zeros((7, 4, 4))
    with pytest.raises(ValueError, match="pack_in"):
        pack_conv_kernel(w, dilation=1, stride=1, padding=3,
                         pack_in=2, pack_out=1)


def _apply_both(module_kw, packed_kw, builder, x):
    """Init the normal module, apply BOTH variants with the same params."""
    normal = builder(**module_kw)
    packed = builder(**{**module_kw, **packed_kw})
    params = normal.init(jax.random.PRNGKey(0), x)
    y_n = normal.apply(params, x)
    xp = x.reshape(x.shape[0], x.shape[1] // 2, 2 * x.shape[2])
    y_p = packed.apply(params, xp)
    return y_n, y_p


@pytest.mark.parametrize("dilation", [1, 3, 9])
def test_packed_residual_unit_matches(dilation):
    x = _rand(jax.random.PRNGKey(1), (2, 128, 8))
    y_n, y_p = _apply_both(
        dict(dim=8, dilation=dilation), dict(time_pack=2), ResidualUnit, x)
    # packed output is (B, T/2, 2C): unpack before comparing
    y_p = y_p.reshape(y_n.shape)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_n),
                               rtol=1e-5, atol=1e-5)


def test_packed_encoder_block_matches():
    x = _rand(jax.random.PRNGKey(2), (2, 128, 8))
    y_n, y_p = _apply_both(
        dict(dim=16, stride=2), dict(time_pack=2), EncoderBlock, x)
    # the strided 'down' conv consumes the packing: same shape both ways
    assert y_p.shape == y_n.shape
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_n),
                               rtol=1e-5, atol=1e-5)


def test_packed_encoder_block_requires_matching_stride():
    x = _rand(jax.random.PRNGKey(3), (1, 32, 4 * 2))
    blk = EncoderBlock(dim=8, stride=4, time_pack=2)
    with pytest.raises(ValueError, match="time_pack == stride"):
        blk.init(jax.random.PRNGKey(0), x)


def test_packed_conv_requires_zero_padding():
    x = _rand(jax.random.PRNGKey(4), (1, 16, 8))
    conv = WNConv1d(4, 4, kernel_size=7, padding=3, pad_mode="none",
                    time_pack_in=2, time_pack_out=2)
    with pytest.raises(ValueError, match="zero padding"):
        conv.init(jax.random.PRNGKey(0), x)


@pytest.fixture(scope="module")
def tiny_model():
    from vrvq_tpu.models.dac_vrvq import DAC_VRVQ

    model = DAC_VRVQ(encoder_dim=8, decoder_dim=32, n_codebooks=4,
                     codebook_size=32, codebook_dim=4,
                     encoder_rates=(2, 4, 4), decoder_rates=(4, 4, 2))
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 1, 2048).astype(np.float32) * 0.2)
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = model.init(rngs, x)
    return model, params, x


def test_packed_full_model_encode_matches(tiny_model):
    from dataclasses import replace

    model, params, x = tiny_model
    packed = replace(model, encoder_packed=True)
    out_n = model.apply(params, x, method=type(model).encode)
    out_p = packed.apply(params, x, method=type(model).encode)
    np.testing.assert_allclose(np.asarray(out_p["imp_map"]),
                               np.asarray(out_n["imp_map"]),
                               rtol=1e-4, atol=1e-5)
    codes_n, codes_p = np.asarray(out_n["codes"]), np.asarray(out_p["codes"])
    # identical sums up to ulps: near-ties in the argmax may flip a rare
    # index even on CPU, but agreement must be overwhelming
    assert (codes_n == codes_p).mean() > 0.98


def test_make_inference_model_encode_packed(tiny_model):
    from vrvq_tpu.infer.fast import make_inference_model

    model, params, x = tiny_model
    fast_m, fast_p = make_inference_model(model, params, encode_packed=True)
    assert fast_m.encoder_packed
    out = fast_m.apply(fast_p, x, level=1.0)
    assert out["audio"].shape == x.shape
    ref_m, ref_p = make_inference_model(model, params)
    ref = ref_m.apply(ref_p, x, level=1.0)
    np.testing.assert_allclose(np.asarray(out["audio"]),
                               np.asarray(ref["audio"]),
                               rtol=1e-3, atol=1e-4)


def test_turbo_gate_accepts_packed_variant(tiny_model):
    from vrvq_tpu.infer.fast import turbo_gate

    model, params, _ = tiny_model
    res = turbo_gate(model, params, encode_packed=True)
    # random-init tiny model: the gate must RUN and report finite numbers;
    # the pass verdict belongs to the trained checkpoint (BASELINE.md)
    assert np.isfinite(res.mask_agreement)
    assert 0.0 <= res.code_flip_rate <= 1.0
