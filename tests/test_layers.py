"""Numerical parity of NN primitives vs torch oracles + shape tests."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vrvq_tpu.nn import (
    WNConv1d, WNConvTranspose1d, Snake1d, ResidualUnit, EncoderBlock,
    DecoderBlock,
)
from tests import torch_oracle as oracle


def _to_jax_bct(x_bct):
    """(B, C, T) torch/numpy -> (B, T, C) jnp."""
    return jnp.asarray(np.asarray(x_bct).transpose(0, 2, 1))


def _from_jax_btc(y):
    return np.asarray(y).transpose(0, 2, 1)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding,dilation,groups",
    [
        (1, 8, 7, 1, 3, 1, 1),
        (8, 16, 7, 1, 9, 3, 1),
        (16, 32, 4, 2, 1, 1, 1),
        (8, 8, 1, 1, 0, 1, 1),
        (16, 64, 41, 4, 20, 1, 4),
    ],
)
def test_wnconv1d_matches_torch(cin, cout, k, stride, padding, dilation, groups):
    rng = np.random.RandomState(0)
    v = rng.randn(cout, cin // groups, k).astype(np.float32)
    g = np.abs(rng.randn(cout)).astype(np.float32) + 0.5
    b = rng.randn(cout).astype(np.float32)
    x = rng.randn(2, cin, 64).astype(np.float32)

    ref = oracle.wn_conv1d(
        torch.tensor(x), torch.tensor(v), torch.tensor(g), torch.tensor(b),
        stride, padding, dilation, groups,
    ).numpy()

    layer = WNConv1d(cin, cout, k, stride, padding, dilation, groups)
    # torch v (out, in/groups, k) -> our WIO (k, in/groups, out)
    params = {
        "params": {
            "v": jnp.asarray(v.transpose(2, 1, 0)),
            "g": jnp.asarray(g),
            "bias": jnp.asarray(b),
        }
    }
    out = layer.apply(params, _to_jax_bct(x))
    np.testing.assert_allclose(_from_jax_btc(out), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "cin,cout,k,stride,padding",
    [(16, 8, 4, 2, 1), (32, 16, 8, 4, 2), (64, 32, 16, 8, 4)],
)
def test_wnconvtranspose1d_matches_torch(cin, cout, k, stride, padding):
    rng = np.random.RandomState(1)
    v = rng.randn(cin, cout, k).astype(np.float32)
    g = np.abs(rng.randn(cin)).astype(np.float32) + 0.5
    b = rng.randn(cout).astype(np.float32)
    x = rng.randn(2, cin, 32).astype(np.float32)

    ref = oracle.wn_conv_transpose1d(
        torch.tensor(x), torch.tensor(v), torch.tensor(g), torch.tensor(b),
        stride, padding,
    ).numpy()

    layer = WNConvTranspose1d(cin, cout, k, stride, padding)
    params = {
        "params": {"v": jnp.asarray(v), "g": jnp.asarray(g), "bias": jnp.asarray(b)}
    }
    out = layer.apply(params, _to_jax_bct(x))
    assert ref.shape == _from_jax_btc(out).shape
    np.testing.assert_allclose(_from_jax_btc(out), ref, rtol=1e-5, atol=1e-5)


def test_snake_matches_torch():
    rng = np.random.RandomState(2)
    c = 16
    x = rng.randn(2, c, 50).astype(np.float32)
    alpha = np.abs(rng.randn(1, c, 1)).astype(np.float32) + 0.1
    ref = oracle.snake(torch.tensor(x), torch.tensor(alpha)).numpy()

    layer = Snake1d(c)
    params = {"params": {"alpha": jnp.asarray(alpha[0, :, 0])}}
    out = layer.apply(params, _to_jax_bct(x))
    np.testing.assert_allclose(_from_jax_btc(out), ref, rtol=1e-5, atol=1e-6)


def test_residual_unit_preserves_length():
    layer = ResidualUnit(dim=8, dilation=3)
    x = jnp.zeros((1, 100, 8))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (1, 100, 8)


def test_residual_unit_no_padding_crops():
    layer = ResidualUnit(dim=8, dilation=3, padding=False)
    x = jnp.ones((1, 100, 8))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    # dilated k=7 conv loses (7-1)*3 = 18 samples without padding
    assert y.shape == (1, 82, 8)


@pytest.mark.parametrize("stride", [2, 4, 8])
def test_encoder_block_downsamples(stride):
    dim = 16
    layer = EncoderBlock(dim=dim, stride=stride)
    x = jnp.zeros((1, 64, dim // 2))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (1, 64 // stride, dim)


@pytest.mark.parametrize("stride", [2, 4, 8])
def test_decoder_block_upsamples(stride):
    layer = DecoderBlock(input_dim=16, output_dim=8, stride=stride)
    x = jnp.zeros((1, 16, 16))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (1, 16 * stride, 8)


def test_init_effective_weight_equals_v():
    """g is initialized to ||v|| so the initial effective kernel is v."""
    layer = WNConv1d(4, 8, 3, padding=1)
    x = jnp.ones((1, 10, 4))
    params = layer.init(jax.random.PRNGKey(3), x)
    v = params["params"]["v"]
    g = params["params"]["g"]
    np.testing.assert_allclose(
        np.asarray(g),
        np.linalg.norm(np.asarray(v).reshape(-1, 8), axis=0),
        rtol=1e-6,
    )


def test_snake_pallas_matches_reference():
    """The standalone Pallas snake path (CPU lowering) matches the XLA one."""
    from vrvq_tpu.ops.snake import snake_pallas, snake_reference

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 1024, 16).astype(np.float32))
    alpha = jnp.asarray(np.abs(rng.randn(16)).astype(np.float32) + 0.1)
    ref = snake_reference(x, alpha)
    out = snake_pallas(x, alpha, block_t=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # awkward shapes fall back to the XLA path
    x2 = jnp.asarray(rng.randn(1, 1000, 16).astype(np.float32))
    out2 = snake_pallas(x2, alpha, block_t=512, interpret=True)
    np.testing.assert_allclose(np.asarray(out2),
                               np.asarray(snake_reference(x2, alpha)),
                               rtol=1e-6)


def test_signal_default_stft_params():
    from vrvq_tpu.audio import Signal

    sig = Signal(np.zeros((1, 1, 1000), np.float32), 44100)
    assert sig.stft_params.window_length == 2048
    assert sig.stft_params.hop_length == 512


def test_denoising_block_shape():
    """DenoisingBlock (defined-but-unused upstream, models/layers.py:113-135)."""
    from vrvq_tpu.nn import DenoisingBlock

    layer = DenoisingBlock(dim=8)
    x = jnp.zeros((1, 64, 8))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (1, 64, 8)
