"""FLAGSHIP-SCALE PARITY vs the genuine reference source.

Unlike tests/test_parity_torch.py (builder-written torch oracle at toy
size), these tests import the actual /root/reference models
(models/dac_vrvq.py, models/quantize.py, models/importance_subnet.py),
build real-topology models, convert their state_dicts with
``convert_torch_state_dict``, and assert bit-exact codebook indices —
covering the f32 accumulation-order risk at the real 64/1536-dim,
8x1024x8 scale (match point: /root/reference/models/quantize.py:87-103).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vrvq_tpu.models import DAC_VRVQ
from vrvq_tpu.train.checkpoint import convert_torch_state_dict
from tests.reference_import import import_reference_dac


def _make_pair(seed, **kw):
    """Build (reference torch model, our flax model, converted params)."""
    ref_dac = import_reference_dac()
    torch.manual_seed(seed)
    tmodel = ref_dac.DAC_VRVQ(**kw).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_torch_state_dict(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    jmodel = DAC_VRVQ(
        encoder_dim=kw["encoder_dim"],
        encoder_rates=tuple(kw["encoder_rates"]),
        decoder_dim=kw["decoder_dim"],
        decoder_rates=tuple(kw["decoder_rates"]),
        n_codebooks=kw["n_codebooks"],
        codebook_size=kw["codebook_size"],
        codebook_dim=kw["codebook_dim"],
        model_type=kw["model_type"],
        level_min=kw.get("level_min"),
        level_max=kw.get("level_max"),
        imp2mask_alpha=kw.get("imp2mask_alpha", 1.0),
        sample_rate=kw.get("sample_rate", 44100),
    )
    return tmodel, jmodel, params


def _test_audio(seconds, seed=0, sr=44100):
    """Tone mix + noise, the kind of signal codes are computed on."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 1210.7 * t)
        + 0.05 * rng.randn(t.size)
    )
    return x.astype(np.float32).reshape(1, 1, -1)


FLAGSHIP = dict(
    encoder_dim=64, encoder_rates=[2, 4, 8, 8], decoder_dim=1536,
    decoder_rates=[8, 8, 4, 2], n_codebooks=8, codebook_size=1024,
    codebook_dim=8, sample_rate=44100, model_type="VBR",
    full_codebook_rate=0.25, level_min=0.125, level_max=6.0,
    imp2mask_alpha=2.0, quantizer_dropout=0.0,
)


@pytest.fixture(scope="module")
def flagship_pair():
    return _make_pair(0, **FLAGSHIP)


@pytest.mark.slow
def test_flagship_codes_bit_exact_10s(flagship_pair):
    """Bit-exact code indices at flagship scale on 10 s of audio."""
    tmodel, jmodel, params = flagship_pair
    audio = _test_audio(10.0)
    audio = audio[..., : audio.shape[-1] // 512 * 512]

    with torch.no_grad():
        tout = tmodel.encode(torch.tensor(audio), n_quantizers=None, level=1.0)
    jout = jmodel.apply(params, jnp.asarray(audio), level=1.0,
                        method=DAC_VRVQ.encode)

    t_codes = tout["codes"].numpy()
    j_codes = np.asarray(jout["codes"])
    assert t_codes.shape == j_codes.shape == (1, 8, audio.shape[-1] // 512)
    mismatch = (t_codes != j_codes).mean()
    assert mismatch == 0.0, f"code mismatch rate {mismatch:.4%}"

    np.testing.assert_allclose(
        np.asarray(jout["imp_map"]), tout["imp_map"].numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_flagship_decode_close(flagship_pair):
    """Decoded audio matches the reference decoder to float tolerance."""
    tmodel, jmodel, params = flagship_pair
    audio = _test_audio(1.0, seed=3)
    audio = audio[..., : audio.shape[-1] // 512 * 512]
    with torch.no_grad():
        tout = tmodel.encode(torch.tensor(audio), n_quantizers=None, level=1.0)
        t_audio = tmodel.decode(tout["z_q"]).numpy()
    jout = jmodel.apply(params, jnp.asarray(audio), level=1.0,
                        method=DAC_VRVQ.encode)
    j_audio = np.asarray(
        jmodel.apply(params, jout["z_q"], method=DAC_VRVQ.decode)
    )
    assert j_audio.shape == t_audio.shape
    np.testing.assert_allclose(j_audio, t_audio, rtol=1e-3, atol=1e-4)


def test_nondefault_topology_codes_bit_exact():
    """3-stride / 5-codebook / non-default imp-depth model converts and
    matches — exercises the structure inference in the converter."""
    kw = dict(
        encoder_dim=16, encoder_rates=[2, 4, 8], decoder_dim=128,
        decoder_rates=[8, 4, 2], n_codebooks=5, codebook_size=64,
        codebook_dim=4, sample_rate=44100, model_type="VBR",
        full_codebook_rate=0.25, level_min=0.125, level_max=6.0,
        imp2mask_alpha=2.0, quantizer_dropout=0.0,
    )
    tmodel, jmodel, params = _make_pair(7, **kw)
    hop = 2 * 4 * 8
    audio = _test_audio(0.5, seed=5)
    audio = audio[..., : audio.shape[-1] // hop * hop]
    with torch.no_grad():
        tout = tmodel.encode(torch.tensor(audio), n_quantizers=None, level=1.0)
    jout = jmodel.apply(params, jnp.asarray(audio), level=1.0,
                        method=DAC_VRVQ.encode)
    np.testing.assert_array_equal(
        np.asarray(jout["codes"]), tout["codes"].numpy()
    )


def test_cbr_reference_codes_bit_exact():
    """CBR-mode reference model (ResidualVectorQuantize) through the
    converter, including early-stop at n_quantizers."""
    kw = dict(
        encoder_dim=16, encoder_rates=[2, 4, 8, 8], decoder_dim=128,
        decoder_rates=[8, 8, 4, 2], n_codebooks=6, codebook_size=64,
        codebook_dim=4, sample_rate=44100, model_type="CBR",
        quantizer_dropout=0.0,
    )
    tmodel, jmodel, params = _make_pair(11, **kw)
    audio = _test_audio(0.5, seed=13)
    audio = audio[..., : audio.shape[-1] // 512 * 512]
    with torch.no_grad():
        tout = tmodel.encode(torch.tensor(audio), n_quantizers=4)
    jout = jmodel.apply(params, jnp.asarray(audio), n_quantizers=4,
                        method=DAC_VRVQ.encode)
    t_codes = tout["codes"].numpy()
    j_codes = np.asarray(jout["codes"])
    np.testing.assert_array_equal(j_codes[:, :4], t_codes[:, :4])
