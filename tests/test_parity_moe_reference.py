"""DAC_MOE parity vs the GENUINE reference source (/root/reference).

Complements tests/test_parity_reference.py (which covers DAC_VRVQ): builds
the real ``models/dac_moe.py`` router-gated model, converts its state_dict
with ``convert_torch_state_dict``, and asserts bit-exact codebook indices
plus router importance-map agreement (match points:
/root/reference/models/dac_moe.py:50,77-122).
"""

import contextlib
import io

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vrvq_tpu.models import DAC_MOE
from vrvq_tpu.train.checkpoint import convert_torch_state_dict

# flagship-scale parity vs the genuine source: excluded from the quick tier
pytestmark = pytest.mark.slow
from tests.reference_import import import_reference_moe


def _test_audio(seconds, seed=0, sr=44100):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = (
        0.4 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 1210.7 * t)
        + 0.05 * rng.randn(t.size)
    )
    return x.astype(np.float32).reshape(1, 1, -1)


def _make_pair(seed, **kw):
    ref_moe = import_reference_moe()
    torch.manual_seed(seed)
    tmodel = ref_moe.DAC_MOE(**kw).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_torch_state_dict(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    jmodel = DAC_MOE(
        encoder_dim=kw["encoder_dim"],
        encoder_rates=tuple(kw["encoder_rates"]),
        decoder_dim=kw["decoder_dim"],
        decoder_rates=tuple(kw["decoder_rates"]),
        n_codebooks=kw["n_codebooks"],
        codebook_size=kw["codebook_size"],
        codebook_dim=kw["codebook_dim"],
        model_type=kw["model_type"],
        imp2mask_alpha=kw.get("imp2mask_alpha", 1.0),
        sample_rate=kw.get("sample_rate", 44100),
    )
    return tmodel, jmodel, params


def test_moe_flagship_codes_and_router_bit_exact():
    """Flagship-scale (64/1536-dim, 9x1024x8) MOE: bit-exact codes, close
    router imp_map, identical threshold mask on 2 s of audio."""
    kw = dict(
        encoder_dim=64, encoder_rates=[2, 4, 8, 8], decoder_dim=1536,
        decoder_rates=[8, 8, 4, 2], n_codebooks=9, codebook_size=1024,
        codebook_dim=8, sample_rate=44100, model_type="VBR",
        full_codebook_rate=0.25, imp2mask_alpha=1.0, quantizer_dropout=0.0,
    )
    tmodel, jmodel, params = _make_pair(0, **kw)
    audio = _test_audio(2.0)
    audio = audio[..., : audio.shape[-1] // 512 * 512]

    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        # the reference forward has a stray debug print(mask_imp)
        # (models/dac_moe.py:122) — swallow it
        tout = tmodel.encode(torch.tensor(audio), n_quantizers=None, level=1.0)
    jout = jmodel.apply(params, jnp.asarray(audio), level=1.0,
                        method=DAC_MOE.encode)

    t_codes = tout["codes"].numpy()
    j_codes = np.asarray(jout["codes"])
    assert t_codes.shape == j_codes.shape == (1, 9, audio.shape[-1] // 512)
    mismatch = (t_codes != j_codes).mean()
    assert mismatch == 0.0, f"code mismatch rate {mismatch:.4%}"

    np.testing.assert_allclose(
        np.asarray(jout["imp_map"]), tout["imp_map"].numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(jout["mask_imp"]), tout["mask_imp"].numpy()
    )


def test_moe_cbr_mode_codes_bit_exact():
    """CBR mode of the reference MOE model (router unused) through the
    converter. The reference shape-errors whenever n_quantizers <
    n_codebooks (models/dac_moe.py:125-148 builds the all-ones mask for
    all Nq stages while only k ran — the upstream CBR-fallback bug our
    quantizer fixes), so the only reference-runnable CBR point is
    n_quantizers == n_codebooks."""
    kw = dict(
        encoder_dim=16, encoder_rates=[2, 4, 8, 8], decoder_dim=128,
        decoder_rates=[8, 8, 4, 2], n_codebooks=6, codebook_size=64,
        codebook_dim=4, sample_rate=44100, model_type="VBR",
        full_codebook_rate=0.0, imp2mask_alpha=1.0, quantizer_dropout=0.0,
    )
    tmodel, jmodel, params = _make_pair(5, **kw)
    audio = _test_audio(0.5, seed=9)
    audio = audio[..., : audio.shape[-1] // 512 * 512]
    with torch.no_grad(), contextlib.redirect_stdout(io.StringIO()):
        tout = tmodel.encode(torch.tensor(audio), n_quantizers=6)
    jout = jmodel.apply(params, jnp.asarray(audio), n_quantizers=6,
                        method=DAC_MOE.encode)
    t_codes = tout["codes"].numpy()
    j_codes = np.asarray(jout["codes"])
    np.testing.assert_array_equal(j_codes, t_codes)
