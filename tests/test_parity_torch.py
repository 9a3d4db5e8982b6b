"""END-TO-END PARITY: bit-exact codebook indices vs the torch reference
architecture through the checkpoint converter (BASELINE.json north-star:
'exact code-index parity vs the PyTorch reference').
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vrvq_tpu.models import DAC_VRVQ
from vrvq_tpu.train.checkpoint import convert_torch_state_dict
from tests.torch_ref_model import TorchRefModel

CFG = dict(encoder_dim=16, strides=(2, 4, 8, 8), decoder_dim=128,
           rates=(8, 8, 4, 2), n_codebooks=4, codebook_size=64,
           codebook_dim=4)


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    tmodel = TorchRefModel(vbr=True, **CFG).eval()
    sd = tmodel.state_dict_reference_layout()
    params = convert_torch_state_dict(sd, CFG["n_codebooks"], "VBR")
    params = jax.tree_util.tree_map(jnp.asarray, params)

    jmodel = DAC_VRVQ(
        encoder_dim=CFG["encoder_dim"], encoder_rates=CFG["strides"],
        decoder_dim=CFG["decoder_dim"], decoder_rates=CFG["rates"],
        n_codebooks=CFG["n_codebooks"], codebook_size=CFG["codebook_size"],
        codebook_dim=CFG["codebook_dim"], model_type="VBR",
        level_min=0.125, level_max=6.0,
    )
    return tmodel, jmodel, params


def test_codes_bit_exact(pair):
    tmodel, jmodel, params = pair
    rng = np.random.RandomState(42)
    audio = (rng.randn(2, 1, 8192) * 0.2).astype(np.float32)

    tout = tmodel.encode(torch.tensor(audio))
    jout = jmodel.apply(params, jnp.asarray(audio), level=1.0,
                        method=DAC_VRVQ.encode)

    t_codes = tout["codes"].numpy()
    j_codes = np.asarray(jout["codes"])
    assert t_codes.shape == j_codes.shape
    mismatch = (t_codes != j_codes).mean()
    assert mismatch == 0.0, f"code mismatch rate {mismatch:.4%}"


def test_z_q_close(pair):
    tmodel, jmodel, params = pair
    rng = np.random.RandomState(7)
    audio = (rng.randn(1, 1, 8192) * 0.2).astype(np.float32)
    tout = tmodel.encode(torch.tensor(audio))
    jout = jmodel.apply(params, jnp.asarray(audio), level=1.0,
                        method=DAC_VRVQ.encode)
    # the torch oracle sums ALL stages (no VBR mask); compare the unmasked
    # per-stage sum, which is mask-independent
    j_zq_full = np.asarray(jout["z_q_is"]).sum(axis=1)
    np.testing.assert_allclose(
        j_zq_full, tout["z_q"].numpy(), rtol=1e-3, atol=1e-4
    )


def test_imp_map_close(pair):
    tmodel, jmodel, params = pair
    rng = np.random.RandomState(8)
    audio = (rng.randn(1, 1, 8192) * 0.2).astype(np.float32)
    tout = tmodel.encode(torch.tensor(audio))
    jout = jmodel.apply(params, jnp.asarray(audio), level=1.0,
                        method=DAC_VRVQ.encode)
    np.testing.assert_allclose(
        np.asarray(jout["imp_map"]), tout["imp_map"].numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_decoded_audio_close(pair):
    tmodel, jmodel, params = pair
    rng = np.random.RandomState(9)
    audio = (rng.randn(1, 1, 8192) * 0.2).astype(np.float32)
    with torch.no_grad():
        t_enc = tmodel.encode(torch.tensor(audio))
        t_audio = tmodel.decoder(t_enc["z_q"]).numpy()
    j_enc = jmodel.apply(params, jnp.asarray(audio), level=1.0,
                         method=DAC_VRVQ.encode)
    j_zq_full = jnp.asarray(np.asarray(j_enc["z_q_is"]).sum(axis=1))
    j_audio = np.asarray(jmodel.apply(params, j_zq_full,
                                      method=DAC_VRVQ.decode))
    assert j_audio.shape == t_audio.shape
    np.testing.assert_allclose(j_audio, t_audio, rtol=1e-3, atol=1e-4)


def test_cbr_model_parity():
    torch.manual_seed(3)
    tmodel = TorchRefModel(vbr=False, **CFG).eval()
    sd = tmodel.state_dict_reference_layout()
    params = convert_torch_state_dict(sd, CFG["n_codebooks"], "CBR")
    params = jax.tree_util.tree_map(jnp.asarray, params)
    jmodel = DAC_VRVQ(
        encoder_dim=CFG["encoder_dim"], encoder_rates=CFG["strides"],
        decoder_dim=CFG["decoder_dim"], decoder_rates=CFG["rates"],
        n_codebooks=CFG["n_codebooks"], codebook_size=CFG["codebook_size"],
        codebook_dim=CFG["codebook_dim"], model_type="CBR",
    )
    rng = np.random.RandomState(11)
    audio = (rng.randn(1, 1, 4096) * 0.2).astype(np.float32)
    tout = tmodel.encode(torch.tensor(audio))
    jout = jmodel.apply(params, jnp.asarray(audio), method=DAC_VRVQ.encode)
    np.testing.assert_array_equal(
        np.asarray(jout["codes"]), tout["codes"].numpy()
    )


def test_export_torch_roundtrip_and_reference_load(pair):
    """JAX -> torch export: a fresh random JAX init exports to the
    reference state_dict layout, (a) round-trips bit-exactly through the
    importer, and (b) loads into the torch oracle (strict) and produces
    bit-identical codes — so models trained here run in the reference
    ecosystem."""
    from vrvq_tpu.train.checkpoint import export_torch_state_dict

    _, jmodel, _ = pair
    rngs = {"params": jax.random.PRNGKey(3), "vbr": jax.random.PRNGKey(4),
            "vbr_dropout": jax.random.PRNGKey(5)}
    params = jmodel.init(rngs, jnp.zeros((1, 1, 4096)), level=1.0)

    sd = export_torch_state_dict(params)

    # (a) bit-exact round trip through the importer
    back = convert_torch_state_dict(sd, CFG["n_codebooks"], "VBR")
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[path]), err_msg=str(path)
        )

    # (b) the torch reference architecture loads it strictly and agrees
    tmodel = TorchRefModel(vbr=True, **CFG).eval()
    renamed = {}
    for k, v in sd.items():
        for pre in ("quantizer.quantizers.", "quantizer.imp_subnet."):
            if k.startswith(pre):
                k = k[len("quantizer."):]
                break
        renamed[k] = torch.tensor(v)
    tmodel.load_state_dict(renamed, strict=True)

    rng = np.random.RandomState(11)
    audio = (rng.randn(2, 1, 8192) * 0.2).astype(np.float32)
    with torch.no_grad():
        t_codes = tmodel.encode(torch.tensor(audio))["codes"].numpy()
    j_codes = np.asarray(jmodel.apply(
        params, jnp.asarray(audio), level=1.0, method=DAC_VRVQ.encode
    )["codes"])
    assert (t_codes == j_codes).all()


def test_moe_router_conversion_parity():
    """DAC_MOE checkpoint conversion: the router Linear imports (and
    round-trips through export) with bit-exact codes and matching
    importance scores vs a torch oracle carrying the reference's router
    layout (models/dac_moe.py:50,96-99)."""
    from vrvq_tpu.models import DAC_MOE
    from vrvq_tpu.train.checkpoint import export_torch_state_dict

    torch.manual_seed(1)
    tmodel = TorchRefModel(vbr=True, moe=True, **CFG).eval()
    sd = tmodel.state_dict_reference_layout()
    assert "quantizer.router.weight" in sd
    params = convert_torch_state_dict(sd)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    jmodel = DAC_MOE(
        encoder_dim=CFG["encoder_dim"], encoder_rates=CFG["strides"],
        decoder_dim=CFG["decoder_dim"], decoder_rates=CFG["rates"],
        n_codebooks=CFG["n_codebooks"], codebook_size=CFG["codebook_size"],
        codebook_dim=CFG["codebook_dim"], model_type="VBR",
    )
    rng = np.random.RandomState(21)
    audio = (rng.randn(2, 1, 8192) * 0.2).astype(np.float32)
    tout = tmodel.encode(torch.tensor(audio))
    jout = jmodel.apply(params, jnp.asarray(audio), level=1.0,
                        method=DAC_MOE.encode)
    assert (tout["codes"].numpy() == np.asarray(jout["codes"])).all()
    np.testing.assert_allclose(
        np.asarray(jout["imp_map"]), tout["imp_map"].numpy(),
        rtol=1e-4, atol=1e-5,
    )

    # export round-trips the router bit-exactly
    back = convert_torch_state_dict(export_torch_state_dict(params))
    r_a = params["params"]["quantizer"]["router"]
    r_b = back["params"]["quantizer"]["router"]
    np.testing.assert_array_equal(np.asarray(r_a["kernel"]),
                                  np.asarray(r_b["kernel"]))
    np.testing.assert_array_equal(np.asarray(r_a["bias"]),
                                  np.asarray(r_b["bias"]))
