"""Turbo serving-profile accuracy gate (infer/fast.py turbo_gate): the
deploy criterion for defaulting the maximum-throughput encode
(folded-bf16 encoder + polynomial snake) over the exact-codes fast path.

VERDICT r2 #7: the turbo path stays an opt-in unless a trained-model
accuracy gate passes; these tests pin the gate's mechanics on CPU, and
bench.py's 'gate' phase runs it on the real chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.infer.fast import (
    make_inference_model, make_serving_model, turbo_gate,
)
from vrvq_tpu.models import DAC_VRVQ


@pytest.fixture(scope="module")
def tiny():
    m = DAC_VRVQ(
        encoder_dim=8, decoder_dim=64, n_codebooks=4, codebook_size=32,
        codebook_dim=4, model_type="VBR", level_min=0.125, level_max=6.0,
    )
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, jnp.zeros((1, 1, 4096)), level=1.0)
    return m, params


def test_serving_model_is_turbo_profile(tiny):
    m, params = tiny
    sm, sp = make_serving_model(m, params)
    assert sm.encoder_snake_approx and sm.decoder_snake_approx
    # the encoder stays LIVE f32: the bf16-folded encoder variant failed
    # the 30 dB gate on the trained demo checkpoint (BASELINE.md)
    assert sm.compute_dtype != "bfloat16"
    assert not sm.encoder_folded and sm.decoder_folded
    # quantizer subtree untouched: codes come from the same codebooks
    q_old = jax.tree_util.tree_leaves(params["params"]["quantizer"])
    q_new = jax.tree_util.tree_leaves(sp["params"]["quantizer"])
    for a, b in zip(q_old, q_new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gate_metrics_and_criterion(tiny):
    m, params = tiny
    res = turbo_gate(m, params, level=1.0)
    assert np.isfinite(res.agreement_db) or res.agreement_db == float("inf")
    assert 0.0 <= res.mask_agreement <= 1.0
    assert 0.0 <= res.code_flip_rate <= 1.0
    assert res.passed == (
        res.agreement_db >= res.min_agreement_db
        and res.mask_agreement >= res.min_mask_agreement
    )


def test_gate_self_agreement_is_perfect(tiny):
    """Gating the exact path against itself must pass with perfect scores
    — pins that the gate measures the turbo delta, not decode noise."""
    import vrvq_tpu.infer.fast as fast

    m, params = tiny
    orig = fast.make_serving_model
    try:
        fast.make_serving_model = fast.make_inference_model
        res = turbo_gate(m, params)
    finally:
        fast.make_serving_model = orig
    assert res.agreement_db == float("inf")
    assert res.mask_agreement == 1.0
    assert res.code_flip_rate == 0.0
    assert res.passed


@pytest.mark.slow
def test_gate_impossible_threshold_fails(tiny):
    m, params = tiny
    res = turbo_gate(m, params, min_agreement_db=float("inf"),
                     min_mask_agreement=1.1)
    assert not res.passed


def test_gate_custom_clips(tiny):
    m, params = tiny
    rng = np.random.RandomState(3)
    clips = (rng.randn(2, 1, 4096) * 0.1).astype(np.float32)
    res = turbo_gate(m, params, clips=clips)
    assert 0.0 <= res.mask_agreement <= 1.0
    assert res.probe == "caller-supplied clips"
    # per-clip reporting (VERDICT r4 #5): one dB per probe clip, and the
    # min-clip summary is the worst of them
    assert len(res.clip_agreement_db) == 2
    assert res.min_clip_agreement_db == min(res.clip_agreement_db)


def test_gate_probe_corpus_fallback(tiny):
    """With a missing probe dir the gate falls back to the in-function
    synthetic harmonics (4 clips) and labels the probe accordingly."""
    m, params = tiny
    res = turbo_gate(m, params, probe_dir="no/such/dir")
    assert res.probe.startswith("synthetic harmonics")
    assert len(res.clip_agreement_db) == 4


def test_gate_probe_corpus_loads_heldout(tiny):
    """Default probe: the held-out synth test corpus (the same clips
    scripts/evaluate.py scores), resolved relative to the repo root."""
    import vrvq_tpu.infer.fast as fast

    clips = fast._probe_corpus(tiny[0], "data_synth/test")
    if clips is None:
        pytest.skip("data_synth/test not generated in this checkout")
    assert clips.ndim == 3 and clips.shape[1] == 1
    assert 1 <= clips.shape[0] <= 8
    assert clips.dtype == np.float32
