"""scripts/profile_encoder.py harness: the chained-scan stage timer must
time real work (not a CSE'd no-op) and the roofline rows must be
self-consistent. CPU numbers are meaningless as perf truth; what these
tests pin is the METHODOLOGY the TPU run relies on."""

import importlib.util
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def prof():
    spec = importlib.util.spec_from_file_location(
        "profmod", REPO / "scripts" / "profile_encoder.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["profmod"] = m
    spec.loader.exec_module(m)
    return m


def test_chain_defeats_cse(prof):
    """The R-chained program must actually run R times: chaining more reps
    must compute a different (accumulated) value, not a CSE'd single
    application."""
    calls = []

    def apply_fn(params, x):
        return x * params["w"]

    params = {"w": jnp.float32(2.0)}
    x = jnp.ones((1, 1024, 4), jnp.float32)
    v2 = float(np.asarray(prof._chain(apply_fn, params, x, 2)(params, x)))
    v8 = float(np.asarray(prof._chain(apply_fn, params, x, 8)(params, x)))
    # each rep adds ~sum(y[:, ::257, :]) = 4*4*2 = 32
    assert abs(v2 - 2 * 32.0) < 1e-2
    assert abs(v8 - 8 * 32.0) < 1e-2
    del calls


@pytest.mark.slow
def test_profile_rows_consistent(prof):
    rows = prof.profile(batch=1, seconds=0.05, d_model=8, strides=(2, 4, 8, 8),
                        latent_dim=16, decoder_dim=32,
                        snake_approx=True, seed=0)
    names = [r["stage"] for r in rows]
    # Derive the expected set structurally (a hard-coded count hid the
    # round-3 PACKED-row regression): per conv-stack stage plus the
    # packed-layout comparison rows.
    expected_prefixes = (
        ["enc/in_conv"] + [f"enc/block_{i}" for i in range(4)]
        + ["enc/in+block_0 PACKED", "enc/tail", "dec/in_conv"]
        + [f"dec/block_{i}" for i in range(4)] + ["dec/tail"]
    )
    assert len(names) == len(expected_prefixes)
    for pref in expected_prefixes:
        assert any(n.startswith(pref) for n in names), f"missing row {pref}"
    for r in rows:
        # sub-10 us stages round to 0.00 ms at tiny scale; raw dt is
        # clamped positive inside _time_stage
        assert r["ms"] >= 0
        assert r["gflops"] >= 0
        # achieved rates must be finite and non-negative
        assert np.isfinite(r["tf_s"]) and r["tf_s"] >= 0
        assert np.isfinite(r["gb_s"]) and r["gb_s"] >= 0
