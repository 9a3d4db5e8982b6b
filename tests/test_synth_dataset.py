"""Synthetic-corpus generator (scripts/make_synth_dataset.py): every
signal class must produce finite, normalized, non-degenerate audio, and
the single-class harmonic path must keep its historical RNG draw order
(the committed data_synth corpus is regenerated from seed 0 — round-3
gate/eval evidence depends on those exact bytes)."""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "make_synth_dataset",
    Path(__file__).resolve().parents[1] / "scripts" / "make_synth_dataset.py",
)
msd = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(msd)


@pytest.mark.parametrize("name", sorted(msd.CLIP_CLASSES))
def test_class_produces_valid_audio(name):
    clip = msd.synth_clip(np.random.RandomState(5), 44100, 1.0,
                          classes=(name,))
    assert clip.shape == (44100,) and clip.dtype == np.float32
    assert np.isfinite(clip).all()
    peak = np.abs(clip).max()
    assert 0.05 <= peak <= 0.9001, peak
    # non-degenerate: not silence, not a constant
    assert clip.std() > 1e-4


def test_multiclass_mix_draws_are_deterministic():
    a = msd.synth_clip(np.random.RandomState(9), 44100, 0.5,
                       classes=tuple(msd.CLIP_CLASSES))
    b = msd.synth_clip(np.random.RandomState(9), 44100, 0.5,
                       classes=tuple(msd.CLIP_CLASSES))
    np.testing.assert_array_equal(a, b)


def test_harmonic_single_class_matches_legacy_stream():
    """classes=('harmonic',) must consume the RNG exactly as the round-3
    generator did: no class-pick draw before the note draws."""
    rng = np.random.RandomState(123)
    clip = msd.synth_clip(rng, 44100, 0.25)

    # re-derive with the legacy draw order
    rng2 = np.random.RandomState(123)
    n = int(44100 * 0.25)
    t = np.arange(n) / 44100
    audio = np.zeros(n, np.float64)
    for _ in range(rng2.randint(2, 6)):
        f0 = rng2.uniform(60.0, 1200.0)
        onset = rng2.uniform(0.0, max(0.25 - 0.05, 0.0))
        decay = rng2.uniform(0.3, 3.0)
        vib = rng2.uniform(0.0, 6.0)
        env = np.clip(t - onset, 0.0, None)
        env = (env > 0) * np.exp(-env * decay)
        phase = 2 * np.pi * (f0 * t + (f0 * 0.005 / max(vib, 1e-6))
                             * np.sin(2 * np.pi * vib * t) * (vib > 0))
        for h in range(1, rng2.randint(4, 12)):
            amp = rng2.uniform(0.2, 1.0) / h
            audio += amp * env * np.sin(h * phase + rng2.uniform(0, 2 * np.pi))
    audio += rng2.randn(n) * 10 ** rng2.uniform(-4.0, -2.5)
    peak = np.abs(audio).max()
    if peak > 0:
        audio *= rng2.uniform(0.1, 0.9) / peak
    np.testing.assert_array_equal(clip, audio.astype(np.float32))
