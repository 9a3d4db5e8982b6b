#!/usr/bin/env python
"""Generate a small synthetic audio dataset (harmonic-rich WAVs) for
training demos and smoke runs.

The reference trains on private music/speech corpora (conf/dataset.yml
folder lists); this container has no audio corpus, so convergence demos
use synthetic material with music-like structure: random harmonic stacks
with vibrato, exponential decay envelopes (note onsets), and a noise
floor. Not a substitute for real data — just enough spectral/temporal
structure for the codec + discriminator losses to be meaningfully
exercised at full scale.

Usage:
  python scripts/make_synth_dataset.py --out data --train 256 --val 16
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def synth_clip(rng: np.random.RandomState, sr: int, dur: float) -> np.ndarray:
    n = int(sr * dur)
    t = np.arange(n) / sr
    audio = np.zeros(n, np.float64)
    # a few overlapping "notes": harmonic stacks with decaying envelopes
    for _ in range(rng.randint(2, 6)):
        f0 = rng.uniform(60.0, 1200.0)
        onset = rng.uniform(0.0, max(dur - 0.05, 0.0))
        decay = rng.uniform(0.3, 3.0)
        vib = rng.uniform(0.0, 6.0)  # vibrato Hz
        env = np.clip(t - onset, 0.0, None)
        env = (env > 0) * np.exp(-env * decay)
        phase = 2 * np.pi * (f0 * t + (f0 * 0.005 / max(vib, 1e-6))
                             * np.sin(2 * np.pi * vib * t) * (vib > 0))
        for h in range(1, rng.randint(4, 12)):
            amp = rng.uniform(0.2, 1.0) / h
            audio += amp * env * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    audio += rng.randn(n) * 10 ** rng.uniform(-4.0, -2.5)  # noise floor
    peak = np.abs(audio).max()
    if peak > 0:
        audio *= rng.uniform(0.1, 0.9) / peak
    return audio.astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data")
    ap.add_argument("--train", type=int, default=256)
    ap.add_argument("--val", type=int, default=16)
    ap.add_argument("--test", type=int, default=8)
    ap.add_argument("--sample_rate", type=int, default=44100)
    ap.add_argument("--duration", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from vrvq_tpu.data.audio_io import write_wav

    for si, (split, count) in enumerate((("train", args.train),
                                         ("val", args.val),
                                         ("test", args.test))):
        out = Path(args.out) / split
        out.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            rng = np.random.RandomState(
                (args.seed * 1_000_003 + si * 99991 + i) % 2**32
            )
            clip = synth_clip(rng, args.sample_rate, args.duration)
            write_wav(out / f"{split}_{i:04d}.wav", clip[None, :],
                      args.sample_rate)
        print(f"{split}: {count} x {args.duration}s -> {out}")


if __name__ == "__main__":
    main()
