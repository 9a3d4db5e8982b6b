"""Benchmark: 44.1 kHz encode+decode realtime factor per chip.

Runs the flagship (82M-param, vrvq_a2 topology) DAC_VRVQ wav->codes->wav
forward on the available accelerator and reports the realtime factor
(seconds of audio processed per second of wall clock). The BASELINE.json
north-star is >=50x realtime per v5e chip, so vs_baseline = value / 50.

Prints exactly one JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_RTF = 50.0
SAMPLE_RATE = 44100


def main():
    from __graft_entry__ import _flagship, _init

    model = _flagship()

    batch = 4
    seconds = 10.0
    n_samples = int(seconds * SAMPLE_RATE)
    # pad to hop multiple so the jit program is the steady-state shape
    n_samples = ((n_samples + 511) // 512) * 512

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(batch, 1, n_samples).astype(np.float32) * 0.1)
    params = _init(model, audio[:1])

    from vrvq_tpu.models import DAC_VRVQ

    @jax.jit
    def forward(params, audio):
        out = model.apply(params, audio, level=1.0)
        return out["audio"], out["codes"]

    # compile + warmup
    out, codes = forward(params, audio)
    out.block_until_ready()

    n_iters = 5
    start = time.perf_counter()
    for _ in range(n_iters):
        out, codes = forward(params, audio)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    audio_seconds = batch * (n_samples / SAMPLE_RATE) * n_iters
    rtf = audio_seconds / elapsed

    print(json.dumps({
        "metric": "encode_decode_realtime_factor",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }))


if __name__ == "__main__":
    main()
