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

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BASELINE_RTF = 50.0
SAMPLE_RATE = 44100


def main():
    from __graft_entry__ import _flagship, _init

    model = _flagship()

    batch = 16
    seconds = 10.0
    n_samples = int(seconds * SAMPLE_RATE)
    # pad to hop multiple so the jit program is the steady-state shape
    n_samples = ((n_samples + 511) // 512) * 512

    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(batch, 1, n_samples).astype(np.float32) * 0.1)
    params = _init(model, audio[:1])

    @jax.jit
    def forward(params, audio):
        out = model.apply(params, audio, level=1.0)
        # tiny reductions force full execution when fetched host-side
        # (block_until_ready alone does not synchronize through the axon
        # tunnel, so a host fetch per call is the honest barrier)
        return jnp.sum(out["audio"][:, :, ::1000]), out["codes"][0, 0, 0]

    # compile + warmup
    s, c = forward(params, audio)
    float(s), int(c)

    n_iters = 5
    times = []
    for _ in range(n_iters):
        start = time.perf_counter()
        s, c = forward(params, audio)
        float(s), int(c)  # host fetch = sync barrier
        times.append(time.perf_counter() - start)

    audio_seconds = batch * (n_samples / SAMPLE_RATE)
    rtf = audio_seconds / min(times)

    print(json.dumps({
        "metric": "encode_decode_realtime_factor",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }))


if __name__ == "__main__":
    main()
