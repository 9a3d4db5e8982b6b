"""Measure the time-packed first encoder stage on the real chip.

Times the flagship turbo serving profile with and without
``encode_packed=True`` (encode-only and full forward, batch 16 x 10 s)
and runs the accuracy gate on the packed variant. Prints one JSON line
per measurement, incrementally, so a tunnel wedge mid-run keeps the
earlier numbers. Bounded: run under ``timeout`` (the watcher does).

Usage: python scripts/measure_packed.py [batch seconds]
(defaults 16 10.0; pass e.g. ``2 1.0`` for a CPU smoke run)
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from bench import SAMPLE_RATE, _bench_audio, _build, _sync, _timeit


def main():
    import jax.numpy as jnp

    from vrvq_tpu.infer.fast import make_serving_model, turbo_gate

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    model, params = _build(init_seconds=min(seconds, 10.0))
    audio, n = _bench_audio(batch=batch, seconds=seconds, seed=0)
    secs = batch * (n / SAMPLE_RATE)

    for name, packed in (("turbo", False), ("turbo_packed", True)):
        m, p = make_serving_model(model, params, encode_packed=packed)

        enc = jax.jit(lambda pp, a, m=m: m.apply(
            pp, a, level=1.0, method=type(m).encode)["codes"][0, 0, 0])
        dt_enc = _timeit(lambda: _sync(enc(p, audio)))

        fwd = jax.jit(lambda pp, a, m=m: jnp.sum(
            m.apply(pp, a, level=1.0)["audio"][:, :, ::1000]))
        dt_fwd = _timeit(lambda: _sync(fwd(p, audio)))

        print(json.dumps({
            "profile": name,
            "encode_ms": round(dt_enc * 1e3, 1),
            "forward_ms": round(dt_fwd * 1e3, 1),
            "rtf": round(secs / dt_fwd, 1),
        }), flush=True)

    res = turbo_gate(model, params, encode_packed=True)
    print(json.dumps({
        "gate": "packed_vs_exact_random_init",
        "agreement_db": round(res.agreement_db, 1),
        "mask_agreement": round(res.mask_agreement, 5),
        "code_flip_rate": round(res.code_flip_rate, 5),
        "passed": bool(res.passed),
    }), flush=True)


if __name__ == "__main__":
    main()
