"""Round-4 on-chip measurement: trained-checkpoint gates + packed decoder.

Round 3 measured the time-packed encoder at 457.9x RTF but only gated it
at random init, where argmax near-tie density dominates (BASELINE.md).
This CLI runs everything against a TRAINED checkpoint (default ckpt_20k):

  1. turbo_gate(encode_packed=True) on the trained flagship — the deploy
     decision for flipping bench.py's headline to the packed encoder.
  2. decoder-packed agreement: decode the SAME codes with the normal and
     the packed decoder (decode_packed = 1 / 2); codes are untouched by
     construction, so the check is SI-SDR between the two waveforms.
  3. timing: turbo / +encode_packed / +decode_packed=1 / +decode_packed=2
     (encode-only and full forward, batch 16 x 10 s by default).

Prints one JSON line per measurement, incrementally, so a tunnel wedge
mid-run keeps the earlier numbers. Bounded: run under ``timeout``.

Usage: python scripts/measure_r4.py [batch seconds ckpt_dir probe_dir]
(defaults 16 10.0 ckpt_20k data_synth/test; pass e.g. ``2 1.0`` for a
CPU smoke run). ``probe_dir`` selects the gate's held-out probe corpus —
point it at the corpus the checkpoint trained against (e.g.
``data_synth_rich/test`` for a `vrvq_a2_synth_rich_30k` run).
The script refuses near-init checkpoints (<1000 steps): the gates exist
precisely because near-init argmax near-ties produce meaningless verdicts
(round-3 random-init 18.7 dB, round-4 step-1 25.3 dB — both artifacts).
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax

from bench import SAMPLE_RATE, _bench_audio, _sync, _timeit


def _trained_flagship(ckpt_dir="ckpt_20k", min_steps=1000):
    """Flagship model + a TRAINED checkpoint's generator params.

    Asserts the checkpoint has actually trained: gate verdicts on a
    near-init model reproduce the near-tie artifact this script exists
    to avoid (ADVICE r4; ckpt_demo was clobbered to a step-1 snapshot).
    """
    from vrvq_tpu.config import Config
    from vrvq_tpu.models import DAC_VRVQ
    from vrvq_tpu.train import checkpoint as ckpt

    meta = ckpt.load_metadata(REPO / ckpt_dir, tag="latest")
    step = int(meta.get("step", 0))
    if step < min_steps:
        raise SystemExit(
            f"{ckpt_dir} is at step {step} (< {min_steps}): a near-init "
            "checkpoint gives meaningless gate verdicts (argmax near-tie "
            "density). Point at a trained checkpoint, e.g. ckpt_20k."
        )
    cfg = Config.load("conf/vrvq/vrvq_a2_synth_demo.yml", base_dir=str(REPO))
    cfg["ckpt_dir"] = str(REPO / ckpt_dir)
    cfg["tag"] = "latest"
    model = DAC_VRVQ(**cfg.kwargs("DAC_VRVQ"))
    params = ckpt.load_gen_params(cfg, model)
    return model, params


def main():
    import jax.numpy as jnp
    import numpy as np

    from vrvq_tpu.infer.fast import make_serving_model, turbo_gate
    from vrvq_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    ckpt_dir = sys.argv[3] if len(sys.argv) > 3 else "ckpt_20k"
    probe_dir = sys.argv[4] if len(sys.argv) > 4 else "data_synth/test"
    model, params = _trained_flagship(ckpt_dir)
    print(json.dumps({"ckpt_dir": ckpt_dir, "probe_dir": probe_dir}),
          flush=True)
    audio, n = _bench_audio(batch=batch, seconds=seconds, seed=0)
    secs = batch * (n / SAMPLE_RATE)

    # ---- 1. trained-checkpoint gates: plain turbo (re-establishes the
    # serving-default verdict on THIS checkpoint) and the packed encoder
    # (the deploy decision for flipping bench.py's headline)
    for gname, kw in (("turbo_vs_exact_TRAINED", {}),
                      ("packed_encoder_vs_exact_TRAINED",
                       dict(encode_packed=True))):
        res = turbo_gate(model, params, probe_dir=probe_dir, **kw)
        print(json.dumps({
            "gate": gname,
            "agreement_db": round(res.agreement_db, 1),
            "min_clip_agreement_db": round(res.min_clip_agreement_db, 1),
            "clip_agreement_db": [round(d, 1) for d in res.clip_agreement_db],
            "mask_agreement": round(res.mask_agreement, 5),
            "code_flip_rate": round(res.code_flip_rate, 5),
            "probe": res.probe,
            "passed": bool(res.passed),
        }), flush=True)

    # ---- 2. packed-decoder agreement (same codes, two decoders)
    probe, _ = _bench_audio(batch=4, seconds=2.0, seed=7)
    base_m, base_p = make_serving_model(model, params)
    enc = jax.jit(lambda pp, a: base_m.apply(
        pp, a, level=1.0, method=type(base_m).encode))
    out = enc(base_p, probe)
    codes, mask = out["codes"], out.get("mask_imp")

    def _decode(m, p):
        fn = jax.jit(lambda pp, c, msk: m.apply(
            pp, c, msk, method=type(m).decode_from_codes))
        return np.asarray(fn(p, codes, mask))

    rec_base = _decode(base_m, base_p)
    for tag, dkw in (("packed_decoder_1", dict(decode_packed=1)),
                     ("packed_decoder_2", dict(decode_packed=2)),
                     ("packed_up_decoder_1", dict(decode_packed_up=1)),
                     ("packed_up_decoder_2", dict(decode_packed_up=2))):
        m_p, p_p = make_serving_model(model, params, **dkw)
        rec_p = _decode(m_p, p_p)
        err = ((rec_base - rec_p) ** 2).sum()
        sig = (rec_base ** 2).sum()
        db = float("inf") if err == 0 else float(
            10 * np.log10(max(sig, 1e-12) / err))
        print(json.dumps({
            "gate": f"{tag}_vs_base_TRAINED",
            "agreement_db": round(db, 1),
        }), flush=True)

    # ---- 3. timing sweep (decpacked = r4 full packed tail, a recorded
    # negative; decup = r5 up-conv-only packing)
    variants = (
        ("turbo", dict()),
        ("turbo_encpacked", dict(encode_packed=True)),
        ("turbo_encpacked_decup1", dict(encode_packed=True,
                                        decode_packed_up=1)),
        ("turbo_encpacked_decup2", dict(encode_packed=True,
                                        decode_packed_up=2)),
        ("turbo_encpacked_decpacked1", dict(encode_packed=True,
                                            decode_packed=1)),
    )
    for name, kw in variants:
        m, p = make_serving_model(model, params, **kw)

        enc_t = jax.jit(lambda pp, a, m=m: m.apply(
            pp, a, level=1.0, method=type(m).encode)["codes"][0, 0, 0])
        dt_enc = _timeit(lambda: _sync(enc_t(p, audio)))

        fwd = jax.jit(lambda pp, a, m=m: jnp.sum(
            m.apply(pp, a, level=1.0)["audio"][:, :, ::1000]))
        dt_fwd = _timeit(lambda: _sync(fwd(p, audio)))

        print(json.dumps({
            "profile": name,
            "encode_ms": round(dt_enc * 1e3, 1),
            "forward_ms": round(dt_fwd * 1e3, 1),
            "decode_ms_in_fwd": round((dt_fwd - dt_enc) * 1e3, 1),
            "rtf": round(secs / dt_fwd, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
