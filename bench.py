"""Benchmark: 44.1 kHz encode+decode realtime factor per chip (+MFU,
train-step, and large-batch chunked-decode configs).

Runs the flagship (82M-param, vrvq_a2 topology) DAC_VRVQ wav->codes->wav
forward on the available accelerator and reports the realtime factor
(seconds of audio processed per second of wall clock). The BASELINE.json
north-star is >=50x realtime per v5e chip, so vs_baseline = value / 50.

The headline forward uses the production TURBO+PACKED serving profile
(infer/fast.py make_serving_model(encode_packed=True): polynomial snake
everywhere, live f32 encoder convs with the time-packed first stage,
folded bf16 decoder — measured ~457x vs 325x unpacked turbo vs 268x
exact-codes fast path vs 169x live-f32 on v5e). This profile is the
serving headline because the accuracy gate (infer/fast.py turbo_gate)
passes on the TRAINED 20k-step checkpoint over the held-out probe
corpus (round 5, BASELINE.md): packed-encoder 39.4 dB mean / 30.8 dB
min-clip SI-SDR turbo-vs-exact decode agreement, 99.97% bitrate-mask
agreement, 0.39% code flips (plain turbo: 37.4 dB / 35.0 dB min-clip).
The bf16-encoder variant FAILED the gate (26.2 dB, r3) and stays
opt-in. The exact-codes path is one call away (rtf_exact_fast below).
The gate verdict is per checkpoint x corpus, not per profile: the SAME
packed-turbo profile FAILS its gate on the rich-corpus 30k checkpoint
(24 dB / 99.5% mask, MEASURE_r5_rich.jsonl) — that model serves the
exact path. The headline here measures the profile's speed, which is
weight-independent; deployment always goes through turbo_gate.

Structure (hard-deadline, early-emission — the round-2 artifact was lost
to a driver timeout because one wedged phase forfeited the whole run):
  * a global wall-clock budget (BENCH_BUDGET_S env, default 900 s) bounds
    EVERYTHING; every subprocess timeout is derived from the remainder;
  * the headline is retried in fresh subprocesses (probe-gated) while
    budget remains — the tunnel wedges intermittently and clears within
    minutes, so one stalled attempt must not forfeit the artifact;
  * DEGRADED-TUNNEL FALLBACK: the tunnel has also been observed alive but
    ~100x slow (a trivial-matmul probe takes ~105 s; the full b16x10s
    headline then times out no matter how often it is retried). After the
    first full-size timeout on a live tunnel, a reduced workload
    (same flagship turbo model, batch 4 x 2 s, 2 timed iters) is attempted
    too; if only it succeeds, its honestly-measured RTF is emitted with
    "degraded": true + a note instead of a value-0 error record;
  * the headline JSON line is printed (and flushed) immediately after the
    headline phase, BEFORE any optional phase runs — even if the driver
    kills this process mid-phase, the captured stdout holds the number;
  * each optional phase runs in its own bounded subprocess; a hung phase
    costs its field, not the artifact;
  * if any optional field was gathered, one final enriched JSON line is
    printed with the same headline fields plus the extras (both lines
    parse to a valid record, whichever the driver picks).

Extra fields in the enriched line:
  * mfu              — model FLOPs utilization of the fast forward
                        (FLOPs from XLA cost analysis / time / peak)
  * rtf_exact_fast   — the exact-codes fast path (live encoder, folded
                        bf16 decoder + poly snake): codes bit-identical
                        to the live model
  * rtf_live_f32     — the exact live-f32 forward's realtime factor
  * gate_*           — the turbo accuracy gate run on this chip (NB: on
                        the bench's random-init weights the flip rate is
                        inflated by argmax near-ties; the deploy decision
                        uses the trained-checkpoint gate in BASELINE.md)
  * train_step_ms    — full GAN train step (gen+disc, split-step),
                        batch 16 x 0.38 s
  * rtf_b32_chunked  — fast-path encode + memory-bounded chunked decode at
                        batch 32 x 10 s (one-shot f32 decode OOMs HBM there)
  * stream_pool_rtf  — 32 live streams through StreamPool's batched,
                        dispatch-overlapped serving encode (+ the
                        single-stream first-chunk encode latency)
"""

import json
import os
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
# v5e peak: 197 TFLOP/s bf16 (MXU); f32 runs through the same MXU via
# multi-pass emulation, so bf16 peak is the honest (conservative) divisor.
PEAK_FLOPS = 197e12


def _sync(*host_fetches):
    """Fetch scalars to the host — the only honest barrier through the
    remote tunnel (block_until_ready does not synchronize here)."""
    return [float(np.asarray(x)) for x in host_fetches]


def _timeit(fn, n_iters=5):
    fn()  # warmup (compile)
    times = []
    for _ in range(n_iters):
        start = time.perf_counter()
        fn()
        times.append(time.perf_counter() - start)
    return min(times)


def _headline_record(rtf, mfu=None):
    out = {
        "metric": "encode_decode_realtime_factor",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    return out


def _bench_audio(batch, seconds, seed):
    n = ((int(seconds * SAMPLE_RATE) + 511) // 512) * 512
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(batch, 1, n).astype(np.float32) * 0.1), n


def _forward_fn(m):
    @jax.jit
    def forward(params, audio):
        out = m.apply(params, audio, level=1.0)
        return jnp.sum(out["audio"][:, :, ::1000]), out["codes"][0, 0, 0]
    return forward


def bench_headline(model, params, batch=16, seconds=10.0, n_iters=5):
    """Headline forward: the turbo serving profile with the time-packed
    first encoder stage (make_serving_model(encode_packed=True) —
    polynomial snake everywhere, packed live f32 encoder). Headline
    since round 5: turbo_gate passes on the trained 20k-step checkpoint
    over the held-out corpus (39.4 dB mean / 30.8 dB min-clip decode
    agreement, 99.97% mask agreement, 0.39% flips — BASELINE.md round-5
    table), and the packed first stage is a measured 1.96x on encode
    (457x vs 325x RTF at b16x10 s)."""
    audio, n = _bench_audio(batch=batch, seconds=seconds, seed=0)

    from vrvq_tpu.infer.fast import make_serving_model

    fast_model, fast_params = make_serving_model(model, params,
                                                 encode_packed=True)
    fast_fwd = _forward_fn(fast_model)
    # Compile ONCE, explicitly, and reuse the executable for both timing and
    # the FLOPs probe (a post-hoc .lower().compile() would build a fresh
    # executable through the remote helper, which can hang after all the
    # numbers are already in hand).
    compiled = fast_fwd.lower(fast_params, audio).compile()
    dt = _timeit(lambda: _sync(*compiled(fast_params, audio)), n_iters=n_iters)
    rtf = batch * (n / SAMPLE_RATE) / dt

    mfu = None
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops:
            mfu = flops / dt / PEAK_FLOPS
    except Exception:
        pass
    return rtf, mfu


def bench_live_f32(model, params):
    """The exact live-f32 forward (no fold, no bf16, exact sin snake)."""
    audio, n = _bench_audio(batch=16, seconds=10.0, seed=0)
    fwd = _forward_fn(model)
    dt = _timeit(lambda: _sync(*fwd(params, audio)))
    return 16 * (n / SAMPLE_RATE) / dt


def bench_exact_fast(model, params):
    """The exact-codes fast path (live encoder, folded bf16 decoder +
    poly snake): codes bit-identical to the live model."""
    from vrvq_tpu.infer.fast import make_inference_model

    audio, n = _bench_audio(batch=16, seconds=10.0, seed=0)
    fast_model, fast_params = make_inference_model(model, params)
    fwd = _forward_fn(fast_model)
    dt = _timeit(lambda: _sync(*fwd(fast_params, audio)))
    return 16 * (n / SAMPLE_RATE) / dt


def _precompile_enrichment(model, params):
    """Lower+compile the exact-fast and live-f32 forward programs NOW —
    immediately after the headline compile, while the tunnel is proven
    healthy (VERDICT r4 #4: enrichment compiles used to run serially
    after the timing loops and hit the phase cap on a degraded tunnel).
    The executables land in the persistent .jax_cache, so the later
    bench_exact_fast/bench_live_f32 calls (fresh jit objects, same HLO)
    reload them in seconds instead of recompiling remotely."""
    from vrvq_tpu.infer.fast import make_inference_model

    audio, _ = _bench_audio(batch=16, seconds=10.0, seed=0)
    fast_model, fast_params = make_inference_model(model, params)
    _forward_fn(fast_model).lower(fast_params, audio).compile()
    _forward_fn(model).lower(params, audio).compile()


def bench_gate(model, params):
    """Run the turbo accuracy gate on this chip against the HEADLINE
    serving profile (encode_packed=True). On the bench's random-init
    weights this is a mechanism + hardware-numerics check only — the
    deploy decision uses the trained-checkpoint gate in BASELINE.md
    (round 5: ckpt_20k, held-out corpus, PASSED)."""
    from vrvq_tpu.infer.fast import turbo_gate

    res = turbo_gate(model, params, encode_packed=True)
    return {
        "gate_agreement_db": round(res.agreement_db, 1),
        "gate_mask_agreement": round(res.mask_agreement, 5),
        "gate_code_flip_rate": round(res.code_flip_rate, 5),
        "gate_passed_random_init": bool(res.passed),
    }


def bench_b32_chunked(model, params):
    """Batch 32 x 10 s via fully chunked encode+decode — the one-shot
    program OOMs HBM at this shape in BOTH conv stacks (encoder block_0
    holds 6.7 GB full-rate activations; decoder similar)."""
    from vrvq_tpu.infer.chunked import forward_chunked

    audio, n = _bench_audio(batch=32, seconds=10.0, seed=1)

    @jax.jit
    def forward(params, audio):
        # auto chunk: even split, windows capped near 512 latent frames
        out, codes = forward_chunked(model, params, audio, level=1.0)
        return jnp.sum(out[:, :, ::1000]), codes[0, 0, 0]

    dt = _timeit(lambda: _sync(*forward(params, audio)))
    return 32 * (n / SAMPLE_RATE) / dt


def bench_train_step(model, params):
    from vrvq_tpu.models import Discriminator
    from vrvq_tpu.losses import L1Loss, MultiScaleSTFTLoss, MelSpectrogramLoss
    from vrvq_tpu.train.state import make_optimizer
    from vrvq_tpu.train.loop import make_split_train_steps, init_train_state

    disc = Discriminator(periods=(2, 3, 5, 7, 11),
                         fft_sizes=(2048, 1024, 512), rates=())
    opt_g = make_optimizer(max_grad_norm=1e3)
    opt_d = make_optimizer(max_grad_norm=10.0)
    lambdas = {
        "mel/loss": 15.0, "adv/feat_loss": 2.0, "adv/gen_loss": 1.0,
        "vq/commitment_loss": 0.25, "vq/codebook_loss": 1.0,
        "vq/rate_loss": 2.0,
    }
    stft_l = MultiScaleSTFTLoss()
    mel_l = MelSpectrogramLoss(
        n_mels=(5, 10, 20, 40, 80, 160, 320),
        window_lengths=(32, 64, 128, 256, 512, 1024, 2048),
        mel_fmin=(0,) * 7, mel_fmax=(None,) * 7, pow=1.0,
        clamp_eps=1e-5, mag_weight=0.0, sample_rate=SAMPLE_RATE,
    )
    d_step, g_step = make_split_train_steps(
        model, disc, opt_g, opt_d, lambdas, stft_l, mel_l, L1Loss(),
    )
    d_step = jax.jit(d_step, donate_argnums=0)
    g_step = jax.jit(g_step, donate_argnums=0)

    audio, _ = _bench_audio(batch=16, seconds=0.38, seed=2)
    state = init_train_state(model, disc, opt_g, opt_d, audio[:1])
    key = jax.random.PRNGKey(0)

    # Compile both halves explicitly up front; reuse the executables for
    # timing AND the FLOPs probe (no fresh post-timing compiles).
    d_comp = d_step.lower(state, audio, key).compile()
    state2, _ = d_comp(state, audio, key)
    g_comp = g_step.lower(state2, audio, key).compile()

    flops = 0.0
    try:
        for comp in (d_comp, g_comp):
            cost = comp.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops += float(cost.get("flops", 0.0))
    except Exception:
        flops = 0.0

    state_box = [state]

    def step():
        st, m1 = d_comp(state_box[0], audio, key)
        st, m2 = g_comp(st, audio, key)
        state_box[0] = st
        _sync(m2["loss"])

    dt = _timeit(step, n_iters=5)
    # NB: dt includes the ~26 ms host-sync tunnel round-trip plus the Python
    # gap between the two dispatches, so train_mfu understates true device
    # MFU by a few percent at the ~200 ms step scale.
    train_mfu = (flops / dt / PEAK_FLOPS) if flops else None
    return dt * 1e3, train_mfu


def bench_fused_encode(model, params):
    """Serving-encode time, module quantizer vs fused Pallas RVQ kernel
    (CodecProcessor fused_quantizer), batch 16 x 10 s VBR."""
    from vrvq_tpu.infer.codec_api import CodecProcessor

    audio, _ = _bench_audio(batch=16, seconds=10.0, seed=3)

    module = CodecProcessor(model, params)
    fused = CodecProcessor(model, params, fused_quantizer=True)

    def run(proc):
        enc = proc._encode_pad(audio, None, 1.0)
        _sync(enc["codes"][0, 0, 0])

    t_module = _timeit(lambda: run(module))
    t_fused = _timeit(lambda: run(fused))
    enc_m = module._encode_pad(audio, None, 1.0)
    enc_f = fused._encode_pad(audio, None, 1.0)
    c_m, c_f = np.asarray(enc_m["codes"]), np.asarray(enc_f["codes"])
    assert (c_m == c_f).all(), "fused encode codes diverged from module path"
    # counts parity on REAL hardware: the fused path thresholds imp_map
    # inside the encode program; XLA fusion differences could flip
    # borderline frames (CPU interpret tests can't catch that)
    n_m = module._vbr_counts(enc_m, 1.0)
    n_f = fused._vbr_counts(enc_f, 1.0)
    assert (n_m == n_f).all(), "fused encode VBR counts diverged"
    return {
        "encode_module_ms": round(t_module * 1e3, 1),
        "encode_fused_ms": round(t_fused * 1e3, 1),
        "encode_fused_speedup": round(t_module / t_fused, 3),
    }


def bench_stream_pool(model, params):
    """Multi-stream serving throughput: 32 live streams x 10 s through
    StreamPool's batched, dispatch-overlapped encode (max_batch 16,
    1 s windows), pushed round-robin in 0.5 s blocks like a live
    frontend. Also reports the single-stream first-chunk latency
    (algorithmic window fill excluded — the encode dispatch only)."""
    from vrvq_tpu.infer.codec_api import CodecProcessor
    from vrvq_tpu.infer.streaming import StreamingEncoder, StreamPool

    proc = CodecProcessor(model, params)
    seconds, n_streams = 10.0, 32
    rng = np.random.RandomState(4)
    clips = [rng.randn(int(seconds * SAMPLE_RATE)).astype(np.float32) * 0.1
             for _ in range(n_streams)]

    def run():
        pool = StreamPool(proc, win_duration=1.0, level=1.0, max_batch=16)
        for i in range(n_streams):
            pool.add_stream(i)
        chunks = 0
        block = SAMPLE_RATE // 2
        for off in range(0, int(seconds * SAMPLE_RATE), block):
            for i, x in enumerate(clips):
                pool.push(i, x[off: off + block])
            chunks += len(pool.poll())
        for i in range(n_streams):
            pool.flush(i)
        chunks += len(pool.poll())
        return chunks

    run()  # warmup: compiles every padded batch size the loop uses
    t0 = time.perf_counter()
    chunks = run()
    dt = time.perf_counter() - t0
    out = {
        "stream_pool_rtf": round(n_streams * seconds / dt, 1),
        "stream_pool_streams": n_streams,
        "stream_pool_chunks": chunks,
    }

    warm = StreamingEncoder(proc, win_duration=1.0, level=1.0)
    warm.push(clips[0][: warm.samples_to_first_chunk])  # compile (1,1,W)
    enc1 = StreamingEncoder(proc, win_duration=1.0, level=1.0)
    x = clips[1][: enc1.samples_to_first_chunk]
    t0 = time.perf_counter()
    got = enc1.push(x)
    dt = time.perf_counter() - t0
    if got:
        out["first_chunk_encode_ms"] = round(dt * 1e3, 1)
    return out


def _run_phase(phase: str, timeout_s: float):
    """Run a bench phase in a subprocess and merge its JSON lines.
    Isolation matters: a flaky remote compile/runtime can wedge a dispatch
    indefinitely (observed: cached train-step executables dying
    UNIMPLEMENTED after a remote runtime restart, then hanging the device)
    — a hung phase must cost its field, not the artifact.

    The child emits one flushed JSON line per record (the headline child
    also runs the exact/live/gate enrichment in-process, where the model
    init and compile cache are already warm — a fresh subprocess per
    enrichment field paid a fresh remote compile each, which is how round
    3's enrichment timed out on a degraded tunnel). A timeout salvages the
    child's partial stdout, so the fields measured before the wedge
    survive."""
    import subprocess

    stdout = ""
    try:
        proc = subprocess.run(
            [sys.executable, __file__, f"--phase={phase}"],
            capture_output=True, text=True, timeout=timeout_s,
            env={**os.environ, "BENCH_PHASE_BUDGET_S": str(timeout_s - 10)},
        )
        stdout = proc.stdout or ""
        if not any(ln.startswith("{") for ln in stdout.splitlines()):
            print(f"# {phase} bench produced no JSON "
                  f"(rc={proc.returncode}): {proc.stderr[-300:]}",
                  file=sys.stderr)
    except subprocess.TimeoutExpired as e:
        stdout = e.stdout or ""
        if isinstance(stdout, bytes):
            stdout = stdout.decode("utf-8", "replace")
        print(f"# {phase} bench timed out after {timeout_s:.0f}s "
              f"(salvaging partial output)", file=sys.stderr)
    except Exception as e:
        print(f"# {phase} bench failed: {e!r}", file=sys.stderr)
    merged = {}
    for line in stdout.splitlines():
        if line.startswith("{"):
            try:
                merged.update(json.loads(line))
            except json.JSONDecodeError:
                pass  # a line cut mid-write by the timeout
    return merged


def _build(init_seconds=10.0):
    """init_seconds only sets the length of the zeros clip the jitted init
    traces over — params are shape-independent of T, but a short clip makes
    the init program itself far cheaper on a degraded tunnel."""
    from __graft_entry__ import _flagship, _init

    model = _flagship()
    n0 = ((int(init_seconds * SAMPLE_RATE) + 511) // 512) * 512
    params = _init(model, jnp.zeros((1, 1, n0), jnp.float32))
    return model, params


def _probe_device(timeout_s: float) -> bool:
    """Bounded liveness probe in a subprocess: the remote TPU tunnel has
    been observed fully down for hours (backend init hangs or raises
    UNAVAILABLE) — without this, bench would hang instead of producing an
    artifact."""
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            text=True, timeout=timeout_s,
        )
        return proc.returncode == 0
    except Exception:
        return False


def _child_main(phase: str):
    model, params = _build(init_seconds=2.0 if phase == "headline_small"
                           else 10.0)
    if phase == "headline":
        t_end = time.monotonic() + float(
            os.environ.get("BENCH_PHASE_BUDGET_S", "1e9"))
        rtf, mfu = bench_headline(model, params)
        print(json.dumps(_headline_record(rtf, mfu)), flush=True)
        # Front-load the enrichment compiles while the tunnel is proven
        # healthy (the headline just compiled+ran). Cheap when .jax_cache
        # is warm; on a cold cache this banks the executables before a
        # mid-phase degrade can strand them.
        if t_end - time.monotonic() > 120:
            try:
                _precompile_enrichment(model, params)
            except Exception as e:
                print(f"# enrichment precompile failed: {e!r}",
                      file=sys.stderr)
        # Enrichment runs HERE, in the already-warm process (model init
        # done, compile cache primed) — each field is one flushed JSON
        # line, so a mid-phase wedge costs the remaining fields only (the
        # parent salvages partial stdout on timeout).
        enrich = (
            ("rtf_exact_fast",
             lambda: round(bench_exact_fast(model, params), 2)),
            ("rtf_live_f32",
             lambda: round(bench_live_f32(model, params), 2)),
            ("gate", lambda: bench_gate(model, params)),
        )
        for name, fn in enrich:
            if t_end - time.monotonic() < 45:
                print(f"# headline child skipping {name}: phase budget "
                      "exhausted", file=sys.stderr)
                continue
            try:
                val = fn()
                print(json.dumps(val if isinstance(val, dict)
                                 else {name: val}), flush=True)
            except Exception as e:
                print(f"# headline child {name} failed: {e!r}",
                      file=sys.stderr)
    elif phase == "headline_small":
        # degraded-tunnel fallback: same flagship turbo model, reduced
        # workload — honestly measured but underestimates peak RTF (less
        # batch/length amortization of fixed per-dispatch overheads)
        rtf, mfu = bench_headline(model, params, batch=4, seconds=2.0,
                                  n_iters=2)
        rec = _headline_record(rtf, mfu)
        rec["degraded"] = True
        rec["workload"] = "b4x2s_fallback"
        rec["note"] = (
            "reduced-workload fallback: the full b16x10s headline timed out "
            "on a degraded tunnel; this RTF underestimates peak — see "
            "BASELINE.md for full-workload numbers (311.8x measured on this "
            "chip)")
        print(json.dumps(rec))
    elif phase == "live":
        print(json.dumps({"rtf_live_f32": round(bench_live_f32(model, params), 2)}))
    elif phase == "exact":
        print(json.dumps({"rtf_exact_fast": round(bench_exact_fast(model, params), 2)}))
    elif phase == "gate":
        print(json.dumps(bench_gate(model, params)))
    elif phase == "b32":
        from vrvq_tpu.infer.fast import make_inference_model

        fast_model, fast_params = make_inference_model(model, params)
        print(json.dumps(
            {"rtf_b32_chunked": round(bench_b32_chunked(fast_model, fast_params), 2)}
        ))
    elif phase == "train":
        step_ms, train_mfu = bench_train_step(model, params)
        rec = {"train_step_ms": round(step_ms, 1)}
        if train_mfu is not None:
            rec["train_mfu"] = round(train_mfu, 4)
        print(json.dumps(rec))
    elif phase == "fused":
        print(json.dumps(bench_fused_encode(model, params)))
    elif phase == "pool":
        print(json.dumps(bench_stream_pool(model, params)))
    else:
        raise SystemExit(f"unknown phase {phase}")


def main():
    phase = next((a.split("=", 1)[1] for a in sys.argv[1:]
                  if a.startswith("--phase=")), None)
    if phase is not None:
        _child_main(phase)
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", "900"))
    deadline = time.monotonic() + budget

    def rem():
        return deadline - time.monotonic()

    # The remote tunnel wedges INTERMITTENTLY (observed repeatedly on
    # 2026-08-19: an 8x8 matmul probe succeeds, a full headline run
    # succeeds minutes later, then the next run stalls mid-phase; wedges
    # clear on their own within minutes). So: retry the headline in fresh
    # subprocesses while budget remains — each attempt opens a fresh tunnel
    # connection — gating retries (never the FIRST attempt: a probe would
    # starve the headline's remote compile, which is how an early r03
    # attempt failed) on a cheap liveness probe so a hard-down tunnel
    # doesn't burn the budget in doomed full-model attempts.
    out, small, alive = {}, {}, True
    attempt = full_timeouts = small_attempts = 0
    while "value" not in out and rem() > 180:
        attempt += 1
        if attempt > 1:
            # 150 s probe cap: a DEGRADED tunnel answers a trivial matmul
            # in ~105 s (observed 2026-08-19) — a 90 s cap misclassified
            # alive-but-slow as dead and forfeited the fallback below.
            alive = _probe_device(timeout_s=max(20.0, min(150.0, rem() - 30)))
            if not alive:
                time.sleep(min(30.0, max(0.0, rem() - 150)))
                continue
            # Alive tunnel but the full-size program already timed out:
            # likely degraded-not-wedged — grab the reduced-workload number
            # BEFORE burning the remaining budget on more full attempts.
            if (full_timeouts >= 1 and "value" not in small
                    and small_attempts < 2 and rem() > 200):
                small_attempts += 1
                small = _run_phase(
                    "headline_small",
                    timeout_s=max(90.0, min(rem() - 60, 300.0)))
        # The cap covers headline + in-child enrichment; the headline line
        # is flushed first, so a timeout mid-enrichment still yields it.
        out = _run_phase(
            "headline", timeout_s=max(90.0, min(rem() - 40, 600.0)))
        if "value" not in out:
            full_timeouts += 1
    if "value" not in out and "value" in small:
        # The honest degraded record (flagged by the child) beats value-0.
        print(json.dumps(small), flush=True)
        return
    if "value" not in out:
        if alive:  # last attempt ran on a live tunnel; re-check before blaming it
            alive = _probe_device(timeout_s=max(20.0, min(150.0, rem() + 30)))
        print(json.dumps({
            "metric": "encode_decode_realtime_factor",
            "value": 0,
            "unit": "x_realtime_per_chip",
            "vs_baseline": 0,
            "error": (
                "headline forward failed/timed out within budget "
                f"({budget:.0f} s) — accelerator IS reachable; see stderr"
                + ("; reduced-workload fallback also failed"
                   if small_attempts else "")
                if alive else
                "accelerator unreachable (remote TPU tunnel down; last "
                "good run: see BENCH_r artifacts / BASELINE.md)"
            ),
        }), flush=True)
        sys.exit(1)

    # EARLY EMISSION: the artifact is safe from this point on, whatever the
    # optional phases do.
    print(json.dumps(out), flush=True)

    extras = {}
    # (phase, minimum budget to bother, per-phase cap) — ordered by value.
    # exact/live/gate now ride inside the headline child (warm process);
    # only the phases needing different model/process setups remain here.
    for ph, need, cap in (("train", 120, 300), ("b32", 90, 240),
                          ("fused", 90, 240), ("pool", 90, 300)):
        r = rem()
        if r < need + 20:
            print(f"# skipping {ph}: {r:.0f}s of budget left", file=sys.stderr)
            continue
        extras.update(_run_phase(ph, timeout_s=min(cap, r - 15)))
    if extras:
        out.update(extras)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
