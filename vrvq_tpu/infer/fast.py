"""Fast-inference model preparation: decoder weight-norm fold, bf16 decode,
polynomial snake.

``make_inference_model(model, params)`` returns a ``(model', params')``
pair that is a drop-in replacement for every inference entry point
(``LevelSweep``, ``decode_chunked``, ``CodecProcessor``, plain
``model.apply``) with:

  * weight norm folded out of the DECODER (nn/fold.py). The encoder is left
    live by default: folding it changes how XLA fuses the ``g*v/||v||``
    rescale into the convs, which perturbs latents at the ulp level and
    flips ~1.4% of TPU code indices — for a measured ~0% speed gain.
  * the decoder in bf16 (``decode_dtype='bfloat16'``): folded kernels are
    stored as real bf16 arrays. Speed-neutral on v5e (decode is not
    FLOP-bound) but halves decoder activation HBM, lifting the
    batch-32 x 10 s one-shot decode OOM.
  * polynomial snake in the decoder (``snake_approx=True``): jnp.sin is the
    measured decode bottleneck on v5e (9.6 ms vs 0.8 ms memory floor per
    activation); the degree-4 sin^2 fit (|error| <= 4.5e-6, ops/snake.py)
    gives a measured 2.9x flagship decode / 1.6x end-to-end forward
    (BASELINE.md). Codes are unaffected.

Same-platform codes are bit-identical to the live model (same encoder
subgraph). Cross-platform (TPU vs CPU/torch) exactness is governed by
``encode_precision='highest'`` on the model, independent of this wrapper.
"""

from __future__ import annotations

import dataclasses
from dataclasses import replace
from typing import Optional, Tuple

from ..nn.fold import fold_weight_norm


def make_inference_model(
    model,
    params,
    decode_dtype: Optional[str] = "bfloat16",
    encode_dtype: Optional[str] = None,
    snake_approx: bool = True,
    encode_snake_approx: bool = False,
    fold_encoder: bool = False,
    encode_packed: bool = False,
    decode_packed: int = 0,
    decode_packed_up: int = 0,
) -> Tuple[object, dict]:
    """Prepare a model+params pair for fast inference.

    Args:
      model: a ``DAC_VRVQ`` / ``DAC_MOE`` instance.
      params: its live (training/converted) param tree ``{'params': ...}``.
      decode_dtype: decoder conv-stack compute dtype; ``None`` keeps the
        model's current decoder dtype. Codes are unaffected.
      encode_dtype: encoder conv-stack dtype. Leave ``None`` (f32) for
        same-platform bit-exact codebook indices; ``'bfloat16'`` is a fast
        approximate mode that changes a small fraction of indices (implies
        folding the encoder).
      snake_approx: polynomial sin^2 in the DECODER's snake activations
        (|error| <= 4.5e-6, far below bf16 rounding; measured 2.9x faster
        flagship decode on v5e where jnp.sin dominates). Codes unaffected.
      encode_snake_approx: opt-in polynomial snake in the ENCODER too —
        maximum-throughput mode; latents shift slightly so a small fraction
        of code indices changes (no longer bit-exact vs the live encoder).
      fold_encoder: also fold the encoder's weight norm. Perturbs TPU codes
        (see module docstring); only worth it together with
        ``encode_dtype='bfloat16'``.
      encode_packed: time-packed (space-to-depth x2) first encoder stage —
        the layout fix for the measured block_0 bottleneck (4.9% MXU at
        C=64, 177 ms of the 295 ms turbo encode; BASELINE.md roofline).
        Same params; ulp-level latent perturbation (conv summation order),
        so codes are NOT bit-exact vs the live model: gate with
        ``turbo_gate`` on your checkpoint before serving with it.
      decode_packed: number of trailing DecoderBlocks (+ the decoder tail)
        run in the time-packed layout (nn/layers.pack_convtranspose_kernel)
        — the decoder-side lane-occupancy fix (the tail computes at C=96
        over the full audio rate). Codes are UNTOUCHED (encoder/quantizer
        unchanged); the decoded waveform shifts at the ulp level only.
        Measured NEGATIVE on v5e (BASELINE.md round 4) — kept opt-in.
      decode_packed_up: pack ONLY the trailing blocks' 'up' transposed
        convs (dense sub-pixel matmul, unpacked before each block's
        ResidualUnits) — the cheap half of decode_packed, without the
        dilated-conv kernel blow-up that made it negative. Codes
        untouched; waveform shifts at the ulp level.

    Returns ``(model', params')``; the quantizer subtree is never touched.
    """
    import jax

    do_fold_encoder = fold_encoder or encode_dtype is not None
    p = params["params"]
    new_p = dict(p)
    # One jitted program per fold: folded kernels are produced device-side
    # with zero host<->device traffic (the old host-numpy fold round-tripped
    # ~330 MB of decoder params through this container's remote TPU tunnel,
    # dominating setup and wedging bench.py whenever the tunnel degraded).
    if do_fold_encoder:
        new_p["encoder"] = jax.jit(
            lambda t: fold_weight_norm(t, encode_dtype))(p["encoder"])
    new_p["decoder"] = jax.jit(
        lambda t: fold_weight_norm(t, decode_dtype))(p["decoder"])
    out_params = dict(params)
    out_params["params"] = new_p

    kw = dict(decoder_folded=True, encoder_folded=do_fold_encoder,
              decoder_snake_approx=snake_approx,
              encoder_snake_approx=encode_snake_approx,
              encoder_packed=encode_packed,
              decoder_packed=decode_packed,
              decoder_packed_up=decode_packed_up)
    if decode_dtype is not None:
        kw["decoder_compute_dtype"] = decode_dtype
    if encode_dtype is not None:
        kw["compute_dtype"] = encode_dtype
    return replace(model, **kw), out_params


def make_serving_model(model, params, encode_packed: bool = False,
                       decode_packed: int = 0,
                       decode_packed_up: int = 0) -> Tuple[object, dict]:
    """The gated max-throughput serving profile ("turbo"): the fast path
    plus polynomial snake in the ENCODER too (live f32 encoder convs).

    Measured on the trained flagship (v5e, BASELINE.md): ~325x RTF vs
    268x for the exact-codes fast path, and **457x** with
    ``encode_packed=True`` (time-packed first encoder stage, the
    measured block_0 lane-occupancy fix — encode 286→147 ms at
    b16x10 s). Both profiles pass ``turbo_gate`` on the trained
    20k-step checkpoint over the held-out probe corpus (round 5,
    BASELINE.md): turbo 37.4 dB mean / 35.0 dB min-clip SI-SDR decode
    agreement, 99.96% mask agreement; +encode_packed 39.4 dB mean /
    30.8 dB min-clip, 99.97% mask, 0.39% code flips. The packed profile
    is bench.py's headline. The stronger variant (+ folded bf16 encoder,
    ``encode_dtype='bfloat16'``) FAILED the 30 dB gate (26.2 dB, 1.2%
    flips, r3) — it stays opt-in; the bf16 encoder only buys ~1.06x
    because the encoder convs are HBM/layout-bound.

    Deploy behind ``turbo_gate`` on YOUR checkpoint + data: if the gate
    passes, this is the default to serve with; the bit-exact path stays
    one call away (``make_inference_model``). The verdict does not
    transfer between checkpoints or corpora: the same packed profile
    FAILED its gate on the rich-corpus 30k checkpoint (24 dB, mask
    agreement 99.5% — transient/noise content puts the imp-map near the
    mask threshold ~10x more often, MEASURE_r5_rich.jsonl), so that
    model serves the exact path.
    """
    return make_inference_model(model, params, encode_snake_approx=True,
                                encode_packed=encode_packed,
                                decode_packed=decode_packed,
                                decode_packed_up=decode_packed_up)


@dataclasses.dataclass
class GateResult:
    """Outcome of ``turbo_gate``: agreement of the turbo profile with the
    exact-codes fast path on the probe clips."""

    agreement_db: float        # SI-SDR between the two decoded outputs
    mask_agreement: float      # fraction of VBR mask entries that agree
    code_flip_rate: float      # fraction of code indices that changed
    min_agreement_db: float    # the pass threshold (dB)
    min_mask_agreement: float  # the pass threshold (fraction)
    passed: bool
    # Per-clip reporting (VERDICT r4 #5): a production-default decision
    # should see the worst clip, not just the batch mean.
    clip_agreement_db: tuple = ()
    min_clip_agreement_db: float = float("nan")
    probe: str = ""            # which corpus the verdict was measured on


def _probe_corpus(model, probe_dir, max_clips: int = 8):
    """Load held-out probe clips for the gate from a directory of wavs.

    Returns (B, 1, T) float32 trimmed to the shortest clip, or ``None``
    when the directory is missing/empty or the sample rates don't match
    the model (the caller falls back to synthetic harmonics). Relative
    paths are tried against both cwd and the repo root so bench/CI can
    run from anywhere.
    """
    from pathlib import Path

    import numpy as np

    from ..data.audio_io import read_wav

    cand = Path(probe_dir)
    if not cand.is_dir():
        cand = Path(__file__).resolve().parents[2] / probe_dir
    if not cand.is_dir():
        return None
    paths = sorted(cand.glob("*.wav"))[:max_clips]
    if not paths:
        return None
    rows = []
    sr_model = getattr(model, "sample_rate", 44100)
    for p in paths:
        data, sr = read_wav(p)
        if sr != sr_model:
            return None
        rows.append(np.asarray(data, np.float32)[0])  # first channel
    n = min(r.shape[0] for r in rows)
    return np.stack([r[:n] for r in rows])[:, None, :]


def turbo_gate(
    model,
    params,
    clips=None,
    level: float = 1.0,
    min_agreement_db: float = 30.0,
    min_mask_agreement: float = 0.999,
    seed: int = 0,
    probe_dir: str = "data_synth/test",
    **serving_kwargs,
) -> GateResult:
    """Accuracy gate for the turbo serving profile on a given checkpoint.

    Encodes ``clips`` (B, 1, T) with both the exact-codes fast path and
    the turbo profile, decodes BOTH code streams with the same (fast)
    decoder, and measures: SI-SDR agreement between the two
    reconstructions, VBR bitrate-mask agreement, and the raw
    code-index flip rate. ``passed`` is True when agreement_db >=
    min_agreement_db and mask_agreement >= min_mask_agreement — the
    deploy-the-turbo-default criterion.

    Run this on the TRAINED checkpoint and representative audio: a
    random-init model's argmax near-tie density inflates the flip rate
    (BASELINE.md) and understates agreement. When ``clips`` is None the
    gate probes the held-out corpus at ``probe_dir`` (the same clips
    ``scripts/evaluate.py`` scores, VERDICT r4 #5) and only falls back
    to in-function synthetic harmonics when that directory is absent.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    probe = "caller-supplied clips"
    if clips is None:
        clips = _probe_corpus(model, probe_dir)
        probe = f"held-out corpus {probe_dir} ({0 if clips is None else len(clips)} clips)"
    if clips is None:
        # Fallback: deterministic harmonic probe clips (2 s each): tonal
        # content exercises the imp-map/bitrate path better than noise.
        sr = getattr(model, "sample_rate", 44100)
        t = np.arange(2 * sr) / sr
        rng = np.random.RandomState(seed)
        rows = []
        for _ in range(4):
            f0 = rng.uniform(80, 500)
            x = sum(rng.uniform(0.05, 0.3) * np.sin(2 * np.pi * f0 * k * t)
                    for k in range(1, 6))
            rows.append(x)
        clips = np.stack(rows).astype(np.float32)[:, None, :]
        probe = "synthetic harmonics (4 clips, fallback)"
    clips = jnp.asarray(clips)

    exact_m, exact_p = make_inference_model(model, params)
    # serving_kwargs gate a VARIANT serving profile (e.g. encode_packed=True)
    turbo_m, turbo_p = make_serving_model(model, params, **serving_kwargs)

    def _encode(m, p):
        fn = jax.jit(lambda pp, a: m.apply(pp, a, level=level,
                                           method=type(m).encode))
        out = fn(p, clips)
        return out["codes"], out.get("mask_imp")

    codes_e, mask_e = _encode(exact_m, exact_p)
    codes_t, mask_t = _encode(turbo_m, turbo_p)

    dec = jax.jit(lambda pp, c, msk: exact_m.apply(
        pp, c, msk, method=type(exact_m).decode_from_codes))
    rec_e = np.asarray(dec(exact_p, codes_e, mask_e))
    rec_t = np.asarray(dec(exact_p, codes_t, mask_t))

    def _db(sig, err):
        return float("inf") if err == 0 else float(
            10 * np.log10(max(sig, 1e-12) / err))

    err = ((rec_e - rec_t) ** 2).sum()
    sig = (rec_e ** 2).sum()
    agreement_db = _db(sig, err)
    axes = tuple(range(1, rec_e.ndim))
    clip_db = tuple(
        _db(s, e) for s, e in zip(((rec_e ** 2).sum(axis=axes)),
                                  ((rec_e - rec_t) ** 2).sum(axis=axes)))

    ce_np = np.asarray(codes_e)
    if mask_e is None:  # CBR model: every stage always kept
        mask_agreement = 1.0
        both = np.ones(ce_np.shape, bool)
    else:
        mask_e_np, mask_t_np = np.asarray(mask_e), np.asarray(mask_t)
        mask_agreement = float((mask_e_np == mask_t_np).mean())
        # flips only count where BOTH masks keep the stage (dropped stages
        # carry no signal)
        both = (mask_e_np > 0) & (mask_t_np > 0)
    ct = np.asarray(codes_t)
    flips = float((ce_np[both] != ct[both]).mean()) if both.any() else 0.0

    return GateResult(
        agreement_db=agreement_db,
        mask_agreement=mask_agreement,
        code_flip_rate=flips,
        min_agreement_db=min_agreement_db,
        min_mask_agreement=min_mask_agreement,
        passed=(agreement_db >= min_agreement_db
                and mask_agreement >= min_mask_agreement),
        clip_agreement_db=clip_db,
        min_clip_agreement_db=min(clip_db) if clip_db else float("nan"),
        probe=probe,
    )
