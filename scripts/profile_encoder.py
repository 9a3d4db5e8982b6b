"""Per-stage roofline profile of the codec's conv stacks on the live device.

The serving forward is encoder-bound (BASELINE.md: encode ~295 ms poly vs
decode ~185 ms in-forward at b16 x 10 s) and the encoder is known to be
"HBM/layout-bound, not FLOP-bound" in aggregate — but no per-stage
breakdown exists to say WHICH block is off its roofline. This script times
each stage in isolation (in-conv, block_0..3, final snake+out-conv, and the
same for the decoder) and prints, per stage:

    ms/iter, GFLOPs, achieved TF/s, % of MXU peak, GB touched,
    achieved GB/s, % of HBM peak

FLOPs/bytes come from XLA's cost analysis of the single-application
executable. Timing chains R applications inside ONE jit (per-iteration
input rescale by (1 + 1e-12*i) defeats CSE) and divides the delta between
two chain lengths, so the ~26 ms tunnel dispatch floor and the one-off
input scale cancel (CLAUDE.md methodology).

Usage:
    python scripts/profile_encoder.py            # flagship, b16 x 10 s
    python scripts/profile_encoder.py --tiny     # CPU smoke (seconds)

Reference for stage structure: /root/reference/models/dac_vrvq.py:19-80.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from vrvq_tpu.utils import enable_compilation_cache

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vrvq_tpu.nn.layers import EncoderBlock, DecoderBlock, Snake1d, WNConv1d

SAMPLE_RATE = 44100
PEAK_FLOPS = 197e12   # v5e bf16 MXU
PEAK_BYTES = 819e9    # v5e HBM bandwidth


class _PackedFront(nn.Module):
    """in_conv + block_0 in the time-packed (space-to-depth x2) layout —
    the lane-occupancy fix for the measured block_0 bottleneck (4.9% MXU
    at C=64; see nn/layers.pack_conv_kernel). Compare this row against
    the sum of the unpacked in_conv + block_0 rows."""
    d_model: int
    stride: int
    snake_approx: bool

    @nn.compact
    def __call__(self, x):  # raw audio (B, T, 1)
        x = x.reshape(x.shape[0], x.shape[1] // 2, 2)
        x = WNConv1d(1, self.d_model, kernel_size=7, padding=3,
                     time_pack_in=2, time_pack_out=2, name="in_conv")(x)
        return EncoderBlock(2 * self.d_model, stride=self.stride,
                            snake_approx=self.snake_approx, time_pack=2,
                            name="block_0")(x)


class _EncHead(nn.Module):
    """Encoder tail: Snake -> k=3 out conv (dac_vrvq.Encoder tail)."""
    dim: int
    latent_dim: int
    snake_approx: bool

    @nn.compact
    def __call__(self, x):
        x = Snake1d(self.dim, approx=self.snake_approx, name="snake")(x)
        return WNConv1d(self.dim, self.latent_dim, kernel_size=3, padding=1,
                        name="out_conv")(x)


class _DecHead(nn.Module):
    """Decoder tail: Snake -> k=7 out conv -> tanh (dac_vrvq.Decoder tail).
    Runs at C=dim (flagship: 96) over the FULL audio rate — the same
    half-empty-lane geometry as the encoder's block_0."""
    dim: int
    d_out: int
    snake_approx: bool

    @nn.compact
    def __call__(self, x):
        x = Snake1d(self.dim, approx=self.snake_approx, name="snake")(x)
        x = WNConv1d(self.dim, self.d_out, kernel_size=7, padding=3,
                     name="out_conv")(x)
        return jnp.tanh(x)


def _chain(apply_fn, params, x, reps: int):
    """R applications of ``apply_fn`` inside one jit; per-iteration input
    rescale defeats CSE; a strided-slice reduction keeps the fetch tiny."""

    @jax.jit
    def run(p, x0):
        def body(carry, i):
            y = apply_fn(p, x0 * (1.0 + 1e-12 * i))
            return carry + jnp.sum(y[:, ::257, :].astype(jnp.float32)), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(reps, dtype=jnp.float32))
        return c

    return run


def _fetch(x):
    return float(np.asarray(x))


def _time_stage(apply_fn, params, x, reps_lo=2, reps_hi=10, iters=3):
    # big stages: shorter chains — the scan keeps x0 + one body instance
    # of temps live; the full-rate f32 blocks OOM 16 GB HBM at R=10, and
    # dec/block_3 (bf16 1.35 GB input, 2x upsample inside) OOMed at the
    # old 1.5 GB threshold too
    if x.size * x.dtype.itemsize > 0.9e9:
        reps_lo, reps_hi = 1, 4
    lo = _chain(apply_fn, params, x, reps_lo)
    hi = _chain(apply_fn, params, x, reps_hi)
    _fetch(lo(params, x)), _fetch(hi(params, x))  # compile both
    t_lo = min(_timed(lambda: _fetch(lo(params, x))) for _ in range(iters))
    t_hi = min(_timed(lambda: _fetch(hi(params, x))) for _ in range(iters))
    return max((t_hi - t_lo) / (reps_hi - reps_lo), 1e-9)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _cost(apply_fn, params, x):
    """FLOPs + bytes accessed of ONE application, from XLA cost analysis."""
    try:
        comp = jax.jit(apply_fn).lower(params, x).compile()
        cost = comp.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)), \
            float(cost.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def profile(batch=16, seconds=10.0, d_model=64, strides=(2, 4, 8, 8),
            latent_dim=1024, decoder_dim=1536, decoder_rates=(8, 8, 4, 2),
            snake_approx=True, seed=0):
    """Returns a list of per-stage dicts (name, ms, gflops, tf_s, mxu_pct,
    gbytes, gb_s, hbm_pct), encoder stages then decoder stages."""
    rng = np.random.RandomState(seed)
    n = ((int(seconds * SAMPLE_RATE) + 511) // 512) * 512
    key = jax.random.PRNGKey(seed)

    rows = []

    def add(name, module, x):
        # init/apply MUST be jitted: eager flax init at (16, 441344, 64)
        # allocates every intermediate un-scheduled and OOMs 16 GB HBM
        params = jax.jit(module.init)(key, x)
        y = jax.jit(module.apply)(params, x)  # next stage's input either way
        apply_fn = module.apply
        try:
            dt = _time_stage(apply_fn, params, x)
            flops, byts = _cost(apply_fn, params, x)
            row = {
                "stage": name,
                "ms": round(dt * 1e3, 2),
                "gflops": round(flops / 1e9, 1),
                "tf_s": round(flops / dt / 1e12, 1),
                "mxu_pct": round(100 * flops / dt / PEAK_FLOPS, 1),
                "gbytes": round(byts / 1e9, 2),
                "gb_s": round(byts / dt / 1e9, 0),
                "hbm_pct": round(100 * byts / dt / PEAK_BYTES, 1),
            }
        except Exception as e:  # the remote compile helper 500s sporadically
            row = {"stage": name, "error": f"{type(e).__name__}"}
        rows.append(row)
        # incremental emission: a crash/OOM later must not lose earlier rows
        print(json.dumps(row), flush=True)
        return y

    # ---- encoder stages (turbo profile: live f32 convs, poly snake) ----
    x_raw = jnp.asarray(rng.randn(batch, n, 1).astype(np.float32) * 0.1)
    x = add("enc/in_conv k7 1->%d" % d_model,
            WNConv1d(1, d_model, kernel_size=7, padding=3), x_raw)
    d = d_model
    for i, s in enumerate(strides):
        d *= 2
        x = add(f"enc/block_{i} s{s} ->{d}ch",
                EncoderBlock(d, stride=s, snake_approx=snake_approx), x)
        if i == 0 and s == 2:
            # packed alternative for the same work (vs in_conv + block_0)
            add(f"enc/in+block_0 PACKED ->{d}ch",
                _PackedFront(d_model, s, snake_approx), x_raw)
    add(f"enc/tail snake+k3 {d}->{latent_dim}",
        _EncHead(d, latent_dim, snake_approx), x)

    # ---- decoder stages (bf16, matching the serving profile's folded
    # bf16 decoder; modules compute in the input dtype) ----
    t_frames = x.shape[1]
    z = jnp.asarray(rng.randn(batch, t_frames, latent_dim)
                    .astype(np.float32) * 0.1).astype(jnp.bfloat16)
    z = add(f"dec/in_conv k7 {latent_dim}->{decoder_dim}",
            WNConv1d(latent_dim, decoder_dim, kernel_size=7, padding=3), z)
    for i, r in enumerate(decoder_rates):
        in_d = decoder_dim // (2 ** i)
        out_d = decoder_dim // (2 ** (i + 1))
        z = add(f"dec/block_{i} r{r} {in_d}->{out_d}",
                DecoderBlock(in_d, out_d, r, snake_approx=snake_approx), z)
    tail_d = decoder_dim // (2 ** len(decoder_rates))
    add(f"dec/tail snake+k7 {tail_d}->1", _DecHead(tail_d, 1, snake_approx), z)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny shapes on CPU (smoke test)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        rows = profile(batch=2, seconds=0.2, d_model=8, latent_dim=16,
                       decoder_dim=32)
    else:
        enable_compilation_cache()
        rows = profile(batch=args.batch, seconds=args.seconds)

    w = max(len(r["stage"]) for r in rows)
    print(f"{'stage':<{w}}  {'ms':>8} {'GF':>8} {'TF/s':>7} {'%MXU':>6} "
          f"{'GB':>7} {'GB/s':>7} {'%HBM':>6}")
    for r in rows:
        if "error" in r:
            print(f"{r['stage']:<{w}}  ERROR {r['error']}")
            continue
        print(f"{r['stage']:<{w}}  {r['ms']:>8.2f} {r['gflops']:>8.1f} "
              f"{r['tf_s']:>7.1f} {r['mxu_pct']:>6.1f} {r['gbytes']:>7.2f} "
              f"{r['gb_s']:>7.0f} {r['hbm_pct']:>6.1f}")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
