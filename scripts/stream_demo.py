"""Live-streaming codec demo: wav -> push-style encode/decode -> wav.

Drives the serving path (`vrvq_tpu.infer.streaming`) end to end the way a
real-time service would: audio arrives in arbitrary-sized blocks, each
filled window yields a codes chunk immediately, and each chunk decodes to
a hop-sized waveform segment. Reports algorithmic latency and per-chunk
wall-clock. The reference has no serving CLI at all (its
compress/decompress are stubs, models/dac_base.py:129-141).

Usage:
    python scripts/stream_demo.py --args.load conf/vrvq/vrvq_a2.yml \
        --ckpt_dir ckpt --tag latest --input in.wav --output out.wav \
        --win_duration 1.0 --level 1.0 [--block_ms 20] [--fused_quantizer 1] \
        [--entropy 1]   # range-coded wire packets (PacketCodec)
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("JAX_PLATFORMS") not in (None, "", "axon"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from vrvq_tpu.config import parse_args
from vrvq_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def stream(cfg):
    from vrvq_tpu.data.audio_io import read_audio, write_wav
    from vrvq_tpu.infer.codec_api import CodecProcessor
    from vrvq_tpu.infer.streaming import (
        PacketCodec, StreamingDecoder, StreamingEncoder,
    )
    from vrvq_tpu.models import DAC_VRVQ
    from vrvq_tpu.train.checkpoint import load_gen_params

    model = DAC_VRVQ(**cfg.kwargs("DAC_VRVQ"))
    params = load_gen_params(cfg, model)
    proc = CodecProcessor(
        model, params,
        fused_quantizer=bool(cfg.get("fused_quantizer", False)),
    )

    sr = model.sample_rate
    audio, in_sr = read_audio(cfg.get("input"))
    assert in_sr == sr, f"input must be {sr} Hz (got {in_sr})"
    x = np.asarray(audio, np.float32).reshape(-1)
    if len(x) == 0:
        raise ValueError(f"--input {cfg.get('input')} contains no audio")

    win = float(cfg.get("win_duration", 1.0))
    level = cfg.get("level", 1.0)
    n_q = cfg.get("n_quantizers")
    enc = StreamingEncoder(proc, win_duration=win, n_quantizers=n_q,
                           level=None if n_q is not None else level)
    dec = StreamingDecoder(proc, win_duration=win)
    entropy = bool(cfg.get("entropy", False))
    sender = receiver = None
    if entropy:
        sender = PacketCodec(model.n_codebooks, model.codebook_size)
        receiver = PacketCodec(model.n_codebooks, model.codebook_size)
    block = max(1, int(float(cfg.get("block_ms", 20)) / 1000 * sr))

    print(f"stream: {len(x) / sr:.2f}s in {block}-sample blocks; "
          f"window={enc.window} hop={enc.hop} "
          f"first-chunk latency={enc.samples_to_first_chunk / sr * 1000:.0f} ms")

    out, chunk_ms, bits = [], [], 0
    bits_per_code = int(np.ceil(np.log2(model.codebook_size)))

    def consume(chunks):
        nonlocal bits
        for codes, counts in chunks:
            t0 = time.perf_counter()
            if entropy:  # through the range-coded wire format
                packet = sender.pack(codes, counts)
                bits += len(packet) * 8
                codes, counts = receiver.unpack(packet)
            else:
                kept = counts.sum() if counts is not None else codes.size
                bits += int(kept) * bits_per_code
            out.extend(dec.push(codes, counts))
            chunk_ms.append((time.perf_counter() - t0) * 1000)

    t_start = time.perf_counter()
    for i in range(0, len(x), block):
        consume(enc.push(x[i: i + block]))
    consume(enc.flush())
    out.extend(dec.flush())
    wall = time.perf_counter() - t_start

    y = np.concatenate(out)[: len(x)]
    write_wav(cfg.get("output", "stream_out.wav"), y[None, :], sr)
    dur = len(x) / sr
    kbps = bits / dur / 1000
    wire = "wire " if entropy else ""
    print(f"done: {dur:.2f}s audio in {wall:.2f}s wall "
          f"({dur / wall:.1f}x realtime), {kbps:.1f} {wire}kbps, "
          f"{len(chunk_ms)} chunks, per-chunk decode "
          f"median {np.median(chunk_ms):.1f} ms (first includes compile)")


if __name__ == "__main__":
    cfg = parse_args(base_dir=Path(__file__).resolve().parents[1])
    stream(cfg)
