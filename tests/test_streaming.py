"""Push-style streaming encoder/decoder: bit-parity with the file-oriented
compress/decompress path, arbitrary block sizes, latency accounting."""

import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.audio import Signal
from vrvq_tpu.infer.codec_api import CodecProcessor
from vrvq_tpu.infer.streaming import StreamingDecoder, StreamingEncoder
from vrvq_tpu.models import DAC_VRVQ

TINY = dict(
    encoder_dim=8, encoder_rates=(2, 4, 8, 8), decoder_dim=128,
    decoder_rates=(8, 8, 4, 2), n_codebooks=4, codebook_size=32,
    codebook_dim=4, sample_rate=44100, model_type="VBR",
    level_min=0.125, level_max=6.0,
)


@pytest.fixture(scope="module")
def proc():
    m = DAC_VRVQ(**TINY)
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, jnp.zeros((1, 1, 4096)), level=1.0)
    return CodecProcessor(m, params)


@pytest.fixture(scope="module")
def tone():
    t = np.arange(int(2.5 * 44100)) / 44100
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    x += 0.1 * np.sin(2 * np.pi * 1313 * t)
    return x.astype(np.float32)


def _random_blocks(x, rng, lo=1000, hi=30000):
    i = 0
    while i < len(x):
        n = rng.randint(lo, hi)
        yield x[i: i + n]
        i += n


def test_streaming_encoder_matches_compress_cbr(proc, tone):
    f = proc.compress(Signal(tone, 44100), win_duration=0.7,
                      normalize_db=None, n_quantizers=4)
    assert f.padding is False

    enc = StreamingEncoder(proc, win_duration=0.7, n_quantizers=4)
    chunks = []
    rng = np.random.RandomState(0)
    for block in _random_blocks(tone, rng):
        chunks += enc.push(block)
    chunks += enc.flush()
    codes = np.concatenate([c for c, _ in chunks], axis=-1)
    np.testing.assert_array_equal(codes, f.codes[0])
    assert all(cnt is None for _, cnt in chunks)


def test_streaming_encoder_matches_compress_vbr(proc, tone):
    f = proc.compress(Signal(tone, 44100), win_duration=0.7,
                      normalize_db=None, level=1.0)
    enc = StreamingEncoder(proc, win_duration=0.7, level=1.0)
    chunks = enc.push(tone) + enc.flush()
    codes = np.concatenate([c for c, _ in chunks], axis=-1)
    counts = np.concatenate([cnt for _, cnt in chunks], axis=-1)
    np.testing.assert_array_equal(codes, f.codes[0])
    np.testing.assert_array_equal(counts, f.vbr_counts[0])


def test_streaming_decoder_matches_chunked_decode(proc, tone):
    f = proc.compress(Signal(tone, 44100), win_duration=0.7,
                      normalize_db=None, n_quantizers=4)
    # expected: the decompress chunk loop (pre-normalization)
    expected = []
    n_q = f.codes.shape[1]
    for i in range(0, f.codes.shape[-1], f.chunk_length):
        c = f.codes[..., i: i + f.chunk_length]
        if c.shape[-1] < f.chunk_length:
            c = np.pad(c, ((0, 0), (0, 0), (0, f.chunk_length - c.shape[-1])))
        mask = jnp.ones((1, n_q, f.chunk_length), jnp.float32)
        expected.append(np.asarray(
            proc._decode_codes_nopad(jnp.asarray(c.astype(np.int32)), mask)
        )[0, 0])
    expected = np.concatenate(expected)

    dec = StreamingDecoder(proc, chunk_frames=f.chunk_length)
    out = []
    codes = f.codes[0]
    rng = np.random.RandomState(1)
    i = 0
    while i < codes.shape[-1]:  # push odd-sized frame blocks
        n = rng.randint(1, 2 * f.chunk_length)
        out += dec.push(codes[..., i: i + n])
        i += n
    out += dec.flush()
    got = np.concatenate(out)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_window_geometry_consistency(proc):
    """Encoder/decoder derive the same chunk size from win_duration, and
    the frames formula matches what the model actually produces."""
    for wd in (0.7, 1.0):
        enc = StreamingEncoder(proc, win_duration=wd, n_quantizers=2)
        dec = StreamingDecoder(proc, win_duration=wd)
        assert enc.chunk_frames == dec.chunk_frames
        out = enc.push(np.zeros(enc.samples_to_first_chunk, np.float32))
        assert len(out) == 1
        codes, _ = out[0]
        assert codes.shape[-1] == enc.chunk_frames  # formula == actual


def test_chunk_decode_length_equals_stride(proc):
    """Seamlessness invariant of the windowed spec: the padding-free
    decode of one chunk's frames must be EXACTLY the window stride, or
    concatenated chunks duplicate/drop audio at every boundary. For VBR
    models this requires the stride walk to skip the importance subnet's
    side-branch convs (window_geometry docstring) — the model-level walk
    (model.get_output_length, which mirrors the reference's every-conv
    walk, models/dac_base.py:112-127) understates it."""
    for wd in (0.7, 1.0):
        window, hop, frames, edge_delay = proc.window_geometry(wd)
        c = jnp.zeros((1, proc.model.n_codebooks, frames), jnp.int32)
        m = jnp.ones((1, proc.model.n_codebooks, frames), jnp.float32)
        decoded = proc._decode_codes_nopad(c, m)
        assert decoded.shape[-1] == hop
        # coverage bookkeeping: the window consumes at least the edge
        # delay on each side; strided-conv floor rounding can leave a few
        # hundred extra unconsumed samples on the right, which is slack,
        # not misalignment (the left offset is what the zero-pad matches)
        assert window - hop >= 2 * edge_delay
        assert edge_delay > 0


def test_streaming_roundtrip_vbr(proc, tone):
    enc = StreamingEncoder(proc, win_duration=0.7, level=2.0)
    dec = StreamingDecoder(proc, win_duration=0.7)
    audio_out = []
    for block in _random_blocks(tone, np.random.RandomState(2)):
        for codes, counts in enc.push(block):
            audio_out += dec.push(codes, counts)
    for codes, counts in enc.flush():
        audio_out += dec.push(codes, counts)
    audio_out += dec.flush()
    audio = np.concatenate(audio_out)
    # covers at least the real stream, in whole hops
    assert len(audio) >= len(tone)
    assert np.isfinite(audio).all()
    assert float(np.abs(audio).max()) > 1e-4  # nonzero signal came through


def test_latency_accounting(proc, tone):
    enc = StreamingEncoder(proc, win_duration=0.7, n_quantizers=2)
    n_first = enc.samples_to_first_chunk
    assert enc.push(tone[: n_first - 1]) == []
    chunks = enc.push(tone[n_first - 1: n_first])
    assert len(chunks) == 1


def test_streaming_errors(proc):
    with pytest.raises(ValueError):
        StreamingEncoder(proc, win_duration=0.01)
    enc = StreamingEncoder(proc, win_duration=0.7, n_quantizers=2)
    enc.flush()
    with pytest.raises(RuntimeError):
        enc.push(np.zeros(10, np.float32))


@pytest.mark.slow
def test_stream_demo_cli(tmp_path):
    """The serving demo CLI runs end-to-end on a tiny model (random
    params, no checkpoint) and writes a reconstruction wav."""
    import subprocess
    import sys as _sys

    from vrvq_tpu.data.audio_io import write_wav

    t = np.arange(int(1.6 * 44100)) / 44100
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav = tmp_path / "in.wav"
    write_wav(wav, x, 44100)
    yml = tmp_path / "tiny.yml"
    yml.write_text("\n".join(
        f"DAC_VRVQ.{k}: {list(v) if isinstance(v, tuple) else v}"
        for k, v in TINY.items()
    ))
    out = tmp_path / "out.wav"
    r = subprocess.run(
        [_sys.executable, "scripts/stream_demo.py",
         "--args.load", str(yml), "--input", str(wav),
         "--output", str(out), "--win_duration", "0.7",
         "--level", "1.0", "--block_ms", "50"],
        capture_output=True, text=True, timeout=600,
        cwd=Path(__file__).resolve().parents[1],
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "x realtime" in r.stdout and "kbps" in r.stdout
    assert out.exists()
    got = Signal.load(out)
    assert got.audio_data.shape[-1] == len(x)


def test_packet_codec_roundtrip_and_adaptation(proc, tone):
    """PacketCodec: every chunk survives the wire bit-exactly through a
    sender/receiver pair, and cross-packet adaptation shrinks later
    packets below the bit-packed size."""
    from vrvq_tpu.infer.streaming import PacketCodec

    enc = StreamingEncoder(proc, win_duration=0.7, level=1.5)
    chunks = enc.push(tone) + enc.flush()
    assert len(chunks) >= 3

    nq, k = proc.model.n_codebooks, proc.model.codebook_size
    sender, receiver = PacketCodec(nq, k), PacketCodec(nq, k)
    sizes = []
    for codes, counts in chunks:
        pkt = sender.pack(codes, counts)
        sizes.append(len(pkt))
        codes2, counts2 = receiver.unpack(pkt)
        np.testing.assert_array_equal(counts2, counts)
        mask = np.arange(nq)[:, None] < counts[None, :]
        np.testing.assert_array_equal(codes2[mask], codes[mask])
    # adaptive models persist: the last packet codes below fixed-width
    kept_last = int(chunks[-1][1].sum())
    bits = int(np.ceil(np.log2(k)))
    assert sizes[-1] < kept_last * bits / 8 + 16


def test_packet_codec_cbr(proc, tone):
    """CBR chunks — including n_quantizers < n_codebooks, which emit
    fewer stage rows — survive the wire; truncated/corrupt packets are
    rejected instead of silently desyncing the adaptive models."""
    from vrvq_tpu.infer.streaming import PacketCodec

    nq, k = proc.model.n_codebooks, proc.model.codebook_size
    for n_quant in (nq, 2):
        enc = StreamingEncoder(proc, win_duration=0.7, n_quantizers=n_quant)
        chunks = enc.push(tone) + enc.flush()
        sender, receiver = PacketCodec(nq, k), PacketCodec(nq, k)
        for codes, counts in chunks:
            assert counts is None
            assert codes.shape[0] == n_quant
            codes2, counts2 = receiver.unpack(sender.pack(codes))
            assert counts2 is None
            np.testing.assert_array_equal(codes2, codes)

    pkt = PacketCodec(nq, k).pack(chunks[0][0])
    with pytest.raises(ValueError, match="packet"):
        PacketCodec(nq, k).unpack(pkt[:-3])
    with pytest.raises(ValueError, match="packet"):
        PacketCodec(nq, k).unpack(pkt + b"xx")


def test_packet_codec_end_to_end_audio(proc, tone):
    """Full wire path: encoder -> packets -> decoder reproduces the same
    audio as the direct (no-wire) streaming path."""
    from vrvq_tpu.infer.streaming import PacketCodec

    nq, k = proc.model.n_codebooks, proc.model.codebook_size

    def run(wire: bool):
        enc = StreamingEncoder(proc, win_duration=0.7, level=1.0)
        dec = StreamingDecoder(proc, win_duration=0.7)
        snd, rcv = PacketCodec(nq, k), PacketCodec(nq, k)
        out = []
        for codes, counts in enc.push(tone) + enc.flush():
            if wire:
                codes, counts = rcv.unpack(snd.pack(codes, counts))
            out += dec.push(codes, counts)
        out += dec.flush()
        return np.concatenate(out)

    np.testing.assert_array_equal(run(wire=True), run(wire=False))


def test_streaming_over_fused_proc(proc, tone):
    """StreamingEncoder over a fused-quantizer CodecProcessor: identical
    codes AND counts to the module-path streaming encoder; the counts
    come fused inside the encode program (enc['counts'])."""
    fused = CodecProcessor(proc.model, proc.params, fused_quantizer=True)
    a = StreamingEncoder(proc, win_duration=0.7, level=1.5)
    b = StreamingEncoder(fused, win_duration=0.7, level=1.5)
    ca = a.push(tone) + a.flush()
    cb = b.push(tone) + b.flush()
    assert len(ca) == len(cb)
    for (codes_a, cnt_a), (codes_b, cnt_b) in zip(ca, cb):
        np.testing.assert_array_equal(codes_a, codes_b)
        np.testing.assert_array_equal(cnt_a, cnt_b)


def test_stream_pool_matches_single_stream(proc, tone):
    """N pooled streams (batched encode, pow2-padded) must produce
    bit-identical chunks to N independent StreamingEncoders, in FIFO
    order per stream."""
    from vrvq_tpu.infer.streaming import StreamPool

    streams = {f"s{i}": np.roll(tone, 4000 * i)[: len(tone) - 3000 * i]
               for i in range(3)}
    # reference: independent single-stream encoders
    expected = {}
    for sid, x in streams.items():
        enc = StreamingEncoder(proc, win_duration=0.7, level=1.0)
        expected[sid] = enc.push(x) + enc.flush()

    pool = StreamPool(proc, win_duration=0.7, level=1.0, max_batch=4)
    got = {sid: [] for sid in streams}
    rngs = {sid: np.random.RandomState(i) for i, sid in enumerate(streams)}
    for sid in streams:
        pool.add_stream(sid)
    cursors = {sid: 0 for sid in streams}
    # interleave pushes in odd-sized blocks across streams
    while any(cursors[sid] < len(x) for sid, x in streams.items()):
        for sid, x in streams.items():
            c = cursors[sid]
            if c < len(x):
                n = rngs[sid].randint(2000, 25000)
                pool.push(sid, x[c: c + n])
                cursors[sid] = c + n
        for sid, codes, counts in pool.poll():
            got[sid].append((codes, counts))
    for sid in list(streams):
        pool.flush(sid)
    for sid, codes, counts in pool.poll():
        got[sid].append((codes, counts))

    for sid in streams:
        assert len(got[sid]) == len(expected[sid]), sid
        for (gc, gn), (ec, en) in zip(got[sid], expected[sid]):
            np.testing.assert_array_equal(gc, ec)
            np.testing.assert_array_equal(gn, en)


def test_stream_pool_errors(proc):
    from vrvq_tpu.infer.streaming import StreamPool

    pool = StreamPool(proc, win_duration=0.7, n_quantizers=2)
    pool.add_stream("a")
    with pytest.raises(ValueError):
        pool.add_stream("a")
    with pytest.raises(KeyError):
        pool.push("missing", np.zeros(10, np.float32))


def test_decoder_pool_matches_single_stream(proc, tone):
    """Batched chunk decoding equals per-stream StreamingDecoder audio to
    float rounding (XLA may vectorize convs differently per batch size,
    so float outputs are allclose, not bit-equal)."""
    from vrvq_tpu.infer.streaming import DecoderPool, StreamPool

    pool = StreamPool(proc, win_duration=0.7, level=1.0, max_batch=4)
    for sid in ("a", "b"):
        pool.add_stream(sid)
        pool.push(sid, np.roll(tone, 7000 if sid == "b" else 0))
        pool.flush(sid)
    chunks = pool.poll()

    # reference: per-stream StreamingDecoder
    decs = {sid: StreamingDecoder(proc, win_duration=0.7) for sid in ("a", "b")}
    expected = {sid: [] for sid in ("a", "b")}
    for sid, codes, counts in chunks:
        expected[sid] += decs[sid].push(codes, counts)

    dp = DecoderPool(proc, win_duration=0.7, max_batch=4)
    for sid, codes, counts in chunks:
        dp.push(sid, codes, counts)
    got = {sid: [] for sid in ("a", "b")}
    for sid, audio in dp.poll():
        got[sid].append(audio)

    for sid in ("a", "b"):
        assert len(got[sid]) == len(expected[sid])
        for g, e in zip(got[sid], expected[sid]):
            np.testing.assert_allclose(g, e, atol=1e-5, rtol=1e-4)

    with pytest.raises(ValueError, match="whole chunks"):
        dp.push("a", chunks[0][1][..., :-1])


def test_stream_pool_over_mesh(proc, tone):
    """Serving scale-out: a CodecProcessor built over an 8-device mesh
    shards pooled batches across the chips (params replicated, batch
    axis data-parallel) and the pooled codes stay bit-identical to the
    meshless pool. Decode side goes through DecoderPool on the same
    mesh; audio matches to float rounding."""
    from vrvq_tpu.infer.streaming import DecoderPool, StreamPool
    from vrvq_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    mproc = CodecProcessor(proc.model, proc.params, mesh=mesh)

    def run(p, max_batch):
        pool = StreamPool(p, win_duration=0.7, level=1.0,
                          max_batch=max_batch)
        for i, sid in enumerate(("a", "b", "c")):
            pool.add_stream(sid)
            pool.push(sid, np.roll(tone, 5000 * i))
            pool.flush(sid)
        return pool.poll()

    ref = run(proc, max_batch=4)
    got = run(mproc, max_batch=16)  # one sharded dispatch, mesh-padded
    assert len(got) == len(ref)
    by_sid_ref = {}
    for sid, codes, counts in ref:
        by_sid_ref.setdefault(sid, []).append((codes, counts))
    by_sid_got = {}
    for sid, codes, counts in got:
        by_sid_got.setdefault(sid, []).append((codes, counts))
    assert by_sid_got.keys() == by_sid_ref.keys()
    for sid in by_sid_ref:
        assert len(by_sid_got[sid]) == len(by_sid_ref[sid])
        for (gc, gn), (ec, en) in zip(by_sid_got[sid], by_sid_ref[sid]):
            np.testing.assert_array_equal(gc, ec)
            np.testing.assert_array_equal(gn, en)

    # the staged batch really is sharded over the mesh
    xs = np.zeros((16, 1, mproc.window_geometry(0.7)[0]), np.float32)
    staged = mproc.put_batch(xs)
    assert len({s.device for s in staged.addressable_shards}) == 8

    dp = DecoderPool(mproc, win_duration=0.7, max_batch=16)
    for sid, codes, counts in got:
        dp.push(sid, codes, counts)
    decs = {sid: StreamingDecoder(proc, win_duration=0.7)
            for sid in by_sid_ref}
    expected = {sid: [] for sid in by_sid_ref}
    for sid, codes, counts in got:
        expected[sid] += decs[sid].push(codes, counts)
    out = {sid: [] for sid in by_sid_ref}
    for sid, audio in dp.poll():
        out[sid].append(audio)
    for sid in by_sid_ref:
        assert len(out[sid]) == len(expected[sid])
        for g, e in zip(out[sid], expected[sid]):
            np.testing.assert_allclose(g, e, atol=1e-5, rtol=1e-4)
