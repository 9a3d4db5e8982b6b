"""Push-style streaming codec: unbounded audio in, codes out, with
constant memory — the serving-side counterpart of the file-oriented
:class:`~vrvq_tpu.infer.codec_api.CodecProcessor`.

The reference's windowed-chunking spec (models/dac_base.py:196-284, dead
code upstream; implemented for real in ``codec_api``) processes a whole
file at once. A live service instead receives audio incrementally. These
classes share the window arithmetic of ``CodecProcessor.compress``
(``CodecProcessor.window_geometry``: padding-free codec, ``delay``-padded
stream ends, stride = padding-free output length) but maintain it as
*state*, so:

  * ``StreamingEncoder.push(samples)`` accepts arbitrary-size sample
    blocks and yields ``(codes, vbr_counts)`` chunks as soon as each
    window fills;
  * ``StreamingDecoder.push(codes)`` accepts arbitrary-size frame blocks
    and yields waveform segments, concatenating to exactly the
    ``decompress`` output (pre-normalization; trim the concatenation to
    the real stream length, as ``decompress`` trims to
    ``original_length``);
  * memory is O(window), not O(stream).

Parity contract: for audio already in [-1, 1] and a stream LONGER than
``win_duration``, the concatenated ``StreamingEncoder`` codes are
bit-identical to ``CodecProcessor.compress(..., normalize_db=None)``.
The two deliberate divergences from ``compress``:

  * loudness/peak normalization is NOT part of the streaming path —
    BS.1770 loudness and ``ensure_max_of_audio`` are *global* gains over
    the whole signal (reference models/dac_base.py:164-171), which a live
    stream cannot know; gain-stage upstream. Audio outside [-1, 1] is
    therefore encoded as-is here but peak-rescaled by ``compress``.
  * a stream no longer than one window still uses the windowed
    padding-free codec (one zero-padded window), where ``compress`` picks
    the padded one-shot codec for short files; the streaming
    encode->decode roundtrip is self-consistent, but codes differ from
    ``compress`` for such short inputs.

Algorithmic latency: the first codes chunk appears after
``window - delay`` real samples; each chunk covers ``hop`` samples.

Example::

    enc = StreamingEncoder(proc, win_duration=1.0, level=1.0)
    dec = StreamingDecoder(proc, win_duration=1.0)
    for block in microphone():              # any block size
        for codes, counts in enc.push(block):
            for audio in dec.push(codes, counts):
                play(audio)                 # hop-sized segments
    for codes, counts in enc.flush():
        ...
"""

from __future__ import annotations

import math
import struct
from typing import Any, Iterator, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .codec_api import CodecProcessor


def _padded_batch(b: int, mesh=None) -> int:
    """Pad a pool batch to the next power of two (bounds the number of
    compiled programs to log2(max_batch)+1) and, when the processor
    serves over a mesh, up to a mesh multiple so the batch axis shards
    evenly across the chips."""
    bp = 1 << (b - 1).bit_length()
    if mesh is not None:
        n = mesh.devices.size
        bp = max(bp, n)
        bp += (-bp) % n
    return bp


class _WindowBuffer:
    """Per-stream host state: turns an incremental sample stream into the
    windowed-spec's fixed-size windows (left delay pad, stride ``hop``,
    right delay pad + zero tail at flush). Pure buffering — encoding is
    the caller's job, so one stream (StreamingEncoder) and many batched
    streams (StreamPool) share the exact same window arithmetic."""

    def __init__(self, window: int, hop: int, delay: int):
        self.window, self.hop, self.delay = window, hop, delay
        # buffer holds padded-stream samples from absolute index `start`;
        # window w covers padded[w*hop : w*hop + window]
        self._buf = np.zeros((delay,), np.float32)  # left delay pad
        self._start = 0
        self._windows_out = 0
        self._real_len = 0
        self.flushed = False

    def push(self, samples: np.ndarray) -> List[np.ndarray]:
        """Buffer a block; return the windows that completed."""
        if self.flushed:
            raise RuntimeError("push() after flush()")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._real_len += len(samples)
        out = []
        while True:
            begin = self._windows_out * self.hop
            end = begin + self.window
            if end > self._start + len(self._buf):
                return out
            out.append(self._buf[begin - self._start: end - self._start])
            self._windows_out += 1
            # drop consumed prefix: nothing before the next window's
            # begin is needed again
            keep_from = self._windows_out * self.hop
            if keep_from > self._start:
                self._buf = self._buf[keep_from - self._start:]
                self._start = keep_from

    def flush(self) -> List[np.ndarray]:
        """End of stream: the remaining windows (right delay pad + zero
        tail), exactly like ``compress``'s final chunks."""
        if self.flushed:
            return []
        self.flushed = True
        self._buf = np.concatenate(
            [self._buf, np.zeros((self.delay,), np.float32)]
        )
        total_windows = math.ceil(self._real_len / self.hop)
        out = []
        while self._windows_out < total_windows:
            begin = self._windows_out * self.hop
            x = self._buf[begin - self._start: begin - self._start + self.window]
            if len(x) < self.window:
                x = np.pad(x, (0, self.window - len(x)))
            self._windows_out += 1
            out.append(x)
        return out


class StreamingEncoder:
    """Incremental windowed encoder over a :class:`CodecProcessor`.

    Parameters mirror ``CodecProcessor.compress`` (win_duration,
    n_quantizers, level); audio is a single mono stream at the model
    sample rate, gain-staged to [-1, 1] upstream (see module docstring).
    """

    def __init__(
        self,
        proc: CodecProcessor,
        win_duration: float = 1.0,
        n_quantizers: Optional[int] = None,
        level: Optional[float] = None,
    ):
        self.proc = proc
        self.n_quantizers = n_quantizers
        self.level = level
        self.vbr = n_quantizers is None and level is not None

        self.window, self.hop, self.chunk_frames, self.delay = (
            proc.window_geometry(win_duration)
        )
        self._wb = _WindowBuffer(self.window, self.hop, self.delay)

    @property
    def samples_to_first_chunk(self) -> int:
        """Real samples needed before the first codes chunk appears."""
        return self.window - self.delay

    def _encode_window(self, x: np.ndarray) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        enc = self.proc._encode_nopad(
            jnp.asarray(x[None, None, :]),
            self.n_quantizers,
            self.level if self.level is not None else 1.0,
        )
        codes = np.asarray(enc["codes"])[0]
        assert codes.shape[-1] == self.chunk_frames, (
            f"window geometry drift: expected {self.chunk_frames} frames, "
            f"model produced {codes.shape[-1]}"
        )
        counts = None
        if self.vbr:
            counts = self.proc._vbr_counts(enc, self.level)[0]
        return codes, counts

    def push(self, samples: np.ndarray) -> List[Tuple[np.ndarray, Optional[np.ndarray]]]:
        """Feed a block of samples (any length, shape (T,)); returns the
        list of ``(codes (Nq, F), vbr_counts (F,) | None)`` chunks whose
        windows completed."""
        return [self._encode_window(x) for x in self._wb.push(samples)]

    def flush(self) -> List[Tuple[np.ndarray, Optional[np.ndarray]]]:
        """End of stream: emit the remaining windows (right delay pad +
        zero tail), exactly like ``compress``'s final chunks."""
        return [self._encode_window(x) for x in self._wb.flush()]


class StreamPool:
    """Many independent live streams through BATCHED encode dispatches.

    Production serving rarely runs one stream per chip:
    :class:`StreamingEncoder` encodes each ready window as a (1, 1, W)
    program call, which underfills the accelerator and pays one dispatch
    round-trip per window. A pool separates the two concerns: per-stream
    host-side window buffering (``_WindowBuffer``, the exact arithmetic
    the single-stream encoder uses) and device work — ``poll()`` stacks
    every ready window across ALL streams and encodes them in batches of
    at most ``max_batch``, padding the final partial batch up to the next
    power of two so only log2(max_batch)+1 compiled programs ever exist.

    Codes equal the single-stream encoder's bit-for-bit (batch is a
    parallel dimension of the conv/quantizer math; asserted in tests).

    Usage::

        pool = StreamPool(proc, win_duration=1.0, level=1.0, max_batch=8)
        pool.add_stream("caller-1")
        pool.push("caller-1", block)           # buffers only
        for sid, codes, counts in pool.poll(): # one batched dispatch
            send(sid, codes, counts)
        pool.flush("caller-1")                 # queue tail windows
        leftovers = pool.poll()
    """

    def __init__(
        self,
        proc: CodecProcessor,
        win_duration: float = 1.0,
        n_quantizers: Optional[int] = None,
        level: Optional[float] = None,
        max_batch: int = 8,
    ):
        self.proc = proc
        self.n_quantizers = n_quantizers
        self.level = level
        self.vbr = n_quantizers is None and level is not None
        self.max_batch = int(max_batch)
        self.window, self.hop, self.chunk_frames, self.delay = (
            proc.window_geometry(win_duration)
        )
        self._streams: dict = {}
        self._pending: List[Tuple[Any, np.ndarray]] = []

    def add_stream(self, sid) -> None:
        if sid in self._streams:
            raise ValueError(f"stream {sid!r} already exists")
        self._streams[sid] = _WindowBuffer(self.window, self.hop, self.delay)

    def push(self, sid, samples: np.ndarray) -> None:
        """Buffer a block for one stream; encoding happens in poll()."""
        for w in self._streams[sid].push(samples):
            self._pending.append((sid, w))

    def flush(self, sid) -> None:
        """Queue the stream's tail windows and remove it."""
        wb = self._streams.pop(sid)
        for w in wb.flush():
            self._pending.append((sid, w))

    def poll(self) -> List[Tuple[Any, np.ndarray, Optional[np.ndarray]]]:
        """Encode every pending window, batched; returns
        ``[(sid, codes (Nq, F), counts (F,) | None), ...]`` in per-stream
        FIFO order."""
        out = []
        pending, self._pending = self._pending, []
        lv = self.level if self.level is not None else 1.0
        # Dispatch every batch first (jax dispatch is async), fetch after:
        # device compute for batch i+1 overlaps the host fetch of batch i
        # (each fetch pays a tunnel round-trip — see CLAUDE.md).
        jobs = []
        for i in range(0, len(pending), self.max_batch):
            take = pending[i: i + self.max_batch]
            bp = _padded_batch(len(take), self.proc.mesh)
            xs = np.zeros((bp, 1, self.window), np.float32)
            for j, (_, w) in enumerate(take):
                xs[j, 0] = w
            enc = self.proc._encode_nopad(
                self.proc.put_batch(xs), self.n_quantizers, lv
            )
            counts_dev = (
                self.proc._vbr_counts_device(enc, lv) if self.vbr else None
            )
            jobs.append((take, enc["codes"], counts_dev))
        for take, codes_dev, counts_dev in jobs:
            codes = np.asarray(codes_dev)
            counts = (
                np.asarray(counts_dev).astype(np.uint8)
                if counts_dev is not None else None
            )
            for j, (sid, _) in enumerate(take):
                out.append((
                    sid, codes[j],
                    counts[j] if counts is not None else None,
                ))
        return out


class DecoderPool:
    """Decode-side counterpart of :class:`StreamPool`: chunks from many
    streams decode in one batched dispatch (power-of-two padded). Audio
    matches per-stream :class:`StreamingDecoder` pushes of whole chunks
    to float rounding (~1e-7: XLA may vectorize convs differently per
    batch size, so exact bit-parity across batch shapes is not
    guaranteed for float outputs — unlike CODES, which are discrete and
    tested bit-exact in :class:`StreamPool`).

    Usage::

        dp = DecoderPool(proc, win_duration=1.0, max_batch=8)
        dp.push("caller-1", codes, counts)     # buffers only
        for sid, audio in dp.poll():           # one batched dispatch
            play(sid, audio)                   # hop-sized segment each
    """

    def __init__(
        self,
        proc: CodecProcessor,
        win_duration: float = 1.0,
        max_batch: int = 8,
    ):
        self.proc = proc
        self.max_batch = int(max_batch)
        _, self.hop, self.chunk_frames, _ = proc.window_geometry(win_duration)
        self._pending: List[Tuple[Any, np.ndarray, Optional[np.ndarray]]] = []

    def push(self, sid, codes: np.ndarray,
             counts: Optional[np.ndarray] = None) -> None:
        """Queue one whole encoder chunk (Nq, chunk_frames) for a stream."""
        codes = np.asarray(codes)
        if codes.shape[-1] != self.chunk_frames:
            raise ValueError(
                f"expected whole chunks of {self.chunk_frames} frames, "
                f"got {codes.shape[-1]}"
            )
        self._pending.append((sid, codes, counts))

    def poll(self) -> List[Tuple[Any, np.ndarray]]:
        """Decode every pending chunk, batched; returns ``[(sid, audio
        (hop,)), ...]`` in push order."""
        out = []
        pending, self._pending = self._pending, []
        # Dispatch-all-then-fetch, same rationale as StreamPool.poll.
        jobs = []
        for i in range(0, len(pending), self.max_batch):
            take = pending[i: i + self.max_batch]
            bp = _padded_batch(len(take), self.proc.mesh)
            nq = take[0][1].shape[0]
            cf = self.chunk_frames
            codes = np.zeros((bp, nq, cf), np.int32)
            mask = np.zeros((bp, nq, cf), np.float32)
            for j, (_, c, cnt) in enumerate(take):
                codes[j] = c
                if cnt is not None:
                    mask[j] = (np.arange(nq)[:, None]
                               < np.asarray(cnt)[None, :])
                else:
                    mask[j] = 1.0
            jobs.append((take, self.proc._decode_codes_nopad(
                self.proc.put_batch(codes), self.proc.put_batch(mask)
            )))
        for take, r_dev in jobs:
            r = np.asarray(r_dev)
            for j, (sid, _, _) in enumerate(take):
                out.append((sid, r[j, 0]))
        return out


class StreamingDecoder:
    """Incremental decoder: frame blocks in, hop-sized waveforms out."""

    def __init__(
        self,
        proc: CodecProcessor,
        *,
        win_duration: float = 1.0,
        chunk_frames: Optional[int] = None,
    ):
        """``win_duration`` must match the encoder's (the chunk size —
        frames per encoder window — is derived from it via
        ``CodecProcessor.window_geometry``); pass ``chunk_frames``
        explicitly only to override that derivation (it is also exposed
        as ``StreamingEncoder.chunk_frames``). Keyword-only so a
        mis-sized chunk cannot slip in positionally."""
        self.proc = proc
        if chunk_frames is None:
            _, _, chunk_frames, _ = proc.window_geometry(win_duration)
        self.chunk_frames = chunk_frames
        self._codes: Optional[np.ndarray] = None     # (Nq, F) pending
        self._counts: Optional[np.ndarray] = None    # (F,) pending (VBR)
        self._flushed = False

    def _decode_chunk(self, c: np.ndarray, counts: Optional[np.ndarray]) -> np.ndarray:
        n_q = c.shape[0]
        frames = c.shape[-1]
        if counts is not None:
            stage = np.arange(n_q).reshape(1, n_q, 1)
            mask = (stage < counts[None, None, :]).astype(np.float32)
        else:
            mask = np.ones((1, n_q, frames), np.float32)
        r = self.proc._decode_codes_nopad(
            jnp.asarray(c[None].astype(np.int32)), jnp.asarray(mask)
        )
        return np.asarray(r)[0, 0]

    def push(
        self,
        codes: np.ndarray,
        counts: Optional[np.ndarray] = None,
    ) -> List[np.ndarray]:
        """Feed a block of code frames (Nq, F). Each encoder chunk decodes
        independently (windows already overlap on the encoder side), so
        any whole multiple of the encoder chunk size decodes immediately;
        partial chunks wait in the buffer."""
        if self._flushed:
            raise RuntimeError("push() after flush()")
        codes = np.asarray(codes)
        if self._codes is None:
            self._codes = codes
            self._counts = counts
        else:
            self._codes = np.concatenate([self._codes, codes], axis=-1)
            if counts is not None:
                self._counts = (
                    counts if self._counts is None
                    else np.concatenate([self._counts, counts], axis=-1)
                )
        cf = self.chunk_frames
        out = []
        while self._codes.shape[-1] >= cf:
            c, self._codes = self._codes[..., :cf], self._codes[..., cf:]
            cnt = None
            if self._counts is not None:
                cnt, self._counts = self._counts[..., :cf], self._counts[..., cf:]
            out.append(self._decode_chunk(c, cnt))
        return out

    def flush(self) -> List[np.ndarray]:
        """Decode any trailing partial chunk, zero-padded to a whole chunk
        exactly like ``decompress`` — the full hop-length segment is
        returned (``decompress`` likewise decodes the padded chunk whole
        and trims the final signal to ``original_length``; trim the
        concatenated stream to the real stream length on the caller
        side). Our own encoder always emits whole chunks, so this only
        fires for externally-truncated code streams."""
        if self._flushed:
            return []
        self._flushed = True
        if self._codes is None or self._codes.shape[-1] == 0:
            return []
        cf = self.chunk_frames
        frames = self._codes.shape[-1]
        c = np.pad(self._codes, ((0, 0), (0, cf - frames))) if frames < cf else self._codes
        cnt = None
        if self._counts is not None:
            cnt = self._counts
            if cnt.shape[-1] < cf:
                cnt = np.pad(cnt, (0, cf - cnt.shape[-1]))
        self._codes = None
        self._counts = None
        return [self._decode_chunk(c, cnt)]


class PacketCodec:
    """Entropy-coded wire format for live code streaming.

    Turns each ``(codes (Nq, F), vbr_counts (F,) | None)`` chunk from a
    :class:`StreamingEncoder` into one self-delimiting bytes packet and
    back, with ADAPTIVE per-stage range-coder models that persist across
    packets (ops/rangecoder.AdaptiveCoder) — so later chunks ride the
    statistics adapted on earlier ones, approaching the offline
    ``DACFile.save(entropy=True)`` rate without buffering the stream.

    Sender and receiver each hold their own instance; they stay in sync
    iff packets are unpacked, whole and in the order they were packed
    (use an ordered, framed transport — ``unpack`` rejects truncated or
    over-long packets, since decoding garbage would silently poison the
    adaptive models for the rest of the stream). Packet layout
    (little-endian): u16 frame count F, u8 vbr flag, u8 stage count
    (< n_codebooks for CBR chunks with fewer quantizers), u16
    counts-payload length + payload (VBR only), u32 codes-payload
    length + payload.
    """

    def __init__(self, n_codebooks: int, codebook_size: int):
        from ..ops.rangecoder import AdaptiveCoder

        self.n_codebooks = n_codebooks
        self._codes_coder = AdaptiveCoder(codebook_size, n_codebooks)
        self._counts_coder = AdaptiveCoder(n_codebooks + 1)

    def _contexts(self, counts: Optional[np.ndarray], frames: int, nq: int):
        if counts is None:
            # CBR: the chunk's nq stages, (t, stage) order
            return np.tile(np.arange(nq), frames)
        stage = np.broadcast_to(np.arange(nq), (frames, nq))
        return stage[stage < np.asarray(counts)[:, None]]

    def pack(self, codes: np.ndarray,
             counts: Optional[np.ndarray] = None) -> bytes:
        codes = np.asarray(codes)
        nq, frames = codes.shape
        if nq > self.n_codebooks:
            raise ValueError(
                f"chunk has {nq} codebooks, codec built for "
                f"{self.n_codebooks}"
            )
        header = struct.pack("<HBB", frames,
                             1 if counts is not None else 0, nq)
        body = b""
        if counts is not None:
            counts = np.asarray(counts)
            cp = self._counts_coder.encode(counts)
            body += struct.pack("<H", len(cp)) + cp
            kept = codes.T[np.arange(nq)[None, :] < counts[:, None]]
        else:
            kept = codes.T.reshape(-1)  # (t, stage) order
        ctx = self._contexts(counts, frames, nq)
        payload = self._codes_coder.encode(kept, ctx)
        return header + body + struct.pack("<I", len(payload)) + payload

    def unpack(self, packet: bytes) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        frames, vbr, nq = struct.unpack_from("<HBB", packet, 0)
        off = 4
        counts = None
        if vbr:
            (clen,) = struct.unpack_from("<H", packet, off)
            off += 2
            if off + clen > len(packet):
                raise ValueError("truncated packet (counts payload)")
            counts = self._counts_coder.decode(
                packet[off: off + clen], frames
            ).astype(np.uint8)
            off += clen
        (plen,) = struct.unpack_from("<I", packet, off)
        off += 4
        if off + plen != len(packet):
            raise ValueError(
                f"corrupt packet: {len(packet) - off} payload bytes, "
                f"header says {plen}"
            )
        ctx = self._contexts(counts, frames, nq)
        kept = self._codes_coder.decode(packet[off: off + plen], ctx.size, ctx)
        codes = np.zeros((frames, nq), np.int32)
        if counts is not None:
            mask = np.arange(nq)[None, :] < counts[:, None]
            codes[mask] = kept.astype(np.int32)
        else:
            codes = kept.astype(np.int32).reshape(frames, nq)
        return codes.T, counts
