"""Push-style streaming codec: unbounded audio in, codes out, with
constant memory — the serving-side counterpart of the file-oriented
:class:`~vrvq_tpu.infer.codec_api.CodecProcessor`.

The reference's windowed-chunking spec (models/dac_base.py:196-284, dead
code upstream; implemented for real in ``codec_api``) processes a whole
file at once. A live service instead receives audio incrementally. These
classes keep exactly the window arithmetic of ``CodecProcessor.compress``
(padding-free codec, ``delay``-padded stream ends, stride = padding-free
output length) but maintain it as *state*, so:

  * ``StreamingEncoder.push(samples)`` accepts arbitrary-size sample
    blocks and yields ``(codes, vbr_counts)`` chunks as soon as each
    window fills — the concatenation over a whole stream is bit-identical
    to ``CodecProcessor.compress(...).codes`` for the same audio;
  * ``StreamingDecoder.push(codes)`` accepts arbitrary-size frame blocks
    and yields waveform segments, concatenating to exactly the
    ``decompress`` output (pre-normalization);
  * memory is O(window), not O(stream).

Loudness normalization is intentionally NOT part of the streaming path:
BS.1770 loudness needs the whole signal (the reference normalizes per
file, models/dac_base.py:164-171); a live stream should be gain-staged
upstream. Algorithmic latency: the first codes chunk appears after
``window - delay`` real samples; each chunk covers ``hop`` samples.

Example::

    enc = StreamingEncoder(proc, win_duration=1.0, level=1.0)
    dec = StreamingDecoder(proc)
    for block in microphone():              # any block size
        for codes, counts in enc.push(block):
            for audio in dec.push(codes, counts):
                play(audio)                 # hop-sized segments
    for codes, counts in enc.flush():
        ...
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.masks import generate_mask_hard
from .codec_api import CodecProcessor


class StreamingEncoder:
    """Incremental windowed encoder over a :class:`CodecProcessor`.

    Parameters mirror ``CodecProcessor.compress`` (win_duration,
    n_quantizers, level); audio is a single mono stream at the model
    sample rate.
    """

    def __init__(
        self,
        proc: CodecProcessor,
        win_duration: float = 1.0,
        n_quantizers: Optional[int] = None,
        level: Optional[float] = None,
    ):
        self.proc = proc
        model = proc.model
        self.n_quantizers = n_quantizers
        self.level = level
        self.vbr = n_quantizers is None and level is not None

        self.delay = model.delay
        n_samples = int(win_duration * model.sample_rate)
        self.window = int(
            math.ceil(n_samples / model.hop_length) * model.hop_length
        )
        self.hop = proc.model_nopad.get_output_length(self.window)
        if self.hop <= 0:
            min_win = (2 * self.delay + model.hop_length) / model.sample_rate
            raise ValueError(
                f"win_duration={win_duration}s is smaller than the model's "
                f"receptive field; use win_duration > {min_win:.2f}s."
            )
        self.chunk_frames: Optional[int] = None  # set after first window

        # stream state: buffer holds padded-stream samples from absolute
        # index `start`; window w covers padded[w*hop : w*hop + window]
        self._buf = np.zeros((self.delay,), np.float32)  # left delay pad
        self._start = 0
        self._windows_out = 0
        self._real_len = 0
        self._flushed = False

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
        counts = None
        if self.vbr:
            n_q = self.proc.model.n_codebooks
            mask = generate_mask_hard(
                enc["imp_map"] * self.level * n_q, n_q
            )
            counts = np.asarray(jnp.sum(mask, axis=1))[0].astype(np.uint8)
        if self.chunk_frames is None:
            self.chunk_frames = codes.shape[-1]
        return codes, counts

    def _drain_ready(self) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
        while True:
            begin = self._windows_out * self.hop
            end = begin + self.window
            if end > self._start + len(self._buf):
                return
            x = self._buf[begin - self._start: end - self._start]
            self._windows_out += 1
            # drop consumed prefix: nothing before the next window's begin
            # is needed again
            keep_from = self._windows_out * self.hop
            if keep_from > self._start:
                self._buf = self._buf[keep_from - self._start:]
                self._start = keep_from
            yield self._encode_window(x)

    def push(self, samples: np.ndarray) -> List[Tuple[np.ndarray, Optional[np.ndarray]]]:
        """Feed a block of samples (any length, shape (T,)); returns the
        list of ``(codes (Nq, F), vbr_counts (F,) | None)`` chunks whose
        windows completed."""
        if self._flushed:
            raise RuntimeError("push() after flush()")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._buf = np.concatenate([self._buf, samples])
        self._real_len += len(samples)
        return list(self._drain_ready())

    def flush(self) -> List[Tuple[np.ndarray, Optional[np.ndarray]]]:
        """End of stream: emit the remaining windows (right delay pad +
        zero tail), exactly like ``compress``'s final chunks."""
        if self._flushed:
            return []
        self._flushed = True
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
            out.append(self._encode_window(x))
        return out


class StreamingDecoder:
    """Incremental decoder: frame blocks in, hop-sized waveforms out."""

    def __init__(self, proc: CodecProcessor, chunk_frames: Optional[int] = None):
        """``chunk_frames`` is the encoder's frames-per-window (exposed as
        ``StreamingEncoder.chunk_frames`` after its first chunk); when
        omitted, the first ``push`` block is taken to be one chunk."""
        self.proc = proc
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
        if self.chunk_frames is None:
            # default: treat the first push as one encoder chunk
            self.chunk_frames = codes.shape[-1]
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
        """Decode any trailing partial chunk (zero-padded like
        ``decompress``; the decoded tail is trimmed to the frames' span)."""
        if self._flushed:
            return []
        self._flushed = True
        if self._codes is None or self._codes.shape[-1] == 0:
            return []
        cf = self.chunk_frames or self._codes.shape[-1]
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
