"""Signal: a lightweight AudioSignal replacement.

The reference depends on ``descript-audiotools``'s AudioSignal for every
DSP touchpoint (SURVEY §1: .audio_data/.stft()/.magnitude/
.mel_spectrogram()/.loudness()/.resample()/.to_mono()/.salient_excerpt()/
.zero_pad()/.write()). This module re-provides that surface with numpy/JAX:
spectral ops run through vrvq_tpu.ops.stft (pure XLA, jit-safe), file IO
and excerpting are host-side numpy.
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Optional, Union

import numpy as np

from .ops import stft as stft_ops

try:  # jax is always present in this environment, but keep host-only use safe
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None

GAIN_FACTOR = np.log(10) / 20
"""Multiply gain in dB by this to get the natural-log gain factor."""


@dataclasses.dataclass
class STFTParams:
    """Mirror of audiotools STFTParams defaults."""

    window_length: int = 2048
    hop_length: int = 512
    window_type: Optional[str] = None
    match_stride: bool = False
    padding_type: str = "reflect"


class Signal:
    """Batched audio container: ``audio_data`` is (B, C, T)."""

    def __init__(
        self,
        audio_data,
        sample_rate: int,
        stft_params: Optional[STFTParams] = None,
        metadata: Optional[dict] = None,
    ):
        audio_data = _ensure_bct(audio_data)
        self.audio_data = audio_data
        self.sample_rate = int(sample_rate)
        if stft_params is None:
            # audiotools default: 32 ms window rounded up to a power of 2,
            # hop = window / 4 (2048/512 at 44.1 kHz)
            window = 2 ** int(math.ceil(math.log2(0.032 * sample_rate)))
            stft_params = STFTParams(window_length=window,
                                     hop_length=window // 4)
        self.stft_params = stft_params
        self.metadata = dict(metadata or {})
        self.stft_data = None
        self.path_to_file = None

    # ----------------------------------------------------------- properties
    @property
    def batch_size(self) -> int:
        return self.audio_data.shape[0]

    @property
    def num_channels(self) -> int:
        return self.audio_data.shape[1]

    @property
    def signal_length(self) -> int:
        return self.audio_data.shape[-1]

    shape = property(lambda self: self.audio_data.shape)

    @property
    def signal_duration(self) -> float:
        return self.signal_length / self.sample_rate

    duration = signal_duration

    def __len__(self):
        return self.signal_length

    def __getitem__(self, key):
        return Signal(self.audio_data[key], self.sample_rate,
                      self.stft_params, self.metadata)

    def clone(self) -> "Signal":
        data = self.audio_data
        data = np.array(data) if isinstance(data, np.ndarray) else data
        return Signal(data, self.sample_rate, self.stft_params, dict(self.metadata))

    def numpy(self) -> np.ndarray:
        return np.asarray(self.audio_data)

    # ------------------------------------------------------------- factory
    @classmethod
    def zeros(cls, duration: float, sample_rate: int, num_channels: int = 1,
              batch_size: int = 1) -> "Signal":
        n = int(duration * sample_rate)
        return cls(np.zeros((batch_size, num_channels, n), np.float32), sample_rate)

    @classmethod
    def load(cls, path, offset: float = 0.0, duration: Optional[float] = None) -> "Signal":
        from .data.audio_io import read_audio

        data, sr = read_audio(path, offset=offset, duration=duration)
        sig = cls(data[None], sr)
        sig.path_to_file = str(path)
        sig.metadata["offset"] = offset
        sig.metadata["duration"] = duration
        return sig

    @classmethod
    def excerpt(cls, path, offset: Optional[float] = None,
                duration: Optional[float] = None, state=None) -> "Signal":
        """Random excerpt of a file (audiotools AudioSignal.excerpt)."""
        from .data.audio_io import audio_info

        info = audio_info(path)
        total = info.duration
        if duration is None:
            duration = total
        state = _random_state(state)
        lower = 0.0
        upper = max(total - duration, 0.0)
        offset = offset if offset is not None else state.uniform(lower, upper)
        sig = cls.load(path, offset=offset, duration=duration)
        sig.metadata["offset"] = offset
        sig.metadata["duration"] = duration
        return sig

    @classmethod
    def salient_excerpt(
        cls,
        path,
        loudness_cutoff: Optional[float] = None,
        num_tries: int = 8,
        state=None,
        **kwargs,
    ) -> "Signal":
        """Draw excerpts until one is louder than ``loudness_cutoff`` dB
        (audiotools semantics: keep the last try after num_tries)."""
        state = _random_state(state)
        if loudness_cutoff is None:
            return cls.excerpt(path, state=state, **kwargs)
        loudness = -np.inf
        num_try = 0
        excerpt = None
        while loudness <= loudness_cutoff:
            excerpt = cls.excerpt(path, state=state, **kwargs)
            loudness = excerpt.loudness()
            num_try += 1
            if num_tries is not None and num_try >= num_tries:
                break
        return excerpt

    # ------------------------------------------------------------ transforms
    def to_mono(self) -> "Signal":
        self.audio_data = self.audio_data.mean(axis=1, keepdims=True)
        return self

    def resample(self, sample_rate: int) -> "Signal":
        if sample_rate == self.sample_rate:
            return self
        from .ops.resample import resample_poly_np

        self.audio_data = resample_poly_np(
            np.asarray(self.audio_data), self.sample_rate, sample_rate
        )
        self.sample_rate = sample_rate
        return self

    def zero_pad(self, before: int, after: int) -> "Signal":
        self.audio_data = np.pad(
            np.asarray(self.audio_data), ((0, 0), (0, 0), (before, after))
        )
        return self

    def zero_pad_to(self, length: int, mode: str = "after") -> "Signal":
        pad = max(length - self.signal_length, 0)
        if mode == "before":
            return self.zero_pad(pad, 0)
        return self.zero_pad(0, pad)

    def truncate_samples(self, length: int) -> "Signal":
        self.audio_data = self.audio_data[..., :length]
        return self

    def normalize(self, db: float = -24.0) -> "Signal":
        """Normalize loudness to ``db`` LUFS (audiotools normalize)."""
        ref = self.loudness()
        gain_db = db - ref
        gain = np.exp(gain_db * GAIN_FACTOR)
        self.audio_data = self.audio_data * np.reshape(gain, (-1, 1, 1))
        self._loudness = np.asarray(db, dtype=np.float32) * np.ones_like(ref)
        return self

    def ensure_max_of_audio(self, maximum: float = 1.0) -> "Signal":
        peak = np.abs(np.asarray(self.audio_data)).max(axis=(1, 2), keepdims=True)
        gain = np.minimum(maximum / np.maximum(peak, 1e-9), 1.0)
        self.audio_data = self.audio_data * gain
        return self

    # ------------------------------------------------------------- spectral
    def stft(self, window_length: Optional[int] = None,
             hop_length: Optional[int] = None,
             window_type: Optional[str] = None,
             match_stride: Optional[bool] = None):
        p = self.stft_params
        window_length = window_length or p.window_length
        hop_length = hop_length or p.hop_length
        window_type = window_type if window_type is not None else p.window_type
        match_stride = match_stride if match_stride is not None else p.match_stride
        data = jnp.asarray(self.audio_data)
        self.stft_data = stft_ops.stft(
            data, window_length, hop_length, window_type, match_stride
        )
        return self.stft_data

    @property
    def magnitude(self):
        if self.stft_data is None:
            self.stft()
        return jnp.abs(self.stft_data)

    def log_magnitude(self, ref_value: float = 1.0, amin: float = 1e-5):
        mag = self.magnitude
        return 20.0 * jnp.log10(jnp.maximum(mag, amin) / ref_value)

    def mel_spectrogram(self, n_mels: int = 80, mel_fmin: float = 0.0,
                        mel_fmax: Optional[float] = None, **kwargs):
        p = self.stft_params
        window_length = kwargs.get("window_length", p.window_length)
        hop_length = kwargs.get("hop_length", p.hop_length)
        window_type = kwargs.get("window_type", p.window_type)
        match_stride = kwargs.get("match_stride", p.match_stride)
        data = jnp.asarray(self.audio_data)
        return stft_ops.mel_spectrogram(
            data, self.sample_rate, n_mels, window_length, hop_length,
            window_type, match_stride, mel_fmin, mel_fmax,
        )

    # -------------------------------------------------------------- loudness
    def loudness(self, filter_class: str = "K-weighting",
                 block_size: float = 0.4):
        """ITU-R BS.1770 integrated loudness per batch item (LUFS).

        audiotools floors the result at -70 LUFS; we match that.
        """
        data = np.asarray(self.audio_data, dtype=np.float32)
        # fast path: native C++ meter (GIL-free, ~30x scipy) when built
        try:
            from .native.io import wavio

            if wavio.available():
                vals = [
                    wavio.loudness(data[b], self.sample_rate, block_size)
                    for b in range(data.shape[0])
                ]
                if all(v is not None for v in vals):
                    out = np.asarray(vals, dtype=np.float64)
                    self._loudness = np.maximum(out, -70.0).astype(np.float32)
                    return self._loudness
        except Exception:
            pass
        from .ops.loudness import integrated_loudness

        out = integrated_loudness(
            data.astype(np.float64), self.sample_rate, block_size=block_size
        )
        self._loudness = np.maximum(out, -70.0).astype(np.float32)
        return self._loudness

    # ------------------------------------------------------------------- io
    def write(self, path) -> "Signal":
        from .data.audio_io import write_wav

        write_wav(path, np.asarray(self.audio_data[0]), self.sample_rate)
        return self


def _ensure_bct(audio_data) -> "np.ndarray":
    if hasattr(audio_data, "ndim"):
        if audio_data.ndim == 1:
            audio_data = audio_data[None, None, :]
        elif audio_data.ndim == 2:
            audio_data = audio_data[None, :, :]
        elif audio_data.ndim != 3:
            raise ValueError(f"audio_data must be 1/2/3-D, got {audio_data.ndim}")
    return audio_data


def _random_state(state):
    if state is None or isinstance(state, int):
        return np.random.RandomState(state)
    return state
