"""Data-augmentation transforms (audiotools.data.transforms equivalents).

Reference usage: scripts/train.py:53-58 + conf/base.yml:50-58 — the train
pipeline composes preprocess/augment/postprocess chains of
Identity/VolumeNorm/RescaleAudio/ShiftPhase.

Protocol (mirrors audiotools): ``instantiate(state, signal)`` draws the
per-item random parameters host-side (numpy RandomState, reproducible by
dataset idx) and returns a dict; ``transform(batch, **args)`` applies them
on-device with pure jnp ops, jit-safe inside the train step. ``prob``
masking selects per-sample application exactly like the reference.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..audio import Signal
from ..ops import stft as stft_ops


class BaseTransform:
    def __init__(self, name: Optional[str] = None, prob: float = 1.0):
        self.name = name or type(self).__name__
        self.prob = prob

    # ---- host side
    def _instantiate(self, state, signal=None) -> Dict:
        return {}

    def instantiate(self, state, signal=None) -> Dict:
        state = _rs(state)
        args = self._instantiate(state, signal)
        args["mask"] = np.float32(state.rand() <= self.prob)
        return {self.name: args}

    # ---- device side
    def _transform(self, audio, sample_rate, **kwargs):
        return audio

    def __call__(self, signal, **all_args):
        """signal: Signal or (B, C, T) array; all_args: the batched dict from
        ``instantiate`` collation."""
        args = all_args.get(self.name, {})
        mask = jnp.asarray(args.get("mask", 1.0)).reshape(-1, 1, 1)
        audio = jnp.asarray(
            signal.audio_data if isinstance(signal, Signal) else signal
        )
        sr = signal.sample_rate if isinstance(signal, Signal) else 44100
        kwargs = {k: v for k, v in args.items() if k != "mask"}
        out = self._transform(audio, sr, **kwargs)
        out = mask * out + (1.0 - mask) * audio
        if isinstance(signal, Signal):
            return Signal(out, sr, signal.stft_params, signal.metadata)
        return out


class Identity(BaseTransform):
    pass


class RescaleAudio(BaseTransform):
    """Rescale to |x| <= val only if it clips (audiotools RescaleAudio)."""

    def __init__(self, val: float = 1.0, name=None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.val = val

    def _transform(self, audio, sample_rate):
        peak = jnp.max(jnp.abs(audio), axis=(1, 2), keepdims=True)
        gain = jnp.minimum(self.val / jnp.maximum(peak, 1e-9), 1.0)
        return audio * gain


class ShiftPhase(BaseTransform):
    """Shift the phase of every STFT bin by a random constant
    (audiotools ShiftPhase: shift ~ U(-pi, pi))."""

    def __init__(self, shift_range=(-np.pi, np.pi), name=None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.shift_range = shift_range

    def _instantiate(self, state, signal=None):
        lo, hi = self.shift_range
        return {"shift": np.float32(state.uniform(lo, hi))}

    def _transform(self, audio, sample_rate, shift=0.0):
        length = audio.shape[-1]
        w, hop = 2048, 512
        spec = stft_ops.stft(audio, w, hop)
        shift = jnp.asarray(shift).reshape(-1, 1, 1, 1)
        spec = spec * jnp.exp(1j * shift.astype(jnp.complex64))
        return stft_ops.istft(spec, w, hop, length).astype(audio.dtype)


class VolumeNorm(BaseTransform):
    """Normalize loudness to a target dB (audiotools VolumeNorm; the
    config form ``db: [const, -16]`` draws a constant).

    Loudness is measured host-side at instantiate time (BS.1770) and the
    in-graph op is a pure gain multiply.
    """

    def __init__(self, db=("const", -24), name=None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.db = tuple(db)

    def _draw(self, state):
        kind = self.db[0]
        if kind == "const":
            return float(self.db[1])
        if kind == "uniform":
            return float(state.uniform(self.db[1], self.db[2]))
        raise ValueError(f"Unknown db spec {self.db}")

    def _instantiate(self, state, signal=None):
        target = self._draw(state)
        loudness = float(signal.loudness()[0]) if signal is not None else -24.0
        gain_db = target - loudness
        return {"gain": np.float32(np.exp(gain_db * np.log(10) / 20))}

    def _transform(self, audio, sample_rate, gain=1.0):
        return audio * jnp.asarray(gain).reshape(-1, 1, 1)


class Compose(BaseTransform):
    """Chain transforms; supports nested prob masking (audiotools Compose)."""

    def __init__(self, *transforms: BaseTransform, name=None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.transforms = list(transforms)
        # disambiguate duplicate names like audiotools does
        seen: Dict[str, int] = {}
        for t in self.transforms:
            if t.name in seen:
                seen[t.name] += 1
                t.name = f"{t.name}.{seen[t.name]}"
            else:
                seen[t.name] = 0

    def _instantiate(self, state, signal=None):
        args = {}
        for t in self.transforms:
            args.update(t.instantiate(state, signal))
        return args

    def instantiate(self, state, signal=None):
        state = _rs(state)
        args = self._instantiate(state, signal)
        args["mask"] = np.float32(state.rand() <= self.prob)
        return {self.name: args}

    def __call__(self, signal, **all_args):
        args = all_args.get(self.name, {})
        mask = jnp.asarray(args.get("mask", 1.0)).reshape(-1, 1, 1)
        original = jnp.asarray(
            signal.audio_data if isinstance(signal, Signal) else signal
        )
        out = signal
        for t in self.transforms:
            out = t(out, **args)
        out_audio = jnp.asarray(
            out.audio_data if isinstance(out, Signal) else out
        )
        blended = mask * out_audio + (1.0 - mask) * original
        if isinstance(signal, Signal):
            return Signal(blended, signal.sample_rate, signal.stft_params,
                          signal.metadata)
        return blended


_warned_no_cpu = False


def apply_on_host(transform: "BaseTransform", signal, all_args: Dict):
    """Apply a transform chain on the host CPU backend; return numpy audio.

    TPU-idiomatic input pipelines keep augmentation on the host: the
    accelerator should only ever see the fully-prepared batch (one
    transfer, one compiled program — the train step). Dispatching the
    chain eagerly on the accelerator instead costs a dispatch round-trip
    per op and a fresh XLA compile per new batch shape, for work (STFT
    phase rotation, gain multiplies) that is trivial on CPU relative to a
    GAN train step. Matches the reference's semantics (transforms run
    under no_grad outside the optimized graph, scripts/train.py:272-277)
    while moving the compute off the device.

    Falls back to the default device if no CPU backend is registered.
    """
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
        global _warned_no_cpu
        if not _warned_no_cpu:
            _warned_no_cpu = True
            import warnings

            warnings.warn(
                "apply_on_host: no CPU backend registered (JAX_PLATFORMS "
                "excludes 'cpu'); transforms fall back to eager dispatch "
                "on the default device — expect per-op dispatch overhead."
            )
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        out = transform(signal, **all_args)
        audio = out.audio_data if isinstance(out, Signal) else out
        audio = np.asarray(audio)
    if isinstance(signal, Signal):
        return Signal(audio, signal.sample_rate, signal.stft_params,
                      signal.metadata)
    return audio


TRANSFORM_REGISTRY = {
    "Identity": Identity,
    "RescaleAudio": RescaleAudio,
    "ShiftPhase": ShiftPhase,
    "VolumeNorm": VolumeNorm,
}


def build_transform(
    augment_prob: float = 1.0,
    preprocess: Optional[List[str]] = None,
    augment: Optional[List[str]] = None,
    postprocess: Optional[List[str]] = None,
    cfg=None,
) -> Compose:
    """Build the preprocess/augment/postprocess chain
    (reference: scripts/train.py:85-97). ``cfg`` supplies per-transform
    kwargs like ``VolumeNorm.db``."""

    def make(name: str) -> BaseTransform:
        cls = TRANSFORM_REGISTRY[name]
        kwargs = cfg.kwargs(name) if cfg is not None else {}
        return cls(**kwargs)

    to_tfm = lambda names: [make(x) for x in (names or ["Identity"])]
    pre = Compose(*to_tfm(preprocess), name="preprocess")
    aug = Compose(*to_tfm(augment), name="augment", prob=augment_prob)
    post = Compose(*to_tfm(postprocess), name="postprocess")
    return Compose(pre, aug, post)


def _rs(state):
    if isinstance(state, np.random.RandomState):
        return state
    return np.random.RandomState(state)
