"""Profiling / tracing utilities.

The reference's only profiling is the audiotools ``@timer()`` console
display plus cuDNN autotune (SURVEY §5, scripts/train.py:231,261,38). TPU
equivalent: jax.profiler traces viewable in TensorBoard/Perfetto plus the
host-side section timers in ``vrvq_tpu.train.tracker``.
"""

from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path
from typing import Iterator, Optional

import jax


def enable_compilation_cache(path: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at a shared directory.

    Full-size train-step programs take minutes to compile (and through a
    remote-TPU compile service they can fail outright under memory
    pressure); the persistent cache makes every CLI/bench/test process
    reuse each other's compiles. Default: ``.jax_cache`` at the repo root,
    overridable via ``VRVQ_COMPILATION_CACHE``.
    """
    path = (path or os.environ.get("VRVQ_COMPILATION_CACHE")
            or str(Path(__file__).resolve().parents[1] / ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/vrvq_trace") -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block.

    View with ``tensorboard --logdir <logdir>`` (Profile tab) or upload the
    .pb to ui.perfetto.dev.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a profiler trace (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Per-phase wall-clock accounting for a loop: ``mark(name)`` charges
    the time since the previous mark to ``name``; ``report()`` returns the
    mean ms per phase since the last report and resets. Used by the
    trainer to split a step into data-wait / h2d / dispatch / log
    (the reference's @timer decorator equivalent, scripts/train.py:231)."""

    def __init__(self):
        self._sums: dict = {}
        self._counts: dict = {}
        self._t = time.perf_counter()

    def mark(self, name: str) -> None:
        now = time.perf_counter()
        self._sums[name] = self._sums.get(name, 0.0) + (now - self._t)
        self._counts[name] = self._counts.get(name, 0) + 1
        self._t = now

    def report(self) -> str:
        parts = [
            f"{k}={1000.0 * self._sums[k] / max(self._counts[k], 1):.0f}ms"
            for k in self._sums
        ]
        self._sums.clear()
        self._counts.clear()
        self._t = time.perf_counter()
        return " ".join(parts)


class StepTimer:
    """Rolling wall-clock timer for the hot loop; forces device sync via a
    caller-provided fetch (block_until_ready does not synchronize through
    remote-tunnel platforms)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def steps_per_sec(self) -> float:
        return 1.0 / self.mean if self.times else 0.0
