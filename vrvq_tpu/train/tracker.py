"""Metrics tracking: console + log file + TensorBoard, with best-tracking.

Re-provides the audiotools ``Tracker``/``timer``/``when`` surface the
reference trains through (scripts/train.py:19-21,444-480): per-phase
running means, TensorBoard scalar logging, ``is_best`` on a watched metric,
rank-0 gating, and a state dict for checkpoint/resume.
"""

from __future__ import annotations

import time
from collections import defaultdict
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np


class Tracker:
    def __init__(
        self,
        writer=None,
        log_file: Optional[str] = None,
        rank: int = 0,
        log_every: int = 50,
    ):
        self.writer = writer
        self.rank = rank
        self.step = 0
        self.log_every = log_every
        self.history: Dict[str, list] = defaultdict(list)
        self._phase_sums: Dict[str, Dict[str, float]] = defaultdict(
            lambda: defaultdict(float)
        )
        self._phase_counts: Dict[str, int] = defaultdict(int)
        self._best: Dict[str, float] = {}
        self._pending: list = []  # (phase, step, {name: device scalar})
        self._log_fh = open(log_file, "a") if (log_file and rank == 0) else None
        # A crash/SIGKILL between log_every boundaries would drop up to
        # log_every-1 buffered steps from TensorBoard/log.txt; flush what
        # we can at interpreter exit (SIGKILL is still lossy, by design —
        # the buffering IS the perf fix).
        import atexit
        atexit.register(self._flush_quietly)

    # ------------------------------------------------------------- logging
    def print(self, msg: str) -> None:
        if self.rank != 0:
            return
        print(msg, flush=True)
        if self._log_fh:
            self._log_fh.write(f"{msg}\n")
            self._log_fh.flush()

    def log_metrics(self, phase: str, metrics: Dict[str, Any],
                    step: Optional[int] = None) -> None:
        """Record a step's metrics WITHOUT synchronizing with the device.

        Fetching (device_get) here every step was the train loop's hidden
        barrier: the host waited out the remainder of each device step
        before enqueueing the next one, so dispatch and compute never
        overlapped (measured ~200 ms of the ~355 ms wall per step on the
        remote-tunnel TPU). Metrics are buffered as device scalars and
        fetched in ONE bulk transfer at each log_every boundary (or at
        done()/state_dict(), whichever comes first) — between boundaries
        the host runs ahead and the device queue stays full."""
        step = self.step if step is None else step
        kept = {k: v for k, v in metrics.items()
                if v is not None and np.ndim(v) == 0}
        # Pack the step's scalars into ONE device vector now (a single tiny
        # async dispatch): round-5 on-chip measurement showed the dict-of-
        # scalars flush still paid ~one tunnel RPC PER SCALAR (~600 fetches
        # per 50-step window ~ 8.8 s, log=175 ms/step mean) — batching must
        # happen device-side, not in the device_get call.
        import jax.numpy as jnp

        keys = tuple(sorted(kept))
        vec = jnp.stack([jnp.asarray(kept[k], jnp.float32)
                         for k in keys]) if keys else None
        self._pending.append((phase, step, keys, vec))
        if phase == "train" and step % self.log_every == 0:
            scalars = self._flush()
            parts = " ".join(f"{k}={v:.4f}" for k, v in sorted(scalars.items()))
            self.print(f"[{phase}] step {step}: {parts}")

    def _flush_quietly(self) -> None:
        """atexit hook: best-effort flush of buffered metrics. The device
        (or the remote tunnel) may already be unusable at exit — never let
        that turn a clean shutdown into a traceback."""
        try:
            self._flush()
        except Exception:
            pass

    def _flush(self) -> Dict[str, float]:
        """Fetch the buffered window in ONE device->host transfer and fold
        it into the phase sums / TensorBoard. Returns the LAST step's
        scalars (for the boundary print).

        The per-step vectors are stacked device-side into a single (n, K)
        array per key-layout group (train/val layouts differ), so a
        50-step window costs one stack dispatch + one fetch instead of
        ~600 per-scalar tunnel round-trips."""
        if not self._pending:
            return {}
        import jax.numpy as jnp

        # group contiguously-compatible entries by their key tuple
        groups: Dict[tuple, list] = defaultdict(list)
        for i, (_, _, keys, vec) in enumerate(self._pending):
            if vec is not None:
                groups[keys].append((i, vec))
        fetched: Dict[int, np.ndarray] = {}
        for keys, entries in groups.items():
            mat = np.asarray(jnp.stack([v for _, v in entries]))
            for (i, _), row in zip(entries, mat):
                fetched[i] = row
        scalars: Dict[str, float] = {}
        for i, (phase, step, keys, _) in enumerate(self._pending):
            row = fetched.get(i)
            if row is None:
                continue
            scalars = {k: float(v) for k, v in zip(keys, row)}
            for k, v in scalars.items():
                self._phase_sums[phase][k] += v
            self._phase_counts[phase] += 1
            if self.writer is not None and self.rank == 0:
                for k, v in scalars.items():
                    self.writer.add_scalar(f"{k}/{phase}", v, step)
        self._pending.clear()
        return scalars

    def done(self, phase: str, message: str = "") -> Dict[str, float]:
        """Summarize a phase: mean over the accumulated iterations
        (the reference logs val means, scripts/train.py:476)."""
        self._flush()
        count = max(self._phase_counts[phase], 1)
        means = {k: v / count for k, v in self._phase_sums[phase].items()}
        self.history[phase].append({"step": self.step, **means})
        if message:
            parts = " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
            self.print(f"{message} [{phase} mean] {parts}")
        self._phase_sums[phase].clear()
        self._phase_counts[phase] = 0
        return means

    # ---------------------------------------------------------------- best
    def is_best(self, phase: str, key: str) -> bool:
        """True iff the latest phase mean of ``key`` is the best so far
        (reference: scripts/train.py:343-344)."""
        if not self.history[phase]:
            return False
        latest = self.history[phase][-1].get(key)
        if latest is None:
            return False
        tag = f"{phase}/{key}"
        if tag not in self._best or latest < self._best[tag]:
            self._best[tag] = latest
            return True
        return False

    # -------------------------------------------------------------- resume
    def state_dict(self) -> Dict[str, Any]:
        self._flush()  # checkpoint metadata must include buffered steps
        return {
            "step": self.step,
            "history": {k: v for k, v in self.history.items()},
            "best": dict(self._best),
        }

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self.step = sd.get("step", 0)
        self.history = defaultdict(list, sd.get("history", {}))
        self._best = dict(sd.get("best", {}))


def when(condition: Callable[[], bool]):
    """Decorator: run the function only when condition() is true
    (audiotools ml.decorators.when; reference scripts/train.py:479-480)."""

    def deco(fn):
        def wrapped(*args, **kwargs):
            if condition():
                return fn(*args, **kwargs)
            return None

        return wrapped

    return deco


class timer:
    """Decorator + context manager measuring wall time per call
    (audiotools ml.decorators.timer; reference scripts/train.py:231,261)."""

    def __init__(self, name: Optional[str] = None):
        self.name = name
        self.times: Dict[str, list] = defaultdict(list)

    def __call__(self, fn):
        name = self.name or fn.__name__

        def wrapped(*args, **kwargs):
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            self.times[name].append(time.perf_counter() - t0)
            return out

        wrapped.__name__ = fn.__name__
        return wrapped
