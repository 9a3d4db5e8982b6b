"""Tracker semantics: deferred (pipelined) metric fetch.

log_metrics must NOT synchronize with the device per step (the per-step
device_get was the train loop's hidden host-device barrier, ~200 ms of a
~355 ms step through the remote tunnel). Metrics buffer as device scalars
and flush in ONE bulk transfer at each log_every boundary — and at
done()/state_dict(), so phase means and checkpoint metadata never miss
buffered steps."""

import jax.numpy as jnp

from vrvq_tpu.train.tracker import Tracker


def _m(v):
    return {"loss": jnp.float32(v), "mel/loss": jnp.float32(v * 2)}


def test_log_metrics_buffers_until_boundary():
    tr = Tracker(log_every=4)
    for s in range(1, 4):
        tr.step = s
        tr.log_metrics("train", _m(float(s)))
    assert len(tr._pending) == 3          # nothing fetched yet
    assert tr._phase_counts["train"] == 0
    tr.step = 4
    tr.log_metrics("train", _m(4.0))      # boundary: bulk flush
    assert tr._pending == []
    assert tr._phase_counts["train"] == 4
    assert tr._phase_sums["train"]["loss"] == 1 + 2 + 3 + 4


def test_done_flushes_buffered_steps():
    tr = Tracker(log_every=1000)
    for s in range(1, 6):
        tr.step = s
        tr.log_metrics("val", _m(1.0))
    means = tr.done("val")
    assert means["loss"] == 1.0
    assert means["mel/loss"] == 2.0
    assert tr._pending == []


def test_state_dict_flushes_buffered_steps():
    tr = Tracker(log_every=1000)
    tr.step = 1
    tr.log_metrics("val", _m(3.0))
    tr.done("val")
    tr.step = 2
    tr.log_metrics("val", _m(5.0))
    sd = tr.state_dict()                  # checkpoint path: must not drop
    assert tr._pending == []
    assert tr.history["val"][-1]["loss"] == 3.0
    # the flushed-but-not-done() step is in the running sums
    assert tr._phase_sums["val"]["loss"] == 5.0
    assert sd["step"] == 2


def test_is_best_tracks_minimum():
    tr = Tracker(log_every=1000)
    for v, expect in ((3.0, True), (2.0, True), (2.5, False)):
        tr.log_metrics("val", _m(v))
        tr.done("val")
        assert tr.is_best("val", "loss") is expect


def test_atexit_flush_is_quiet_and_flushes(tmp_path):
    """A dying run keeps its buffered window: _flush_quietly (registered
    via atexit) folds pending metrics into the phase sums, and never
    raises even if the device/writer is already unusable."""
    log = tmp_path / "log.txt"
    tr = Tracker(log_every=1000, log_file=str(log))
    for s in range(1, 4):
        tr.step = s
        tr.log_metrics("train", _m(2.0))
    assert len(tr._pending) == 3
    tr._flush_quietly()
    assert tr._pending == []
    assert tr._phase_counts["train"] == 3

    # simulate an unusable state at interpreter exit: must not raise
    tr._pending.append(("train", 99, ("loss",), object()))
    tr._flush_quietly()
