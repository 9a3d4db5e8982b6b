"""Adaptive range coder: exhaustive roundtrip fuzzing + compression sanity."""

import numpy as np
import pytest

from vrvq_tpu.ops.rangecoder import decode_adaptive, encode_adaptive


@pytest.mark.parametrize("n_symbols", [2, 3, 17, 256, 1024])
def test_roundtrip_uniform_fuzz(n_symbols):
    rng = np.random.RandomState(n_symbols)
    for n in (0, 1, 5, 1000):
        syms = rng.randint(0, n_symbols, size=n)
        data = encode_adaptive(syms, n_symbols)
        out = decode_adaptive(data, n, n_symbols)
        np.testing.assert_array_equal(out, syms)


def test_roundtrip_skewed_and_contexts():
    rng = np.random.RandomState(0)
    n_symbols, n_ctx, n = 1024, 8, 20000
    # skewed zipf-ish distribution per context
    base = rng.permutation(n_symbols)
    p = 1.0 / (np.arange(1, n_symbols + 1) ** 1.3)
    p /= p.sum()
    syms = base[rng.choice(n_symbols, size=n, p=p)]
    ctx = rng.randint(0, n_ctx, size=n)
    data = encode_adaptive(syms, n_symbols, ctx, n_ctx)
    out = decode_adaptive(data, n, n_symbols, ctx, n_ctx)
    np.testing.assert_array_equal(out, syms)
    # a zipf(1.3) stream has ~4-5 bits entropy: must beat 10-bit packing
    assert len(data) * 8 < 0.8 * n * 10


def test_constant_stream_compresses_hard():
    syms = np.full(5000, 7)
    data = encode_adaptive(syms, 1024)
    out = decode_adaptive(data, 5000, 1024)
    np.testing.assert_array_equal(out, syms)
    assert len(data) < 1000  # ~0 bits/symbol once adapted


def test_adversarial_edge_patterns():
    n_symbols = 64
    for pattern in (
        np.zeros(300, np.int64),
        np.full(300, n_symbols - 1),
        np.tile([0, n_symbols - 1], 150),
        np.arange(300) % n_symbols,
    ):
        data = encode_adaptive(pattern, n_symbols)
        out = decode_adaptive(data, len(pattern), n_symbols)
        np.testing.assert_array_equal(out, pattern)


def test_long_fuzz_many_seeds():
    n_symbols = 300  # non-power-of-two table
    for seed in range(20):
        rng = np.random.RandomState(seed)
        n = rng.randint(1, 4000)
        # mixture: bursts of repeats + uniform noise
        syms = rng.randint(0, n_symbols, size=n)
        rep = rng.randint(0, n_symbols)
        mask = rng.rand(n) < 0.5
        syms[mask] = rep
        data = encode_adaptive(syms, n_symbols)
        out = decode_adaptive(data, n, n_symbols)
        np.testing.assert_array_equal(out, syms)


def test_errors():
    with pytest.raises(ValueError):
        encode_adaptive(np.array([5]), 4)
    with pytest.raises(ValueError):
        encode_adaptive(np.array([1, 2]), 4, np.array([0]), 2)


@pytest.mark.skipif(
    __import__("vrvq_tpu.ops.rangecoder", fromlist=["x"])._native_lib() is None,
    reason="native lib not built",
)
def test_native_backend_byte_identical():
    """The C++ coder must produce byte-identical output to the Python
    specification (files/packets interop across backends), across
    one-shot and cross-packet stateful use."""
    from vrvq_tpu.ops.rangecoder import AdaptiveCoder

    rng = np.random.RandomState(7)
    n_symbols, n_ctx = 1024, 8
    py = AdaptiveCoder(n_symbols, n_ctx, backend="python")
    cc = AdaptiveCoder(n_symbols, n_ctx, backend="native")
    py_dec = AdaptiveCoder(n_symbols, n_ctx, backend="python")
    cc_dec = AdaptiveCoder(n_symbols, n_ctx, backend="native")
    for packet in range(6):
        n = rng.randint(1, 3000)
        syms = rng.randint(0, n_symbols, size=n)
        rep = rng.randint(0, n_symbols)
        syms[rng.rand(n) < 0.6] = rep  # skew
        ctx = rng.randint(0, n_ctx, size=n)
        a = py.encode(syms, ctx)
        b = cc.encode(syms, ctx)
        assert a == b, f"packet {packet}: byte divergence"
        # cross-backend decode: python bytes through native decoder & v.v.
        np.testing.assert_array_equal(cc_dec.decode(a, n, ctx), syms)
        np.testing.assert_array_equal(py_dec.decode(b, n, ctx), syms)


@pytest.mark.skipif(
    __import__("vrvq_tpu.ops.rangecoder", fromlist=["x"])._native_lib() is None,
    reason="native lib not built",
)
def test_native_backend_throughput():
    """Native coder should be at least 10x the Python coder."""
    import time

    from vrvq_tpu.ops.rangecoder import AdaptiveCoder

    rng = np.random.RandomState(9)
    syms = rng.randint(0, 1024, size=30000)
    t0 = time.perf_counter()
    AdaptiveCoder(1024, backend="python").encode(syms)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    AdaptiveCoder(1024, backend="native").encode(syms)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_py / 10, f"native {t_cc:.3f}s vs python {t_py:.3f}s"
