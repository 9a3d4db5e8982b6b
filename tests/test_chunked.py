"""Chunked decode must equal the one-shot decode bit-exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.models import DAC_VRVQ
from vrvq_tpu.models.codec import decoder_halo_frames
from vrvq_tpu.infer.chunked import decode_chunked


def _model_and_params(rates=(8, 8, 4, 2), dim=64):
    m = DAC_VRVQ(
        encoder_dim=8, decoder_dim=dim, encoder_rates=tuple(reversed(rates)),
        decoder_rates=rates, n_codebooks=2, codebook_size=16, codebook_dim=4,
        model_type="CBR",
    )
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    hop = int(np.prod(rates))
    params = m.init(rngs, jnp.zeros((1, 1, 4 * hop)))
    return m, params


@pytest.mark.parametrize("t_frames,chunk", [(100, 16), (97, 16), (33, 32),
                                            (64, 64)])
@pytest.mark.slow
def test_chunked_decode_bit_exact(t_frames, chunk):
    """Flagship decoder topology (rates 8,8,4,2) at small width: chunked
    decode sees bit-identical input windows to the one-shot decode
    (including clip edges — edge windows run flush against the boundary),
    so any difference is pure XLA scheduling noise, orders of magnitude
    below what a halo bug produces (~1e-3, edge-localized)."""
    m, params = _model_and_params()
    rng = np.random.RandomState(0)
    z_q = jnp.asarray(
        rng.randn(2, m.resolved_latent_dim, t_frames).astype(np.float32)
    )
    # compare the two jitted programs (the production path); eager-vs-jit
    # comparisons pick up unrelated conv-algorithm noise
    full = jax.jit(
        lambda p, z: m.apply(p, z, method=DAC_VRVQ.decode)
    )(params, z_q)
    chunked = jax.jit(
        lambda p, z: decode_chunked(m, p, z, chunk_frames=chunk)
    )(params, z_q)
    assert chunked.shape == full.shape
    err = np.abs(np.asarray(chunked) - np.asarray(full)).max()
    assert err < 1e-6, f"max abs diff {err} (halo bugs show up at ~1e-3)"


def test_chunked_decode_short_clip_fallback():
    m, params = _model_and_params()
    rng = np.random.RandomState(1)
    z_q = jnp.asarray(rng.randn(1, m.resolved_latent_dim, 8).astype(np.float32))
    full = m.apply(params, z_q, method=DAC_VRVQ.decode)
    chunked = decode_chunked(m, params, z_q, chunk_frames=256)
    np.testing.assert_array_equal(np.asarray(chunked), np.asarray(full))


def test_halo_radius_is_sufficient_and_tight():
    """Perturb one latent frame: the output must change only within
    halo_frames*hop samples of it (validates the analytic radius)."""
    m, params = _model_and_params()
    hop = m.hop_length
    halo = decoder_halo_frames(m.decoder_rates)
    t = 64
    rng = np.random.RandomState(2)
    z = rng.randn(1, m.resolved_latent_dim, t).astype(np.float32)
    z2 = z.copy()
    z2[:, :, t // 2] += 1.0
    a = np.asarray(m.apply(params, jnp.asarray(z), method=DAC_VRVQ.decode))
    b = np.asarray(m.apply(params, jnp.asarray(z2), method=DAC_VRVQ.decode))
    diff = np.abs(a - b).max(axis=(0, 1))  # (T*hop,)
    changed = np.flatnonzero(diff > 0)
    lo, hi = changed.min(), changed.max()
    center = (t // 2) * hop
    assert lo >= center - halo * hop
    assert hi < center + (halo + 1) * hop
    # tight-ish: the true radius is within 4 frames of the analytic halo
    spread = max(center - lo, hi - center) / hop
    assert spread > halo - 5, (spread, halo)


@pytest.mark.parametrize("t_frames,chunk", [(100, 16), (97, 16)])
@pytest.mark.slow
def test_chunked_encode_codes_match(t_frames, chunk):
    """Chunked encode must reproduce the one-shot encode: identical
    codebook indices and near-identical z_q/imp_map."""
    from vrvq_tpu.infer.chunked import encode_chunked

    m = DAC_VRVQ(
        encoder_dim=8, decoder_dim=64, n_codebooks=3, codebook_size=32,
        codebook_dim=4, model_type="VBR", level_min=0.125, level_max=6.0,
    )
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    hop = m.hop_length
    params = m.init(rngs, jnp.zeros((1, 1, 4 * hop)), level=1.0)
    rng = np.random.RandomState(3)
    audio = jnp.asarray(
        rng.randn(2, 1, t_frames * hop).astype(np.float32) * 0.3
    )

    full = jax.jit(
        lambda p, a: m.apply(p, a, level=1.0, method=DAC_VRVQ.encode)
    )(params, audio)
    chunked = jax.jit(
        lambda p, a: encode_chunked(m, p, a, level=1.0, chunk_frames=chunk)
    )(params, audio)

    np.testing.assert_array_equal(
        np.asarray(chunked["codes"]), np.asarray(full["codes"])
    )
    np.testing.assert_allclose(
        np.asarray(chunked["imp_map"]), np.asarray(full["imp_map"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(chunked["z_q"]), np.asarray(full["z_q"]),
        rtol=1e-4, atol=1e-6,
    )


def test_forward_chunked_matches_forward():
    from vrvq_tpu.infer.chunked import forward_chunked

    m = DAC_VRVQ(
        encoder_dim=8, decoder_dim=64, n_codebooks=3, codebook_size=32,
        codebook_dim=4, model_type="VBR", level_min=0.125, level_max=6.0,
    )
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    hop = m.hop_length
    params = m.init(rngs, jnp.zeros((1, 1, 4 * hop)), level=1.0)
    rng = np.random.RandomState(4)
    n = 70 * hop + 123  # odd (non-hop-multiple) length
    audio = jnp.asarray(rng.randn(1, 1, n).astype(np.float32) * 0.3)

    full = jax.jit(lambda p, a: m.apply(p, a, level=1.0))(params, audio)
    audio_c, codes_c = jax.jit(
        lambda p, a: forward_chunked(m, p, a, level=1.0, chunk_frames=16)
    )(params, audio)
    assert audio_c.shape == full["audio"].shape == audio.shape
    np.testing.assert_array_equal(np.asarray(codes_c), np.asarray(full["codes"]))
    err = np.abs(np.asarray(audio_c) - np.asarray(full["audio"])).max()
    assert err < 1e-5, err


def test_sweep_batched_matches_sequential():
    from vrvq_tpu.infer.sweep import LevelSweep

    m = DAC_VRVQ(
        encoder_dim=8, decoder_dim=64, n_codebooks=4, codebook_size=32,
        codebook_dim=4, model_type="VBR", level_min=0.125, level_max=6.0,
    )
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    hop = m.hop_length
    params = m.init(rngs, jnp.zeros((1, 1, 4 * hop)), level=1.0)
    rng = np.random.RandomState(5)
    audio = jnp.asarray(rng.randn(1, 1, 40 * hop).astype(np.float32) * 0.3)

    sweeper = LevelSweep(m, params)
    levels = [0.2, 1.0, 3.0]
    seq = sweeper.sweep(audio, levels)
    bat = sweeper.sweep(audio, levels, batched=True)
    for l in levels:
        np.testing.assert_array_equal(
            np.asarray(bat[l]["mask"]), np.asarray(seq[l]["mask"])
        )
        assert bat[l]["bpf"] == pytest.approx(seq[l]["bpf"])
        err = np.abs(
            np.asarray(bat[l]["audio"]) - np.asarray(seq[l]["audio"])
        ).max()
        assert err < 1e-5, (l, err)
