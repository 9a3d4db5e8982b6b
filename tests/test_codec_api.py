"""Streaming compress/decompress roundtrip tests (file -> .dac -> file)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.audio import Signal
from vrvq_tpu.data.audio_io import write_wav
from vrvq_tpu.infer.codec_api import CodecProcessor
from vrvq_tpu.models import DAC_VRVQ
from vrvq_tpu.models.codec import DACFile

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
def tone(tmp_path_factory):
    d = tmp_path_factory.mktemp("audio")
    t = np.arange(int(2.5 * 44100)) / 44100
    x = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    path = d / "tone.wav"
    write_wav(path, x, 44100)
    return path


def test_compress_unchunked(proc, tone):
    f = proc.compress(tone, win_duration=None, n_quantizers=2)
    assert f.padding is True
    assert f.codes.shape[1] == 2
    assert f.original_length == int(2.5 * 44100)
    out = proc.decompress(f)
    assert out.audio_data.shape == (1, 1, f.original_length)


def test_compress_chunked_cbr(proc, tone):
    f = proc.compress(tone, win_duration=0.5, n_quantizers=4)
    assert f.padding is False
    assert f.codes.shape[1] == 4
    out = proc.decompress(f)
    assert out.audio_data.shape == (1, 1, f.original_length)
    assert np.isfinite(out.numpy()).all()


def test_compress_chunked_vbr_and_file_roundtrip(proc, tone, tmp_path):
    f = proc.compress(tone, win_duration=0.5, level=1.0)
    assert f.vbr_counts is not None
    assert f.vbr_counts.shape == (1, f.codes.shape[-1])
    assert f.vbr_counts.min() >= 1 and f.vbr_counts.max() <= 4
    p = f.save(tmp_path / "tone.dac")
    g = DACFile.load(p)
    out = proc.decompress(g)
    assert out.audio_data.shape == (1, 1, f.original_length)
    assert np.isfinite(out.numpy()).all()


def test_chunked_codes_match_unchunked_interior(proc, tone):
    """Padding-free windowing must give the same codes as one big padless
    encode (the windows are exactly aligned by construction)."""
    sig = Signal.load(tone)
    sig.normalize(-16)
    data = np.asarray(sig.audio_data, np.float32)
    n_samples, hop, _, delay = proc.window_geometry(0.5)

    f = proc.compress(tone, win_duration=0.5, n_quantizers=4,
                      normalize_db=-16)

    # single-shot padless encode over the same delay-padded signal
    padded = np.pad(data, ((0, 0), (0, 0), (delay, delay)))
    # first window's codes must match the first chunk of the stream
    x = padded[..., :n_samples]
    enc = proc._encode_nopad(jnp.asarray(x), 4, 1.0)
    first = np.asarray(enc["codes"])
    np.testing.assert_array_equal(f.codes[..., : first.shape[-1]], first)


def test_moe_model_streaming(tmp_path):
    """CodecProcessor works with the DAC_MOE variant too."""
    from vrvq_tpu.models import DAC_MOE

    m = DAC_MOE(encoder_dim=8, decoder_dim=64, n_codebooks=4,
                codebook_size=32, codebook_dim=4, model_type="VBR",
                level_min=1.0, level_max=1.0)
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, jnp.zeros((1, 1, 4096)), level=1.0)
    proc = CodecProcessor(m, params)

    t = np.arange(int(1.2 * 44100)) / 44100
    x = (0.4 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    path = tmp_path / "moe.wav"
    write_wav(path, x, 44100)

    f = proc.compress(path, win_duration=0.5, n_quantizers=4)
    out = proc.decompress(f)
    assert out.audio_data.shape == (1, 1, f.original_length)
    assert np.isfinite(out.numpy()).all()


def test_compress_window_too_small_raises(proc, tone):
    """A window below the receptive field must fail loudly, not emit an
    empty stream."""
    with pytest.raises(ValueError, match="win_duration"):
        proc.compress(tone, win_duration=0.3, n_quantizers=2)


def test_fused_quantizer_encode_parity(proc, tone):
    """The fused-Pallas-RVQ serving encode must produce codes and VBR
    counts identical to the module-quantizer path through the public
    compress API (padded one-shot AND padding-free chunked), VBR + CBR."""
    fused = CodecProcessor(proc.model, proc.params, fused_quantizer=True)
    for kw in (
        dict(win_duration=0.5, level=1.0),           # chunked VBR
        dict(win_duration=None, level=1.0),          # one-shot VBR
        dict(win_duration=0.5, n_quantizers=3),      # chunked CBR
    ):
        a = proc.compress(tone, normalize_db=-16, **kw)
        b = fused.compress(tone, normalize_db=-16, **kw)
        np.testing.assert_array_equal(a.codes, b.codes)
        if a.vbr_counts is None:
            assert b.vbr_counts is None
        else:
            np.testing.assert_array_equal(a.vbr_counts, b.vbr_counts)


def test_fused_quantizer_rejects_moe():
    from vrvq_tpu.models import DAC_MOE

    m = DAC_MOE(encoder_dim=8, decoder_dim=64, n_codebooks=4,
                codebook_size=32, codebook_dim=4, model_type="VBR",
                level_min=1.0, level_max=1.0)
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, jnp.zeros((1, 1, 4096)), level=1.0)
    with pytest.raises(ValueError, match="DAC_VRVQ"):
        CodecProcessor(m, params, fused_quantizer=True)


def test_fused_quantizer_cbr_model(tone):
    """fused_quantizer also covers a genuinely-CBR DAC_VRVQ (the plain
    ResidualVectorQuantize param tree, no importance subnet)."""
    kw = dict(TINY, model_type="CBR")
    kw.pop("level_min"), kw.pop("level_max")
    m = DAC_VRVQ(**kw)
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, jnp.zeros((1, 1, 4096)))
    a = CodecProcessor(m, params).compress(
        tone, win_duration=0.5, normalize_db=None, n_quantizers=4)
    b = CodecProcessor(m, params, fused_quantizer=True).compress(
        tone, win_duration=0.5, normalize_db=None, n_quantizers=4)
    np.testing.assert_array_equal(a.codes, b.codes)
    assert a.vbr_counts is None and b.vbr_counts is None


def test_fused_quantizer_with_fast_model(proc, tone):
    """The production serving combo: fused RVQ encode over the
    fast-inference model (decoder fold + bf16 + polynomial snake). The
    encoder/quantizer stay live in make_inference_model, so codes must
    remain bit-identical to the module path."""
    from vrvq_tpu.infer.fast import make_inference_model

    fm, fp = make_inference_model(proc.model, proc.params)
    a = CodecProcessor(fm, fp).compress(
        tone, win_duration=0.5, normalize_db=None, level=1.0)
    b = CodecProcessor(fm, fp, fused_quantizer=True).compress(
        tone, win_duration=0.5, normalize_db=None, level=1.0)
    np.testing.assert_array_equal(a.codes, b.codes)
    np.testing.assert_array_equal(a.vbr_counts, b.vbr_counts)
