"""Delay / output-length arithmetic validated against the actual conv stacks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.models import codec
from vrvq_tpu.models.dac_vrvq import Encoder, Decoder


@pytest.mark.parametrize("length", [8192, 16384])
def test_encoder_output_length_no_padding(length):
    """The padding-free Encoder's actual frame count matches the arithmetic."""
    strides = (2, 4, 8, 8)
    enc = Encoder(d_model=4, strides=strides, latent_dim=16, padding=False)
    x = jnp.zeros((1, length, 1))
    params = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(params, x)
    expected = codec.output_length(codec.encoder_conv_specs(strides), length)
    assert y.shape[1] == expected


@pytest.mark.parametrize("frames", [37, 64])
def test_decoder_output_length_no_padding(frames):
    rates = (8, 8, 4, 2)
    dec = Decoder(input_channel=16, channels=32, rates=rates, padding=False)
    x = jnp.zeros((1, frames, 16))
    params = dec.init(jax.random.PRNGKey(0), x)
    y = dec.apply(params, x)
    expected = codec.output_length(codec.decoder_conv_specs(rates), frames)
    assert y.shape[1] == expected


def test_full_model_delay_reference_value():
    """Delay of the vrvq_a2 topology. The reference computes this by the same
    walk over encoder + quantizer projections + importance subnet + decoder
    (models/dac_base.py:86-110); the value must be stable."""
    specs = codec.model_conv_specs((2, 4, 8, 8), (8, 8, 4, 2), 8, vbr=True)
    d = codec.delay(specs)
    # invariants: delay positive, even split, larger than the CBR model's
    specs_cbr = codec.model_conv_specs((2, 4, 8, 8), (8, 8, 4, 2), 8, vbr=False)
    assert d > 0
    assert codec.delay(specs_cbr) > 0
    assert d >= codec.delay(specs_cbr)


def test_output_length_invertible_through_delay():
    """For chunked streaming: out = output_length(n) must satisfy the
    reference's compress/decompress arithmetic (hop bookkeeping)."""
    specs = codec.model_conv_specs((2, 4, 8, 8), (8, 8, 4, 2), 8, vbr=True)
    n_samples = 512 * 100
    out = codec.output_length(specs, n_samples)
    assert out > 0
    # longer input -> no shorter output
    assert codec.output_length(specs, n_samples * 2) >= out


def test_dacfile_roundtrip(tmp_path):
    codes = np.random.RandomState(0).randint(0, 1024, (1, 8, 86)).astype(np.uint16)
    counts = np.random.RandomState(1).randint(1, 9, (1, 86)).astype(np.uint8)
    f = codec.DACFile(
        codes=codes, chunk_length=86, original_length=44100, input_db=-16.0,
        channels=1, sample_rate=44100, padding=True, vbr_counts=counts,
    )
    p = f.save(tmp_path / "x.dac")
    g = codec.DACFile.load(p)
    # VBR files pack: only the kept (mask-on) codes are preserved
    stage = np.arange(8).reshape(1, 8, 1)
    mask = stage < counts[:, None, :]
    np.testing.assert_array_equal(g.codes[mask], codes.astype(np.int32)[mask])
    assert np.all(g.codes[~mask] == 0)
    np.testing.assert_array_equal(g.vbr_counts, counts)
    assert g.sample_rate == 44100 and g.chunk_length == 86
    assert g.original_length == 44100 and g.padding is True


def test_vbr_packing_roundtrip():
    from vrvq_tpu.models.codec import pack_vbr_codes, unpack_vbr_codes

    rng = np.random.RandomState(0)
    codes = rng.randint(0, 1024, (2, 8, 50)).astype(np.int32)
    counts = rng.randint(1, 9, (2, 50)).astype(np.uint8)
    packed = pack_vbr_codes(codes, counts)
    assert packed.shape == (int(counts.sum()),)
    rec = unpack_vbr_codes(packed, counts, 8)
    stage = np.arange(8).reshape(1, 8, 1)
    mask = stage < counts[:, None, :]
    np.testing.assert_array_equal(rec[mask], codes[mask])
    assert np.all(rec[~mask] == 0)


def test_dacfile_vbr_size_scales_with_level(tmp_path):
    """The .dac file must actually be smaller at lower VBR levels."""
    rng = np.random.RandomState(1)
    codes = rng.randint(0, 1024, (1, 8, 860)).astype(np.uint16)
    meta = dict(chunk_length=860, original_length=44100 * 10, input_db=-16.0,
                channels=1, sample_rate=44100, padding=True)
    low = codec.DACFile(codes=codes, vbr_counts=np.full((1, 860), 1, np.uint8),
                        **meta)
    high = codec.DACFile(codes=codes, vbr_counts=np.full((1, 860), 8, np.uint8),
                         **meta)
    p_low = low.save(tmp_path / "low.dac")
    p_high = high.save(tmp_path / "high.dac")
    import os
    assert os.path.getsize(p_low) < os.path.getsize(p_high) / 4
    # roundtrip keeps the kept codes
    g = codec.DACFile.load(p_low)
    np.testing.assert_array_equal(g.codes[:, 0], codes.astype(np.int32)[:, 0])
    assert np.all(g.codes[:, 1:] == 0)


def test_pack_bits_roundtrip_fuzz():
    from vrvq_tpu.models.codec import pack_bits, unpack_bits

    rng = np.random.RandomState(0)
    for bits in (1, 4, 7, 10, 16):
        for n in (0, 1, 7, 8, 1000):
            vals = rng.randint(0, 1 << bits, size=n).astype(np.uint32)
            packed = pack_bits(vals, bits)
            assert packed.nbytes <= (n * bits + 7) // 8
            out = unpack_bits(packed, bits, n)
            np.testing.assert_array_equal(out, vals)
    with pytest.raises(ValueError):
        pack_bits(np.array([1 << 10]), 10)


def test_dacfile_bitpacked_sizes(tmp_path):
    """VBR files bit-pack codes (10 -> not 16 bits) and counts (4 bits);
    compact CBR packs too; plain CBR stays reference-format uint16."""
    from vrvq_tpu.models.codec import DACFile

    rng = np.random.RandomState(1)
    b, nq, t, k = 1, 8, 2000, 1024
    codes = rng.randint(0, k, size=(b, nq, t)).astype(np.int32)
    meta = dict(chunk_length=t, original_length=t * 512, input_db=-16.0,
                channels=1, sample_rate=44100, padding=True)

    plain = DACFile(codes=codes, **meta)
    p_plain = plain.save(tmp_path / "plain.dac")
    p_compact = plain.save(tmp_path / "compact.dac", compact=True,
                           codebook_size=k)
    g = DACFile.load(p_compact)
    np.testing.assert_array_equal(g.codes, codes)
    sz_plain, sz_compact = p_plain.stat().st_size, p_compact.stat().st_size
    # 16 -> 10 bits/code = 37.5% smaller (plus fixed metadata)
    assert sz_compact < 0.67 * sz_plain

    counts = rng.randint(1, nq + 1, size=(b, t)).astype(np.uint8)
    vbr = DACFile(codes=codes, vbr_counts=counts, **meta)
    p_vbr = vbr.save(tmp_path / "vbr.dac", codebook_size=k)
    h = DACFile.load(p_vbr)
    np.testing.assert_array_equal(h.vbr_counts, counts)
    # masked-off positions load as 0; kept positions match
    stage = np.arange(nq).reshape(1, nq, 1)
    mask = stage < counts[:, None, :]
    np.testing.assert_array_equal(h.codes[mask], codes[mask])
    assert (h.codes[~mask] == 0).all()
    # expected ~ kept*10 bits + t*4 bits
    kept_bits = int(mask.sum()) * 10 + t * 4
    assert p_vbr.stat().st_size < kept_bits / 8 + 2000


def test_dacfile_legacy_vbr_format_loads(tmp_path):
    """Files written by the earlier (unpacked-bits) VBR format still load."""
    from vrvq_tpu.models.codec import DACFile, pack_vbr_codes

    rng = np.random.RandomState(2)
    codes = rng.randint(0, 64, size=(1, 4, 100)).astype(np.int32)
    counts = rng.randint(1, 5, size=(1, 100)).astype(np.uint8)
    artifacts = {
        "codes_packed": pack_vbr_codes(codes, counts),
        "vbr_counts": counts,
        "n_codebooks": 4,
        "metadata": {
            "input_db": np.float32(-16.0), "original_length": 51200,
            "sample_rate": 44100, "chunk_length": 100, "channels": 1,
            "padding": True, "dac_version": "1.0.0",
        },
    }
    p = tmp_path / "legacy.dac"
    with open(p, "wb") as f:
        np.save(f, artifacts)
    g = DACFile.load(p)
    np.testing.assert_array_equal(g.vbr_counts, counts)
    stage = np.arange(4).reshape(1, 4, 1)
    mask = stage < counts[:, None, :]
    np.testing.assert_array_equal(g.codes[mask], codes[mask])


def test_dacfile_entropy_coded(tmp_path):
    """entropy=True range-codes the stream: lossless roundtrip, and on a
    skewed (realistic) code distribution the file beats bit-packing."""
    from vrvq_tpu.models.codec import DACFile

    rng = np.random.RandomState(3)
    b, nq, t, k = 1, 8, 3000, 1024
    # skewed per-stage distributions (trained codecs emit ~7.5/10 bits)
    codes = np.zeros((b, nq, t), np.int32)
    for i in range(nq):
        p = 1.0 / (np.arange(1, k + 1) ** 1.2)
        p /= p.sum()
        codes[0, i] = rng.permutation(k)[rng.choice(k, size=t, p=p)]
    counts = rng.randint(1, nq + 1, size=(b, t)).astype(np.uint8)
    meta = dict(chunk_length=t, original_length=t * 512, input_db=-16.0,
                channels=1, sample_rate=44100, padding=True)

    # VBR: entropy vs bit-packed
    vbr = DACFile(codes=codes, vbr_counts=counts, **meta)
    p_pack = vbr.save(tmp_path / "pack.dac", codebook_size=k)
    p_rc = vbr.save(tmp_path / "rc.dac", codebook_size=k, entropy=True)
    g = DACFile.load(p_rc)
    np.testing.assert_array_equal(g.vbr_counts, counts)
    stage = np.arange(nq).reshape(1, nq, 1)
    mask = stage < counts[:, None, :]
    np.testing.assert_array_equal(g.codes[mask], codes[mask])
    assert p_rc.stat().st_size < 0.85 * p_pack.stat().st_size

    # CBR: entropy roundtrip
    cbr = DACFile(codes=codes, **meta)
    p_crc = cbr.save(tmp_path / "cbr_rc.dac", codebook_size=k, entropy=True)
    h = DACFile.load(p_crc)
    np.testing.assert_array_equal(h.codes, codes)
    p_cpack = cbr.save(tmp_path / "cbr_pack.dac", codebook_size=k,
                       compact=True)
    assert p_crc.stat().st_size < 0.85 * p_cpack.stat().st_size
