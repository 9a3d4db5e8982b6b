"""End-to-end pipeline tests: data loading, transforms, checkpoints, sweep."""

import json
import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.audio import Signal
from vrvq_tpu.data.audio_io import read_wav, write_wav, wav_info
from vrvq_tpu.data.loaders import AudioDataset, AudioLoader, ConcatDataset
from vrvq_tpu.data.transforms import (
    Compose, Identity, RescaleAudio, ShiftPhase, VolumeNorm, build_transform,
)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.RandomState(0)
    for i in range(4):
        t = np.arange(44100) / 44100
        x = 0.4 * np.sin(2 * np.pi * (220 + 110 * i) * t).astype(np.float32)
        write_wav(d / f"tone_{i}.wav", x, 44100)
    return d


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    x = (rng.rand(2, 1000).astype(np.float32) - 0.5)
    write_wav(tmp_path / "x.wav", x, 22050)
    info = wav_info(tmp_path / "x.wav")
    assert info.sample_rate == 22050 and info.num_channels == 2
    assert info.num_frames == 1000
    y, sr = read_wav(tmp_path / "x.wav")
    assert sr == 22050 and y.shape == (2, 1000)
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_wav_offset_read(tmp_path):
    x = np.arange(1000, dtype=np.float32)[None] / 2000
    write_wav(tmp_path / "r.wav", x, 1000)
    y, sr = read_wav(tmp_path / "r.wav", offset=0.5, duration=0.2)
    assert y.shape == (1, 200)
    np.testing.assert_allclose(y[0], x[0, 500:700], atol=1e-3)


def test_audio_loader_deterministic(wav_dir):
    loader = AudioLoader(sources=[str(wav_dir)], shuffle=False)
    a = loader(state=np.random.RandomState(3), sample_rate=44100, duration=0.2)
    b = loader(state=np.random.RandomState(3), sample_rate=44100, duration=0.2)
    assert a["path"] == b["path"]
    np.testing.assert_array_equal(a["signal"].numpy(), b["signal"].numpy())


def test_audio_dataset_and_collate(wav_dir):
    loader = AudioLoader(sources=[str(wav_dir)], shuffle=True)
    ds = AudioDataset(loader, 44100, n_examples=16, duration=0.25)
    items = [ds[i] for i in range(4)]
    batch = ds.collate(items)
    sig = batch["signal"]
    assert sig.audio_data.shape == (4, 1, int(0.25 * 44100))
    # idx-seeded reproducibility
    again = ds.collate([ds[i] for i in range(4)])
    np.testing.assert_array_equal(sig.numpy(), again["signal"].numpy())


def test_concat_dataset_roundrobin(wav_dir):
    loader = AudioLoader(sources=[str(wav_dir)], shuffle=False)
    d1 = AudioDataset(loader, 44100, n_examples=4, duration=0.1)
    d2 = AudioDataset(loader, 44100, n_examples=4, duration=0.1)
    cat = ConcatDataset([d1, d2])
    assert len(cat) == 8
    _ = cat[3]


def test_transforms_chain(wav_dir):
    tfm = Compose(
        Compose(Identity(), name="preprocess"),
        Compose(Identity(), name="augment", prob=0.0),
        Compose(RescaleAudio(), ShiftPhase(), name="postprocess"),
    )
    sig = Signal.load(next(wav_dir.glob("*.wav")))
    args = tfm.instantiate(np.random.RandomState(0), sig)
    out = tfm(sig, **args)
    assert out.audio_data.shape == sig.audio_data.shape
    assert float(jnp.max(jnp.abs(jnp.asarray(out.audio_data)))) <= 1.0 + 1e-5


def test_transform_apply_on_host(wav_dir):
    """Host-side application (the trainer default) must match the direct
    device-side chain bit-for-bit and hand back numpy, so the accelerator
    only ever sees the fully-prepared batch."""
    from vrvq_tpu.data.transforms import apply_on_host

    tfm = Compose(
        Compose(VolumeNorm(db=("const", -16)), name="preprocess"),
        Compose(ShiftPhase(), name="augment"),
        Compose(RescaleAudio(), name="postprocess"),
    )
    sig = Signal.load(next(wav_dir.glob("*.wav")))
    args = tfm.instantiate(np.random.RandomState(0), sig)
    direct = np.asarray(tfm(sig, **args).audio_data)
    hosted = apply_on_host(tfm, sig, args)
    assert isinstance(hosted.audio_data, np.ndarray)
    np.testing.assert_array_equal(np.asarray(hosted.audio_data), direct)


def test_volume_norm(wav_dir):
    sig = Signal.load(next(wav_dir.glob("*.wav")))
    vn = VolumeNorm(db=("const", -16))
    args = vn.instantiate(np.random.RandomState(0), sig)
    out = vn(sig, **args)
    loud = Signal(np.asarray(out.audio_data), 44100).loudness()
    assert abs(float(loud[0]) - (-16)) < 1.0


def test_checkpoint_roundtrip(tmp_path):
    from vrvq_tpu.models import DAC_VRVQ, Discriminator
    from vrvq_tpu.train.state import make_optimizer
    from vrvq_tpu.train.loop import init_train_state
    from vrvq_tpu.train import checkpoint as ckpt

    gen = DAC_VRVQ(encoder_dim=8, decoder_dim=64, n_codebooks=2,
                   codebook_size=16, codebook_dim=4, model_type="CBR")
    disc = Discriminator(periods=(2,), fft_sizes=(512,), rates=())
    opt = make_optimizer()
    state = init_train_state(gen, disc, opt, opt, jnp.zeros((1, 1, 2048)))
    ckpt.save_checkpoint(state, tmp_path, ["latest", "best"],
                         metadata={"note": "test"})
    assert (tmp_path / "latest" / "state").exists()
    assert (tmp_path / "best" / "meta.json").exists()
    # 'best' is a hardlink-copy of 'latest' (identical bytes, no second
    # 1.5 GB serialization at flagship scale) — both must restore exactly
    a = jax.tree_util.tree_leaves(state.gen_params)
    for tag in ("latest", "best"):
        restored = ckpt.load_checkpoint(tmp_path, state, tag)
        b = jax.tree_util.tree_leaves(restored.gen_params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert ckpt.load_metadata(tmp_path, "best")["note"] == "test"

    # rewriting 'latest' must NOT disturb the hardlinked 'best' (rmtree +
    # fresh inodes): save a mutated state to latest only, then best still
    # restores the ORIGINAL leaves
    state2 = state.replace(
        gen_params=jax.tree_util.tree_map(lambda x: x + 1.0,
                                          state.gen_params))
    ckpt.save_checkpoint(state2, tmp_path, ["latest"])
    again = ckpt.load_checkpoint(tmp_path, state, "best")
    for x, y in zip(a, jax.tree_util.tree_leaves(again.gen_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_tags():
    from vrvq_tpu.train.checkpoint import checkpoint_tags

    assert checkpoint_tags(10000, [10000], True) == ["latest", "best", "10k"]
    assert checkpoint_tags(5, [], False) == ["latest"]


def test_level_sweep(tmp_path, wav_dir):
    from vrvq_tpu.models import DAC_VRVQ
    from vrvq_tpu.infer.sweep import LevelSweep, save_results

    m = DAC_VRVQ(encoder_dim=8, decoder_dim=64, n_codebooks=4,
                 codebook_size=32, codebook_dim=4, model_type="VBR",
                 level_min=0.125, level_max=6.0)
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    x = jnp.zeros((1, 1, 4096))
    params = m.init(rngs, x, level=1.0)

    sweeper = LevelSweep(m, params)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(1, 1, 4096).astype(np.float32) * 0.1)
    res = sweeper.sweep(audio, levels=[0.2, 1.0, 3.0])
    kbps = [res[l]["kbps"] for l in (0.2, 1.0, 3.0)]
    assert kbps[0] <= kbps[1] <= kbps[2]

    meta = save_results(m, params, np.asarray(audio), [0.5, 1.0],
                        str(tmp_path / "results"))
    assert len(meta) == 2
    files = list((tmp_path / "results" / "0").glob("*.wav"))
    assert len(files) == 3  # 2 levels + input
    with open(tmp_path / "results" / "0" / "metadata.json") as f:
        loaded = json.load(f)
    assert all("sisdr" in v and "kbps" in v for v in loaded.values())


def test_align_lists_inserts_placeholders():
    from vrvq_tpu.data.loaders import align_lists

    a = [{"path": "root1/s1/x.wav"}, {"path": "root1/s2/x.wav"},
         {"path": "root1/s3/x.wav"}]
    b = [{"path": "root2/s1/y.wav"}, {"path": "root2/s3/y.wav"}]
    align_lists([a, b])
    assert len(a) == len(b) == 3
    assert b[1]["path"] == "none"  # s2 missing from the second list
    assert b[2]["path"].endswith("s3/y.wav")


def test_aligned_dataset_draws_matching_items(tmp_path):
    """Two loaders over parallel directory trees: aligned draws must pair
    the same-named subdirectory and excerpt window (reference
    data/loaders.py:143,165-170 + aligned get-time forwarding)."""
    rng = np.random.RandomState(0)
    for root in ("clean", "noisy"):
        for sub in ("s0", "s1", "s2"):
            d = tmp_path / root / sub
            d.mkdir(parents=True)
            x = (0.3 * rng.randn(44100)).astype(np.float32)
            write_wav(d / f"{root}.wav", x, 44100)

    l_clean = AudioLoader(sources=[str(tmp_path / "clean")], shuffle=False)
    l_noisy = AudioLoader(sources=[str(tmp_path / "noisy")], shuffle=False)
    ds = AudioDataset(
        {"clean": l_clean, "noisy": l_noisy}, sample_rate=44100,
        n_examples=6, duration=0.1, aligned=True,
    )
    for idx in range(6):
        item = ds[idx]
        p0 = Path(item["clean"]["path"])
        p1 = Path(item["noisy"]["path"])
        assert p0.parent.name == p1.parent.name
        assert item["clean"]["signal"].metadata.get("offset") == pytest.approx(
            item["noisy"]["signal"].metadata.get("offset")
        )


def test_aligned_dataset_mismatched_lists(tmp_path):
    """A subdir present in one root only: aligned draw yields silence from
    the loader that lacks it, instead of mispairing."""
    rng = np.random.RandomState(1)
    subs_a = ("s0", "s1", "s2")
    subs_b = ("s0", "s2")  # s1 missing
    for root, subs in (("a", subs_a), ("b", subs_b)):
        for sub in subs:
            d = tmp_path / root / sub
            d.mkdir(parents=True)
            x = (0.3 * rng.randn(44100)).astype(np.float32)
            write_wav(d / "x.wav", x, 44100)

    la = AudioLoader(sources=[str(tmp_path / "a")], shuffle=False)
    lb = AudioLoader(sources=[str(tmp_path / "b")], shuffle=False)
    AudioDataset({"a": la, "b": lb}, sample_rate=44100, n_examples=3,
                 duration=0.1, aligned=True)
    assert [x["path"] for x in lb.audio_lists[0]][1] == "none"
    assert len(lb.audio_lists[0]) == len(la.audio_lists[0])
