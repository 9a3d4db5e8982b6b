"""End-to-end trainer integration: config -> data -> train loop ->
checkpoint -> resume -> inference sweep, all on a tiny model + synthetic
wavs. This exercises the full orchestration path the reference drives via
scripts/train.py (SURVEY §3.1)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

from vrvq_tpu.config import Config
from vrvq_tpu.data.audio_io import write_wav

# integration-scale: excluded from the quick tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainer")
    data = root / "wavs"
    data.mkdir()
    rng = np.random.RandomState(0)
    for i in range(6):
        t = np.arange(int(1.0 * 44100)) / 44100
        x = (0.4 * np.sin(2 * np.pi * (200 + 80 * i) * t)).astype(np.float32)
        x += 0.05 * rng.randn(len(t)).astype(np.float32)
        write_wav(data / f"clip_{i}.wav", x, 44100)

    cfg = Config({
        # tiny model, full VBR machinery
        "DAC_VRVQ.sample_rate": 44100,
        "DAC_VRVQ.encoder_dim": 8,
        "DAC_VRVQ.encoder_rates": [2, 4, 8, 8],
        "DAC_VRVQ.decoder_dim": 128,
        "DAC_VRVQ.decoder_rates": [8, 8, 4, 2],
        "DAC_VRVQ.n_codebooks": 4,
        "DAC_VRVQ.codebook_size": 32,
        "DAC_VRVQ.codebook_dim": 4,
        "DAC_VRVQ.model_type": "VBR",
        "DAC_VRVQ.level_min": 0.125,
        "DAC_VRVQ.level_max": 6.0,
        "DAC_VRVQ.full_codebook_rate": 0.25,
        "DAC_VRVQ.quantizer_dropout": 0.0,
        "Discriminator.periods": [2, 3],
        "Discriminator.fft_sizes": [512],
        "Discriminator.rates": [],
        "AdamW.lr": 1e-4,
        "AdamW.betas": [0.8, 0.99],
        "ExponentialLR.gamma": 0.999996,
        "MultiScaleSTFTLoss.window_lengths": [512],
        "MelSpectrogramLoss.n_mels": [40],
        "MelSpectrogramLoss.window_lengths": [512],
        "MelSpectrogramLoss.mel_fmin": [0],
        "MelSpectrogramLoss.mel_fmax": [None],
        "MelSpectrogramLoss.pow": 1.0,
        "MelSpectrogramLoss.mag_weight": 0.0,
        "lambdas": {
            "mel/loss": 15.0, "adv/feat_loss": 2.0, "adv/gen_loss": 1.0,
            "vq/commitment_loss": 0.25, "vq/codebook_loss": 1.0,
            "vq/rate_loss": 2.0,
        },
        "train/build_dataset.folders": {"music": [str(data)]},
        "val/build_dataset.folders": {"music": [str(data)]},
        "train/AudioDataset.duration": 0.38,
        "train/AudioDataset.n_examples": 100,
        "val/AudioDataset.duration": 0.38,
        "val/AudioDataset.n_examples": 4,
        "AudioLoader.shuffle": True,
        "AudioDataset.without_replacement": True,
        "build_transform.preprocess": ["Identity"],
        "build_transform.augment_prob": 0.0,
        "build_transform.augment": ["Identity"],
        "build_transform.postprocess": ["RescaleAudio"],
        "batch_size": 4,
        # divides the 4-device data mesh -> exercises sharded validation
        "val_batch_size": 4,
        "num_iters": 3,
        "valid_freq": 2,
        "sample_freq": 1000,
        "save_iters": [],
        "val_idx": [0, 1],
        "num_workers": 2,
        "seed": 0,
    })
    return root, data, cfg


def test_train_checkpoint_resume_infer(env):
    from vrvq_tpu.train.trainer import train
    from vrvq_tpu.train import checkpoint as ckpt

    root, data, cfg = env
    save_path = str(root / "ckpt")
    out = train(cfg, save_path=save_path)
    assert out == save_path
    assert (Path(save_path) / "latest" / "state").exists()
    meta = ckpt.load_metadata(save_path, "latest")
    assert meta["step"] == 3  # trained 3 iters (steps 0..2, +1 on update)

    # log file written
    assert (Path(save_path) / "log.txt").exists()

    # ---- resume for 2 more steps
    cfg["resume"] = True
    cfg["num_iters"] = 5
    out = train(cfg, save_path=save_path)
    meta = ckpt.load_metadata(save_path, "latest")
    assert meta["step"] == 5

    # ---- inference sweep from the trained checkpoint
    from vrvq_tpu.models import DAC_VRVQ
    from vrvq_tpu.infer.sweep import save_results
    from vrvq_tpu.train.loop import init_train_state
    from vrvq_tpu.train.state import make_optimizer
    from vrvq_tpu.models import Discriminator
    import jax.numpy as jnp

    gen = DAC_VRVQ(**cfg.kwargs("DAC_VRVQ"))
    disc = Discriminator(**cfg.kwargs("Discriminator"))
    # optimizer chain structure must match the trainer's (clip + adamw)
    opt_g = make_optimizer(max_grad_norm=1e3)
    opt_d = make_optimizer(max_grad_norm=10.0)
    abstract = init_train_state(gen, disc, opt_g, opt_d,
                                jnp.zeros((1, 1, 2048)))
    restored = ckpt.load_checkpoint(save_path, abstract, "latest")

    audio = np.random.RandomState(1).randn(1, 1, 4096).astype(np.float32) * 0.1
    meta = save_results(gen, restored.gen_params, audio, [0.5, 2.0],
                        str(root / "results"))
    assert len(meta) == 2
    with open(root / "results" / "0" / "metadata.json") as f:
        loaded = json.load(f)
    for v in loaded.values():
        assert np.isfinite(v["sisdr"]) and v["kbps"] > 0


def test_resume_is_bit_exact(env):
    """Interrupted-and-resumed training reproduces the uninterrupted run
    EXACTLY: per-step keys are fold_in(seed, step), the dataloader resumes
    at step*batch_size, and orbax restores both optimizer states — so
    every leaf of the final train state must match bit-for-bit."""
    from vrvq_tpu.train.trainer import train
    from vrvq_tpu.train import checkpoint as ckpt
    from vrvq_tpu.train.loop import init_train_state
    from vrvq_tpu.train.state import make_optimizer
    from vrvq_tpu.models import DAC_VRVQ, Discriminator
    import jax.numpy as jnp

    root, data, base_cfg = env

    def run(save_path, iters_list):
        cfg = Config(dict(base_cfg.to_dict()))
        cfg["valid_freq"] = 100  # only the last-iter checkpoint matters
        cfg["sample_freq"] = 1000
        cfg["val_idx"] = []  # skip TB sample sweeps (one less compile/run)
        for i, n in enumerate(iters_list):
            cfg["num_iters"] = n
            cfg["resume"] = i > 0
            train(cfg, save_path=str(save_path))
        return str(save_path)

    path_a = run(root / "ckpt_straight", [3])
    path_b = run(root / "ckpt_resumed", [1, 3])

    cfg = Config(dict(base_cfg.to_dict()))
    gen = DAC_VRVQ(**cfg.kwargs("DAC_VRVQ"))
    disc = Discriminator(**cfg.kwargs("Discriminator"))
    abstract = init_train_state(gen, disc, make_optimizer(max_grad_norm=1e3),
                                make_optimizer(max_grad_norm=10.0),
                                jnp.zeros((1, 1, 2048)))
    state_a = ckpt.load_checkpoint(path_a, abstract, "latest")
    state_b = ckpt.load_checkpoint(path_b, abstract, "latest")
    assert int(state_a.step) == int(state_b.step) == 3

    leaves_a, treedef_a = jax.tree_util.tree_flatten(state_a)
    leaves_b, treedef_b = jax.tree_util.tree_flatten(state_b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_inference_cli(env):
    """scripts/inference.py end-to-end via subprocess against the trained
    checkpoint (reference: scripts/inference.py:26-122 CLI)."""
    import os
    import subprocess
    import sys
    import yaml

    root, data, cfg = env
    save_path = Path(str(root / "ckpt"))
    if not (save_path / "latest" / "state").exists():
        pytest.skip("training test must run first")

    # write the tiny config as a yml the CLI can load
    cfg_dict = {k: v for k, v in cfg.to_dict().items()
                if not k.startswith(("train/", "val/"))}
    cfg_path = root / "tiny.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    repo = Path(__file__).resolve().parents[1]
    env_vars = dict(os.environ)
    env_vars["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "inference.py"),
         "--args.load", str(cfg_path),
         "--ckpt_dir", str(save_path),
         "--tag", "latest",
         "--data_dir", str(data),
         "--save_result_dir", str(root / "cli_results"),
         "--num_examples", "1",
         "--duration", "0.2"],
        capture_output=True, text=True, env=env_vars, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    meta_files = list((root / "cli_results").rglob("metadata.json"))
    assert meta_files, out.stdout
    loaded = json.loads(meta_files[0].read_text())
    assert len(loaded) == 12  # default level list
    for v in loaded.values():
        assert "sisdr" in v and "kbps" in v


def test_evaluate_cli(env):
    """scripts/evaluate.py: full metric menu per level + codebook entropy
    over a directory, via subprocess against the trained checkpoint."""
    import os
    import subprocess
    import sys
    import yaml

    root, data, cfg = env
    save_path = Path(str(root / "ckpt"))
    if not (save_path / "latest" / "state").exists():
        pytest.skip("training test must run first")

    cfg_dict = {k: v for k, v in cfg.to_dict().items()
                if not k.startswith(("train/", "val/"))}
    cfg_path = root / "tiny_eval.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    repo = Path(__file__).resolve().parents[1]
    env_vars = dict(os.environ)
    env_vars["JAX_PLATFORMS"] = "cpu"
    out_json = root / "eval.json"
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "evaluate.py"),
         "--args.load", str(cfg_path),
         "--ckpt_dir", str(save_path),
         "--tag", "latest",
         "--data_dir", str(data),
         "--levels", "0.5,2",
         "--num_examples", "2",
         "--duration", "0.2",
         "--out", str(out_json)],
        capture_output=True, text=True, env=env_vars, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out_json.read_text())
    assert report["num_examples"] == 2
    assert len(report["levels"]) == 2
    n_q = cfg["DAC_VRVQ.n_codebooks"]
    for stats in report["levels"].values():
        for m in ("SI-SDR", "SDR", "SI-SNR", "SNR", "L1", "mel", "stft"):
            assert np.isfinite(stats[m]["mean"]), (m, stats)
        assert 0 < stats["bpf"]
        assert 0 < stats["kbps"]
    assert len(report["codebook_entropy_bits"]) == n_q
    assert all(0 <= p <= 1 for p in report["codebook_usage_pct"])


def test_batch_iterator_propagates_producer_errors():
    """A transform/IO error in the prefetch producer thread must abort
    the consumer (re-raised from q.get()), not hang it forever."""
    from vrvq_tpu.train.trainer import _batch_iterator

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            return {"x": i}

        @staticmethod
        def collate(items):
            return {"xs": [it["x"] for it in items]}

    def bad_prepare(batch):
        raise RuntimeError("synthetic transform failure")

    it = _batch_iterator(DS(), batch_size=2, prepare=bad_prepare)
    with pytest.raises(RuntimeError, match="synthetic transform failure"):
        next(it)

    # and the happy path still yields prepared batches
    it2 = _batch_iterator(DS(), batch_size=2, prepare=lambda b: sum(b["xs"]))
    batch = next(it2)
    assert batch["prepared_audio"] == batch["xs"][0] + batch["xs"][1]


def test_batch_iterator_local_slice_partitions_global_batch():
    """Multi-host data sharding: with batch_size the GLOBAL batch, each
    process's local_slice loads a disjoint row range of every batch and
    the idx arithmetic (resume position) stays host-count-independent."""
    from vrvq_tpu.train.trainer import _batch_iterator

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": i}

        @staticmethod
        def collate(items):
            return {"xs": [it["x"] for it in items]}

    # a 2-process world, global batch 8
    shards = [
        _batch_iterator(DS(), batch_size=8, local_slice=(0, 4)),
        _batch_iterator(DS(), batch_size=8, local_slice=(4, 8)),
    ]
    full = _batch_iterator(DS(), batch_size=8)
    for _ in range(3):  # wraps the 10-item dataset
        want = next(full)["xs"]
        got = next(shards[0])["xs"] + next(shards[1])["xs"]
        assert got == want

    # resume parity: starting at step 2 (start_idx 16) sees the same rows
    resumed = _batch_iterator(DS(), batch_size=8, start_idx=16,
                              local_slice=(0, 4))
    fresh = _batch_iterator(DS(), batch_size=8, start_idx=16)
    assert next(resumed)["xs"] == next(fresh)["xs"][:4]


def test_data_mesh_size_selection():
    """Single-process picks the largest device count dividing the batch;
    multihost must use ALL devices (a devices[:n] subset mesh is not
    process-uniform — jax.make_array_from_process_local_data raises
    'non-uniform sharding' — so an indivisible batch is a config error,
    caught loudly at load() instead of crashing the first train step)."""
    from vrvq_tpu.train.trainer import _data_mesh_size

    # single process: largest n <= n_devices with batch % n == 0
    assert _data_mesh_size(16, 8, 1) == 8
    assert _data_mesh_size(12, 8, 1) == 6
    assert _data_mesh_size(7, 8, 1) == 7
    assert _data_mesh_size(5, 4, 1) == 1

    # multihost: full device set or a loud error
    assert _data_mesh_size(8, 4, 2) == 4
    with pytest.raises(ValueError, match="divisible by the global device"):
        _data_mesh_size(6, 4, 2)  # 6 % 2 procs ok, but 6 % 4 devices isn't
    with pytest.raises(ValueError, match="divisible by the global device"):
        _data_mesh_size(2, 4, 2)


def test_export_torch_cli(env):
    """scripts/export_torch.py writes a reference-layout weights.pth from
    a trained checkpoint, and the torch importer accepts it."""
    import os
    import subprocess
    import sys
    import yaml

    root, data, cfg = env
    save_path = Path(str(root / "ckpt"))
    if not (save_path / "latest" / "state").exists():
        pytest.skip("training test must run first")

    cfg_dict = {k: v for k, v in cfg.to_dict().items()
                if not k.startswith(("train/", "val/"))}
    cfg_path = root / "tiny_export.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    repo = Path(__file__).resolve().parents[1]
    env_vars = dict(os.environ)
    env_vars["JAX_PLATFORMS"] = "cpu"
    out_pth = root / "weights.pth"
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "export_torch.py"),
         "--args.load", str(cfg_path),
         "--ckpt_dir", str(save_path),
         "--tag", "latest",
         "--out", str(out_pth)],
        capture_output=True, text=True, env=env_vars, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    from vrvq_tpu.train.checkpoint import load_torch_checkpoint

    params = load_torch_checkpoint(
        out_pth, cfg["DAC_VRVQ.n_codebooks"], "VBR"
    )
    assert "encoder" in params["params"] and "decoder" in params["params"]


def test_fresh_run_refuses_to_clobber_checkpoints(tmp_path):
    """A non-resume run pointed at a directory that already holds
    checkpoints must fail BEFORE touching anything (a fresh run's step-1
    init save once silently replaced a finished run's 'latest')."""
    from vrvq_tpu.train.trainer import train

    save = tmp_path / "ckpt"
    (save / "latest").mkdir(parents=True)
    (save / "latest" / "meta.json").write_text("{}")
    with pytest.raises(FileExistsError, match="resume"):
        train(Config({}), save_path=str(save))
