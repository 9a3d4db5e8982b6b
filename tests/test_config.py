"""Config system tests: $include composition, scopes, CLI overrides."""

from pathlib import Path

from vrvq_tpu.config import Config, parse_args

REPO = Path(__file__).resolve().parents[1]


def test_load_flagship_config():
    cfg = Config.load(REPO / "conf/vrvq/vrvq_a2.yml", base_dir=REPO)
    kw = cfg.kwargs("DAC_VRVQ")
    assert kw["model_type"] == "VBR"
    assert kw["n_codebooks"] == 8
    assert kw["level_min"] == 0.125 and kw["level_max"] == 6
    assert kw["quantizer_dropout"] == 0.0  # the include override wins
    assert cfg["lambdas"]["vq/rate_loss"] == 2
    assert cfg["batch_size"] == 64


def test_include_chain_24kbps():
    cfg = Config.load(REPO / "conf/base_24kbps.yml", base_dir=REPO)
    assert cfg.kwargs("DAC_VRVQ")["n_codebooks"] == 28


def test_scope_lookup():
    cfg = Config.load(REPO / "conf/vrvq/vrvq_a2.yml", base_dir=REPO)
    assert cfg.get("AudioDataset.duration") is None
    with cfg.scope("train"):
        assert cfg.kwargs("AudioDataset")["duration"] == 0.38
    with cfg.scope("val"):
        assert cfg.kwargs("AudioDataset")["duration"] == 5.0
        assert cfg.kwargs("AudioDataset")["n_examples"] == 64
    # unscoped keys still visible inside a scope
    with cfg.scope("train"):
        assert cfg.kwargs("AudioLoader")["shuffle"] is True


def test_cli_overrides():
    cfg = parse_args(
        [
            "--args.load", str(REPO / "conf/vrvq/vrvq_a2.yml"),
            "--DAC_VRVQ.n_codebooks", "16",
            "--batch_size", "8",
            "--resume",
        ],
        base_dir=REPO,
    )
    assert cfg.kwargs("DAC_VRVQ")["n_codebooks"] == 16
    assert cfg["batch_size"] == 8
    assert cfg["resume"] is True


def test_24kbps_model_builds_and_encodes():
    """The 28-codebook (~24 kbps) variant (conf/base_24kbps.yml) works
    end-to-end at tiny dims."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vrvq_tpu.models import DAC_VRVQ

    cfg = Config.load(REPO / "conf/base_24kbps.yml", base_dir=REPO)
    kw = cfg.kwargs("DAC_VRVQ")
    assert kw["n_codebooks"] == 28
    kw.update(encoder_dim=8, decoder_dim=64, codebook_size=16,
              model_type="VBR", level_min=0.125, level_max=6.0)
    m = DAC_VRVQ(**kw)
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 2048).astype(np.float32))
    params = m.init(rngs, x, level=1.0)
    out = m.apply(params, x, level=1.0)
    assert out["codes"].shape == (1, 28, 4)
    assert out["mask_imp"].shape == (1, 28, 4)
