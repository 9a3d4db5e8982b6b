"""Train-step tests: losses finite, params update, loss decreases, DP sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.models import DAC_VRVQ, Discriminator
from vrvq_tpu.losses import L1Loss, MultiScaleSTFTLoss, MelSpectrogramLoss
from vrvq_tpu.train.state import make_optimizer
from vrvq_tpu.train.loop import make_train_step, make_val_step, init_train_state

# integration-scale: excluded from the quick tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

TINY = dict(
    encoder_dim=8, encoder_rates=(2, 4, 8, 8), decoder_dim=128,
    decoder_rates=(8, 8, 4, 2), n_codebooks=4, codebook_size=32,
    codebook_dim=4, sample_rate=44100, model_type="VBR",
    level_min=0.125, level_max=6.0, full_codebook_rate=0.25,
)

LAMBDAS = {
    "mel/loss": 15.0, "adv/feat_loss": 2.0, "adv/gen_loss": 1.0,
    "vq/commitment_loss": 0.25, "vq/codebook_loss": 1.0, "vq/rate_loss": 2.0,
}


@pytest.fixture(scope="module")
def setup():
    gen = DAC_VRVQ(**TINY)
    disc = Discriminator(periods=(2, 3), fft_sizes=(512,), rates=())
    opt_g = make_optimizer(lr=1e-4, max_grad_norm=1e3)
    opt_d = make_optimizer(lr=1e-4, max_grad_norm=10.0)
    stft_l = MultiScaleSTFTLoss(window_lengths=(512,))
    mel_l = MelSpectrogramLoss(n_mels=(40,), window_lengths=(512,),
                               mel_fmin=(0,), mel_fmax=(None,),
                               pow=1.0, mag_weight=0.0, sample_rate=44100)
    wave_l = L1Loss()
    audio = jnp.zeros((4, 1, 4096))
    state = init_train_state(gen, disc, opt_g, opt_d, audio)
    step = jax.jit(make_train_step(gen, disc, opt_g, opt_d, LAMBDAS,
                                   stft_l, mel_l, wave_l))
    val = jax.jit(make_val_step(gen, stft_l, mel_l, wave_l))
    return gen, state, step, val


def test_train_step_updates_and_is_finite(setup):
    _, state, step, _ = setup
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(4, 1, 4096).astype(np.float32) * 0.1)
    new_state, metrics = step(state, audio, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # params actually moved
    g0 = state.gen_params["params"]["encoder"]["in_conv"]["v"]
    g1 = new_state.gen_params["params"]["encoder"]["in_conv"]["v"]
    assert float(jnp.abs(g1 - g0).max()) > 0
    d0 = state.disc_params["params"]["mpd_2"]["conv_0"]["v"]
    d1 = new_state.disc_params["params"]["mpd_2"]["conv_0"]["v"]
    assert float(jnp.abs(d1 - d0).max()) > 0


def test_loss_decreases_over_steps(setup):
    _, state, step, _ = setup
    rng = np.random.RandomState(1)
    audio = jnp.asarray(rng.randn(4, 1, 4096).astype(np.float32) * 0.1)
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step(state, audio, sub)
        losses.append(float(metrics["mel/loss"]))
    # same batch every step: reconstruction must improve
    assert losses[-1] < losses[0]


def test_val_step(setup):
    _, state, _, val = setup
    rng = np.random.RandomState(2)
    audio = jnp.asarray(rng.randn(2, 1, 4096).astype(np.float32) * 0.1)
    out = val(state.gen_params, audio)
    assert np.isfinite(float(out["mel/loss"]))
    assert "vq/rate_loss" in out


def test_data_parallel_train_step(setup):
    """Same step jit'd over an 8-device mesh with the batch sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from vrvq_tpu.parallel.mesh import make_mesh, shard_batch, replicate

    gen, state, _, _ = setup
    disc = Discriminator(periods=(2, 3), fft_sizes=(512,), rates=())
    opt_g = make_optimizer(lr=1e-4, max_grad_norm=1e3)
    opt_d = make_optimizer(lr=1e-4, max_grad_norm=10.0)
    stft_l = MultiScaleSTFTLoss(window_lengths=(512,))
    mel_l = MelSpectrogramLoss(n_mels=(40,), window_lengths=(512,),
                               mel_fmin=(0,), mel_fmax=(None,),
                               pow=1.0, mag_weight=0.0, sample_rate=44100)
    step = make_train_step(gen, disc, opt_g, opt_d, LAMBDAS,
                           stft_l, mel_l, L1Loss())

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    state_r = replicate(state, mesh)
    rng = np.random.RandomState(3)
    audio = shard_batch(
        jnp.asarray(rng.randn(8, 1, 4096).astype(np.float32) * 0.1), mesh
    )
    jstep = jax.jit(step)
    new_state, metrics = jstep(state_r, audio, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == int(state.step) + 1
    # gradient sync: params identical across devices (replicated output)
    leaf = new_state.gen_params["params"]["encoder"]["in_conv"]["v"]
    assert np.isfinite(np.asarray(leaf)).all()


def test_remat_train_step_matches(setup):
    """Rematerialized step produces the same losses as the plain step."""
    from vrvq_tpu.models import DAC_VRVQ, Discriminator
    from vrvq_tpu.losses import L1Loss, MultiScaleSTFTLoss, MelSpectrogramLoss
    from vrvq_tpu.train.state import make_optimizer
    from vrvq_tpu.train.loop import make_train_step

    gen, state, step, _ = setup
    disc = Discriminator(periods=(2, 3), fft_sizes=(512,), rates=())
    opt_g = make_optimizer(lr=1e-4, max_grad_norm=1e3)
    opt_d = make_optimizer(lr=1e-4, max_grad_norm=10.0)
    stft_l = MultiScaleSTFTLoss(window_lengths=(512,))
    mel_l = MelSpectrogramLoss(n_mels=(40,), window_lengths=(512,),
                               mel_fmin=(0,), mel_fmax=(None,),
                               pow=1.0, mag_weight=0.0, sample_rate=44100)
    step_r = jax.jit(make_train_step(gen, disc, opt_g, opt_d, LAMBDAS,
                                     stft_l, mel_l, L1Loss(), remat=True))
    rng = np.random.RandomState(9)
    audio = jnp.asarray(rng.randn(4, 1, 4096).astype(np.float32) * 0.1)
    k = jax.random.PRNGKey(5)
    _, m_plain = step(state, audio, k)
    _, m_remat = step_r(state, audio, k)
    np.testing.assert_allclose(float(m_remat["loss"]), float(m_plain["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(
        float(m_remat["other/grad_norm_g"]), float(m_plain["other/grad_norm_g"]),
        rtol=1e-3,
    )


def test_split_steps_match_fused(setup):
    """d_step+g_step sequence produces the same losses as the fused step."""
    from vrvq_tpu.models import Discriminator
    from vrvq_tpu.losses import L1Loss, MultiScaleSTFTLoss, MelSpectrogramLoss
    from vrvq_tpu.train.state import make_optimizer
    from vrvq_tpu.train.loop import make_split_train_steps

    gen, state, fused_step, _ = setup
    disc = Discriminator(periods=(2, 3), fft_sizes=(512,), rates=())
    opt_g = make_optimizer(lr=1e-4, max_grad_norm=1e3)
    opt_d = make_optimizer(lr=1e-4, max_grad_norm=10.0)
    stft_l = MultiScaleSTFTLoss(window_lengths=(512,))
    mel_l = MelSpectrogramLoss(n_mels=(40,), window_lengths=(512,),
                               mel_fmin=(0,), mel_fmax=(None,),
                               pow=1.0, mag_weight=0.0, sample_rate=44100)
    d_step, g_step = make_split_train_steps(
        gen, disc, opt_g, opt_d, LAMBDAS, stft_l, mel_l, L1Loss()
    )
    d_step = jax.jit(d_step)
    g_step = jax.jit(g_step)

    rng = np.random.RandomState(11)
    audio = jnp.asarray(rng.randn(4, 1, 4096).astype(np.float32) * 0.1)
    k = jax.random.PRNGKey(6)

    _, m_fused = fused_step(state, audio, k)
    s1, m_d = d_step(state, audio, k)
    s2, m_g = g_step(s1, audio, k)
    np.testing.assert_allclose(float(m_d["adv/disc_loss"]),
                               float(m_fused["adv/disc_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_g["loss"]), float(m_fused["loss"]),
                               rtol=1e-4)
    assert int(s2.step) == int(state.step) + 1


def _tiny_losses():
    stft_l = MultiScaleSTFTLoss(window_lengths=(512,))
    mel_l = MelSpectrogramLoss(n_mels=(40,), window_lengths=(512,),
                               mel_fmin=(0,), mel_fmax=(None,),
                               pow=1.0, mag_weight=0.0, sample_rate=44100)
    return stft_l, mel_l, L1Loss()


def test_accum_step_matches_full_batch():
    """K-way accumulation == one full-batch step when the forward is
    rng-independent (CBR, quantizer_dropout=0): every loss is a batch
    mean, so the mean of micro-gradients is the full-batch gradient."""
    from vrvq_tpu.train.loop import make_accum_train_step

    cbr = dict(TINY)
    cbr.update(model_type="CBR", quantizer_dropout=0.0)
    cbr.pop("level_min"), cbr.pop("level_max"), cbr.pop("full_codebook_rate")
    gen = DAC_VRVQ(**cbr)
    disc = Discriminator(periods=(2, 3), fft_sizes=(512,), rates=())
    opt_g = make_optimizer(lr=1e-4, max_grad_norm=1e3)
    opt_d = make_optimizer(lr=1e-4, max_grad_norm=10.0)
    stft_l, mel_l, wave_l = _tiny_losses()
    audio0 = jnp.zeros((4, 1, 4096))
    state = init_train_state(gen, disc, opt_g, opt_d, audio0)

    fused = jax.jit(make_train_step(gen, disc, opt_g, opt_d, LAMBDAS,
                                    stft_l, mel_l, wave_l))
    accum = jax.jit(make_accum_train_step(gen, disc, opt_g, opt_d, LAMBDAS,
                                          stft_l, mel_l, wave_l,
                                          accum_steps=2))
    rng = np.random.RandomState(21)
    audio = jnp.asarray(rng.randn(4, 1, 4096).astype(np.float32) * 0.1)
    k = jax.random.PRNGKey(7)
    s_f, m_f = fused(state, audio, k)
    s_a, m_a = accum(state, audio, k)

    np.testing.assert_allclose(float(m_a["adv/disc_loss"]),
                               float(m_f["adv/disc_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_f["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(m_a["other/grad_norm_g"]),
                               float(m_f["other/grad_norm_g"]), rtol=1e-3)
    # Updated params agree leaf-by-leaf. Tolerance is the first-step Adam
    # update scale: step-1 updates are ~±lr per element (m/sqrt(v) ≈ sign(g)),
    # so accumulation-order noise on a near-zero gradient element can flip
    # its update sign — a ~2·lr=2e-4 param difference that says nothing
    # about gradient correctness (the grad-norm check above pins that down).
    for pf, pa in zip(jax.tree_util.tree_leaves(s_f.gen_params),
                      jax.tree_util.tree_leaves(s_a.gen_params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pf),
                                   rtol=1e-3, atol=2.5e-4)
    assert int(s_a.step) == 1


def test_accum_split_matches_fused_accum(setup):
    """split=True accum steps compose to the fused accum step (VBR model)."""
    from vrvq_tpu.train.loop import make_accum_train_step

    gen, state, _, _ = setup
    disc = Discriminator(periods=(2, 3), fft_sizes=(512,), rates=())
    opt_g = make_optimizer(lr=1e-4, max_grad_norm=1e3)
    opt_d = make_optimizer(lr=1e-4, max_grad_norm=10.0)
    stft_l, mel_l, wave_l = _tiny_losses()
    common = (gen, disc, opt_g, opt_d, LAMBDAS, stft_l, mel_l, wave_l)
    fused = jax.jit(make_accum_train_step(*common, accum_steps=2))
    d_step, g_step = make_accum_train_step(*common, accum_steps=2, split=True)
    d_step, g_step = jax.jit(d_step), jax.jit(g_step)

    rng = np.random.RandomState(23)
    audio = jnp.asarray(rng.randn(4, 1, 4096).astype(np.float32) * 0.1)
    k = jax.random.PRNGKey(8)
    _, m_f = fused(state, audio, k)
    s1, m_d = d_step(state, audio, k)
    s2, m_g = g_step(s1, audio, k)
    np.testing.assert_allclose(float(m_d["adv/disc_loss"]),
                               float(m_f["adv/disc_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_g["loss"]), float(m_f["loss"]),
                               rtol=1e-4)
    assert int(s2.step) == int(state.step) + 1


def test_accum_data_parallel(setup):
    """Accumulated step over an 8-device mesh: micro-batches stay sharded."""
    from vrvq_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    from vrvq_tpu.train.loop import make_accum_train_step

    gen, state, _, _ = setup
    disc = Discriminator(periods=(2, 3), fft_sizes=(512,), rates=())
    opt_g = make_optimizer(lr=1e-4, max_grad_norm=1e3)
    opt_d = make_optimizer(lr=1e-4, max_grad_norm=10.0)
    stft_l, mel_l, wave_l = _tiny_losses()
    step = jax.jit(make_accum_train_step(
        gen, disc, opt_g, opt_d, LAMBDAS, stft_l, mel_l, wave_l,
        accum_steps=2))
    mesh = make_mesh(8)
    state_r = replicate(state, mesh)
    rng = np.random.RandomState(25)
    audio = shard_batch(
        jnp.asarray(rng.randn(16, 1, 4096).astype(np.float32) * 0.1), mesh
    )
    new_state, metrics = step(state_r, audio, jax.random.PRNGKey(9))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["other/batch_size"]) == 16.0
    assert int(new_state.step) == int(state.step) + 1
