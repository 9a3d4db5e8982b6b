"""Loss-stack tests: SI-SDR analytic cases, GAN loss structure, jit-safety."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.losses import (
    L1Loss, SISDRLoss, MultiScaleSTFTLoss, MelSpectrogramLoss,
    discriminator_loss, generator_loss,
    SISDRLossFramewise, L1LossFramewise, MelSpectrogramLossFramewise,
)
from vrvq_tpu.models import Discriminator
from vrvq_tpu.metrics import si_sdr, cal_bpf_from_mask, cal_entropy, mean_std


def test_sisdr_perfect_reconstruction():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 1, 4096).astype(np.float32))
    loss = SISDRLoss()(x, x)
    assert float(loss) < -50  # -SDR, perfect -> very negative


def test_sisdr_scale_invariance():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 1, 4096).astype(np.float32)
    a = SISDRLoss()(jnp.asarray(x), jnp.asarray(2.0 * x))
    assert float(a) < -50


def test_sisdr_metric_known_value():
    """est = ref + orthogonal noise at known power -> analytic SI-SDR."""
    rng = np.random.RandomState(2)
    t = np.arange(8192) / 44100
    ref = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None, None]
    noise = np.cos(2 * np.pi * 440 * t).astype(np.float32)[None, None]
    # orthogonal, equal power -> SI-SDR = 0 dB
    val = si_sdr(ref + noise, ref)
    assert abs(val) < 0.1


def test_stft_mel_losses_zero_for_identical():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 1, 8192).astype(np.float32))
    assert float(MultiScaleSTFTLoss()(x, x)) == 0.0
    assert float(MelSpectrogramLoss(sample_rate=44100)(x, x)) == 0.0
    assert float(L1Loss()(x, x)) == 0.0


def test_mel_loss_vrvq_config_runs_jitted():
    loss = MelSpectrogramLoss(
        n_mels=(5, 10, 20, 40, 80, 160, 320),
        window_lengths=(32, 64, 128, 256, 512, 1024, 2048),
        mel_fmin=(0,) * 7,
        mel_fmax=(None,) * 7,
        pow=1.0,
        clamp_eps=1e-5,
        mag_weight=0.0,
        sample_rate=44100,
    )
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 1, 16384).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 1, 16384).astype(np.float32))
    f = jax.jit(lambda a, b: loss(a, b))
    v = float(f(x, y))
    assert np.isfinite(v) and v > 0


def test_mel_loss_level_weighting():
    loss = MelSpectrogramLoss(sample_rate=44100)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 1, 8192).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 1, 8192).astype(np.float32))
    lv1 = jnp.ones((2, 1, 1))
    lv2 = jnp.full((2, 1, 1), 2.0)
    a = float(loss(x, y, levels=lv1))
    b = float(loss(x, y, levels=lv2))
    assert a > b  # 1/level weighting


@pytest.fixture(scope="module")
def tiny_disc():
    d = Discriminator(periods=(2, 3), fft_sizes=(512,), rates=())
    x = jnp.zeros((1, 1, 4096))
    params = d.init(jax.random.PRNGKey(0), x)
    return d, params


def test_gan_losses(tiny_disc):
    d, params = tiny_disc
    rng = np.random.RandomState(6)
    real = jnp.asarray(rng.randn(1, 1, 4096).astype(np.float32))
    fake = jnp.asarray(rng.randn(1, 1, 4096).astype(np.float32))
    f_real = d.apply(params, real)
    f_fake = d.apply(params, fake)
    assert len(f_real) == 3  # 2 MPD + 1 MRD
    dl = float(discriminator_loss(f_fake, f_real))
    gl, fl = generator_loss(f_fake, f_real)
    assert np.isfinite(dl) and np.isfinite(float(gl)) and np.isfinite(float(fl))
    # discriminating identical signals: disc loss = mean(f^2)+mean((1-f)^2)
    dl_same = float(discriminator_loss(f_real, f_real))
    assert dl_same > 0


def test_framewise_losses_shapes():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 1, 4096).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 1, 4096).astype(np.float32))
    assert SISDRLossFramewise()(x, y, 512).shape == (2, 8)
    assert L1LossFramewise()(x, y, 512).shape == (2, 8)
    m = MelSpectrogramLossFramewise(sr=44100)(x, y)
    assert m.shape == (2, 8)


def test_cal_bpf_from_mask():
    mask = np.zeros((2, 4, 10), np.float32)
    mask[:, :2, :] = 1.0  # 2 codebooks on everywhere
    bpf = cal_bpf_from_mask(mask, [10, 10, 10, 10])
    assert abs(bpf - 20.0) < 1e-5


def test_cal_entropy_uniform_is_full():
    counts = [np.ones(1024), np.ones(256)]
    ent, pct = cal_entropy(counts)
    assert abs(ent[0] - 10.0) < 1e-6 and abs(pct[0] - 1.0) < 1e-6
    assert abs(ent[1] - 8.0) < 1e-6


def test_mean_std_nan_safe():
    m, s = mean_std(np.array([1.0, np.nan, 3.0]))
    assert m == 2.0


def test_nsim_quality_ordering():
    """NSIM: identical signals score 1.0; noisier recon scores lower."""
    from vrvq_tpu.metrics import nsim, cal_metrics

    rng = np.random.RandomState(8)
    t = np.arange(44100) / 44100
    ref = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, None]
    perfect = nsim(ref, ref)
    slight = nsim(ref + 0.01 * rng.randn(*ref.shape).astype(np.float32), ref)
    heavy = nsim(ref + 0.3 * rng.randn(*ref.shape).astype(np.float32), ref)
    assert perfect > 0.999
    assert perfect >= slight > heavy
    assert cal_metrics(ref, ref, loss_fn="ViSQOL") > 0.999


def test_msd_with_rate_resamples():
    """MSD at rate 2 (disabled by default config but a reference capability,
    models/discriminator.py:68-98) runs and halves the time axis."""
    from vrvq_tpu.models.discriminator import MSD

    msd = MSD(rate=2, sample_rate=44100)
    x = jnp.zeros((1, 8192, 1))
    params = msd.init(jax.random.PRNGKey(0), x)
    fmap = msd.apply(params, x)
    assert len(fmap) == 7
    # downsampled by 2 then strided convs (4,4,4,4): time ~ 8192/2/256
    assert fmap[-1].shape[1] <= 8192 // 2 // 64


def test_sdr_differs_from_si_sdr_on_filtered_estimate():
    """A delayed copy of the reference: the SDR distortion filter absorbs
    the delay (high SDR) while SI-SDR's pure gain cannot (low SI-SDR)."""
    from vrvq_tpu.metrics import sdr

    rng = np.random.RandomState(4)
    ref = rng.randn(1, 1, 8192).astype(np.float32)
    est = np.roll(ref, 3, axis=-1)
    est[..., :3] = 0.0
    high = sdr(est, ref)
    low = si_sdr(est, ref)
    assert high > 25.0, f"filtered-projection SDR should be high, got {high}"
    assert low < 5.0, f"SI-SDR should be low for a delayed copy, got {low}"


def test_sdr_matches_least_squares_oracle():
    """sdr() (FFT correlations + Toeplitz solve) equals a brute-force
    least-squares FIR projection computed directly from the signals."""
    from vrvq_tpu.metrics import sdr

    rng = np.random.RandomState(5)
    n, L = 2048, 64
    ref = rng.randn(n)
    # estimate = filtered ref + noise
    taps = rng.randn(8) * np.array([1.0, 0.5, 0.2, 0.1, 0.05, 0.02, 0.01, 0.005])
    est = np.convolve(ref, taps)[:n] + 0.1 * rng.randn(n)

    # brute-force: design matrix of L shifted copies of ref (zero-padded),
    # matching the correlation convention of the FFT version
    T = np.zeros((n, L))
    for k in range(L):
        T[k:, k] = ref[: n - k]
    h, *_ = np.linalg.lstsq(T, est, rcond=None)
    proj = T @ h
    expect = 10 * np.log10(np.sum(proj**2) / np.sum((est - proj) ** 2))

    got = sdr(est[None, None], ref[None, None], filter_length=L)
    assert abs(got - expect) < 0.1, (got, expect)


def test_cal_metrics_sdr_dispatch():
    from vrvq_tpu.metrics import cal_metrics

    rng = np.random.RandomState(6)
    ref = rng.randn(1, 1, 4096).astype(np.float32)
    est = ref + 0.01 * rng.randn(1, 1, 4096).astype(np.float32)
    v_sdr = cal_metrics(est, ref, loss_fn="SDR")
    v_sisdr = cal_metrics(est, ref, loss_fn="SI-SDR")
    assert np.isfinite(v_sdr) and np.isfinite(v_sisdr)
    # near-identical signals: both high, and SDR >= SI-SDR (filter has
    # strictly more freedom than a scalar gain)
    assert v_sdr >= v_sisdr - 0.2
