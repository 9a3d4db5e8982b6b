"""GRADIENT parity vs the genuine reference source (torch autograd).

Round-2 review follow-up: every prior parity test was forward-only. These
tests run torch ``backward()`` through the GENUINE reference model +
discriminator (/root/reference/models/{dac_vrvq,quantize,discriminator}.py,
imported via tests/reference_import.py) and compare per-parameter gradients
against ``jax.grad`` on converted weights for

  (a) the full generator loss — mel / multi-scale-STFT / waveform L1 /
      LSGAN adv gen + feature-matching / commitment / codebook / rate —
      through the STE importance mask (reference models/utils.py
      generate_mask_ste) and the weight-norm reparameterization
      (match points: reference scripts/train.py:298-335 generator branch,
      models/loss.py:168-447);
  (b) the discriminator LSGAN loss (reference models/loss.py:421-428,
      scripts/train.py:285-296).

Gradients are compared leaf-by-leaf after mapping the torch grads through
the SAME structural converters used for weights
(convert_torch_state_dict / convert_torch_discriminator_state_dict —
purely transposes/reshapes, so they map cotangents exactly like primals).

The loss oracles in this file re-express reference models/loss.py with
raw torch ops (that module imports torchaudio, not installed here); the
stft convention is the audiotools one our ops/stft.py is value-tested
against (tests/test_stft.py).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vrvq_tpu.models import DAC_VRVQ, Discriminator
from vrvq_tpu.losses import (
    L1Loss, MultiScaleSTFTLoss, MelSpectrogramLoss,
)
from vrvq_tpu.losses.gan import (
    discriminator_loss as j_disc_loss, generator_loss as j_gen_loss,
)
from vrvq_tpu.ops.stft import mel_filterbank
from vrvq_tpu.train.checkpoint import (
    convert_torch_state_dict, convert_torch_discriminator_state_dict,
)
from tests.reference_import import (
    import_reference_dac, import_reference_discriminator,
)
from tests.test_parity_reference import _make_pair, _test_audio

# ---------------------------------------------------------------- config

SMALL = dict(
    encoder_dim=16, encoder_rates=[2, 4, 8], decoder_dim=128,
    decoder_rates=[8, 4, 2], n_codebooks=4, codebook_size=64,
    codebook_dim=4, sample_rate=44100, model_type="VBR",
    full_codebook_rate=0.25, level_min=0.125, level_max=6.0,
    imp2mask_alpha=2.0, quantizer_dropout=0.0,
)
HOP = 2 * 4 * 8
SR = 44100

# two mel scales + two stft scales keep the CPU backward fast while still
# exercising the log/mag branches and the mel filterbank matmul
STFT_WINDOWS = (512, 128)
MEL_WINDOWS = (512, 128)
MEL_NMELS = (40, 20)

LAMBDAS = {
    # the shipped config weights (reference conf/base.yml:41-46 +
    # conf/vrvq/vrvq.yml rate loss) ...
    "mel/loss": 15.0, "adv/feat_loss": 2.0, "adv/gen_loss": 1.0,
    "vq/commitment_loss": 0.25, "vq/codebook_loss": 1.0,
    "vq/rate_loss": 2.0,
    # ... plus stft/waveform so their gradient paths are covered too (the
    # reference sums v * output[k] for any lambda key, train.py:320)
    "stft/loss": 1.0, "waveform/loss": 10.0,
}

DISC_PERIODS = (2, 3)
DISC_FFTS = (512,)


# ----------------------------------------------------- torch loss oracles

def _t_stft_mag(x: torch.Tensor, w: int) -> torch.Tensor:
    """|STFT| with audiotools conventions (center=True, periodic hann)."""
    b, c, t = x.shape
    window = torch.hann_window(w, periodic=True, dtype=x.dtype)
    spec = torch.stft(
        x.reshape(b * c, t), n_fft=w, hop_length=w // 4, win_length=w,
        window=window, center=True, pad_mode="reflect", return_complex=True,
    )
    return torch.abs(spec)


def t_multiscale_stft_loss(x, y, windows=STFT_WINDOWS, eps=1e-5, pw=2.0):
    """Reference models/loss.py:228-254 (log_weight=mag_weight=1)."""
    loss = 0.0
    for w in windows:
        xs, ys = _t_stft_mag(x, w), _t_stft_mag(y, w)
        loss = loss + torch.nn.functional.l1_loss(
            xs.clamp(eps).pow(pw).log10(), ys.clamp(eps).pow(pw).log10()
        )
        loss = loss + torch.nn.functional.l1_loss(xs, ys)
    return loss


def t_mel_loss(x, y, windows=MEL_WINDOWS, n_mels=MEL_NMELS,
               eps=1e-5, pw=1.0, mag_weight=0.0):
    """Reference models/loss.py:344-376 with the vrvq config's pow=1,
    mag_weight=0. The slaney filterbank is a shared constant (gradients
    flow through the spectrogram, not the bank); bank parity vs librosa's
    formula is tested in tests/test_stft.py."""
    loss = 0.0
    for w, m in zip(windows, n_mels):
        bank = torch.tensor(mel_filterbank(SR, w, m))
        xs = torch.einsum("mf,bft->bmt", bank, _t_stft_mag(x, w))
        ys = torch.einsum("mf,bft->bmt", bank, _t_stft_mag(y, w))
        loss = loss + torch.nn.functional.l1_loss(
            xs.clamp(eps).pow(pw).log10(), ys.clamp(eps).pow(pw).log10()
        )
        if mag_weight:
            loss = loss + mag_weight * torch.nn.functional.l1_loss(xs, ys)
    return loss


def t_disc_lsgan_loss(d_fake, d_real):
    """Reference models/loss.py:421-428."""
    loss = 0.0
    for f, r in zip(d_fake, d_real):
        loss = loss + torch.mean(f[-1] ** 2)
        loss = loss + torch.mean((1 - r[-1]) ** 2)
    return loss


def t_gen_adv_losses(d_fake, d_real):
    """Reference models/loss.py:430-447."""
    loss_g = 0.0
    for f in d_fake:
        loss_g = loss_g + torch.mean((1 - f[-1]) ** 2)
    loss_feat = 0.0
    for f, r in zip(d_fake, d_real):
        for j in range(len(f) - 1):
            loss_feat = loss_feat + torch.nn.functional.l1_loss(
                f[j], r[j].detach()
            )
    return loss_g, loss_feat


# ------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def gen_pair():
    return _make_pair(21, **SMALL)


@pytest.fixture(scope="module")
def disc_pair():
    ref_disc = import_reference_discriminator()
    torch.manual_seed(31)
    tdisc = ref_disc.Discriminator(
        rates=[], periods=list(DISC_PERIODS), fft_sizes=list(DISC_FFTS),
        sample_rate=SR,
    ).eval()
    sd = {k: v.numpy() for k, v in tdisc.state_dict().items()}
    dparams = convert_torch_discriminator_state_dict(
        sd, periods=DISC_PERIODS, rates=(), fft_sizes=DISC_FFTS,
    )
    dparams = jax.tree_util.tree_map(jnp.asarray, dparams)
    jdisc = Discriminator(
        rates=(), periods=DISC_PERIODS, fft_sizes=DISC_FFTS, sample_rate=SR,
    )
    return tdisc, jdisc, dparams


def _batch():
    a = _test_audio(0.14, seed=17)
    b = _test_audio(0.14, seed=23)
    x = np.concatenate([a, b], axis=0)
    return x[..., : x.shape[-1] // HOP * HOP]


def _grad_rel_errors(j_grads, t_grads_tree):
    """Per-leaf relative L2 error between two aligned pytrees."""
    j_leaves, j_def = jax.tree_util.tree_flatten_with_path(j_grads)
    t_leaves = dict(
        jax.tree_util.tree_flatten_with_path(t_grads_tree)[0]
    )
    errs = {}
    for path, jg in j_leaves:
        tg = np.asarray(t_leaves[path])
        jg = np.asarray(jg)
        assert jg.shape == tg.shape, (path, jg.shape, tg.shape)
        denom = max(float(np.linalg.norm(tg)), 1e-12)
        errs["/".join(str(p) for p in path)] = (
            float(np.linalg.norm(jg - tg)) / denom
        )
    return errs


def _assert_close(errs, tol, allow_zero=()):
    bad = {k: v for k, v in errs.items() if v > tol}
    assert not bad, (
        f"{len(bad)}/{len(errs)} gradient leaves exceed rel err {tol}: "
        f"{dict(sorted(bad.items(), key=lambda kv: -kv[1])[:8])}"
    )


# ----------------------------------------------------------------- tests

@pytest.mark.slow
def test_discriminator_lsgan_grads_match_torch(gen_pair, disc_pair):
    """(b) disc LSGAN loss: torch backward vs jax.grad, per-param."""
    tmodel, jmodel, params = gen_pair
    tdisc, jdisc, dparams = disc_pair
    x = _batch()

    with torch.no_grad():
        tout = tmodel(torch.tensor(x), SR, level=1.0)
        fake_t = tout["audio"]
    d_fake = tdisc(fake_t)
    d_real = tdisc(torch.tensor(x))
    loss_t = t_disc_lsgan_loss(d_fake, d_real)
    tdisc.zero_grad()
    loss_t.backward()
    t_grads = {n: p.grad.numpy() for n, p in tdisc.named_parameters()}
    t_tree = convert_torch_discriminator_state_dict(
        t_grads, periods=DISC_PERIODS, rates=(), fft_sizes=DISC_FFTS,
    )

    fake_j = jnp.asarray(fake_t.numpy())
    xj = jnp.asarray(x)

    def loss_fn(dp):
        return j_disc_loss(jdisc.apply(dp, fake_j), jdisc.apply(dp, xj))

    loss_j, j_grads = jax.value_and_grad(loss_fn)(dparams)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)
    errs = _grad_rel_errors(j_grads, t_tree)
    _assert_close(errs, tol=2e-3)


@pytest.mark.slow
def test_generator_full_loss_grads_match_torch(gen_pair, disc_pair):
    """(a) full generator loss (recon + adv + vq + rate) through the STE
    mask and weight norm: torch backward vs jax.grad, per-param."""
    tmodel, jmodel, params = gen_pair
    tdisc, jdisc, dparams = disc_pair
    x = _batch()
    xt = torch.tensor(x)

    # ---- torch: eval-mode forward is the deterministic branch (fixed
    # level, STE mask, no batch partition; models/quantize.py:374-414)
    tout = tmodel(xt, SR, level=1.0)
    recons = tout["audio"]
    d_fake = tdisc(recons)
    d_real = tdisc(xt)
    adv_g, adv_feat = t_gen_adv_losses(d_fake, d_real)
    out_t = {
        "mel/loss": t_mel_loss(recons, xt),
        "stft/loss": t_multiscale_stft_loss(recons, xt),
        "waveform/loss": torch.nn.functional.l1_loss(recons, xt),
        "adv/gen_loss": adv_g,
        "adv/feat_loss": adv_feat,
        "vq/commitment_loss": tout["vq/commitment_loss"],
        "vq/codebook_loss": tout["vq/codebook_loss"],
        "vq/rate_loss": tout["imp_map"].mean(),
    }
    total_t = sum(v * out_t[k] for k, v in LAMBDAS.items())
    tmodel.zero_grad()
    total_t.backward()
    t_grads = {n: p.grad.numpy() for n, p in tmodel.named_parameters()}
    t_tree = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(t_grads)
    )

    # ---- jax
    xj = jnp.asarray(x)
    mel_l = MelSpectrogramLoss(
        n_mels=MEL_NMELS, window_lengths=MEL_WINDOWS,
        mel_fmin=(0.0,) * len(MEL_WINDOWS),
        mel_fmax=(None,) * len(MEL_WINDOWS),
        pow=1.0, mag_weight=0.0, clamp_eps=1e-5, sample_rate=SR,
    )
    stft_l = MultiScaleSTFTLoss(window_lengths=STFT_WINDOWS)
    l1_l = L1Loss()

    def loss_fn(p):
        out = jmodel.apply(p, xj, SR, level=1.0, train=False)
        rec = out["audio"]
        fmaps_f = jdisc.apply(dparams, rec)
        fmaps_r = jdisc.apply(dparams, xj)
        g, feat = j_gen_loss(fmaps_f, fmaps_r)
        losses = {
            "mel/loss": mel_l(rec, xj),
            "stft/loss": stft_l(rec, xj),
            "waveform/loss": l1_l(rec, xj),
            "adv/gen_loss": g,
            "adv/feat_loss": feat,
            "vq/commitment_loss": out["vq/commitment_loss"],
            "vq/codebook_loss": out["vq/codebook_loss"],
            "vq/rate_loss": jnp.mean(out["imp_map"]),
        }
        return sum(v * losses[k] for k, v in LAMBDAS.items())

    total_j, j_grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(total_j), float(total_t), rtol=1e-4)

    errs = _grad_rel_errors(j_grads, t_tree)
    _assert_close(errs, tol=5e-3)


@pytest.mark.slow
def test_generator_train_mode_grads_match_torch():
    """TRAIN-mode gradient parity: the stochastic branch training actually
    uses — random level sampling, the imp/dropout/full-codebook batch
    partition, quantizer dropout (reference models/quantize.py:375-414).
    Both frameworks' random draws are pinned to identical values by
    monkeypatching the samplers (torch.rand/randint and
    jax.random.uniform/randint), so every mask and level matches and the
    gradients must agree leaf-for-leaf."""
    from dataclasses import replace

    kw = dict(SMALL, quantizer_dropout=0.25, full_codebook_rate=0.25)
    tmodel, jmodel, params = _make_pair(29, **kw)
    jmodel = replace(jmodel, quantizer_dropout=0.25, full_codebook_rate=0.25)
    tmodel.train()

    bs = 4  # partition: 2 imp-masked, 1 random-depth dropout, 1 full
    clips = [_test_audio(0.14, seed=s) for s in (17, 23, 31, 47)]
    x = np.concatenate(clips, axis=0)
    x = x[..., : x.shape[-1] // HOP * HOP]
    xt = torch.tensor(x)
    xj = jnp.asarray(x)

    # Pinned draws: U -> per-clip level in [level_min, level_max];
    # DEPTHS -> the dropout rows' codebook depths.
    U = np.array([0.13, 0.55, 0.92, 0.31], np.float32).reshape(bs, 1, 1)
    DEPTHS = np.array([2, 3, 1, 4], np.int64).reshape(bs, 1, 1)

    real_rand, real_randint = torch.rand, torch.randint

    def fake_rand(*args, **kwargs):
        shape = args[0] if len(args) == 1 and isinstance(args[0], tuple) \
            else tuple(args)
        if shape == (bs, 1, 1):
            return torch.tensor(U)
        return real_rand(*args, **kwargs)

    def fake_randint(low, high, size=None, **kwargs):
        if size == (bs, 1, 1):
            return torch.tensor(DEPTHS)
        return real_randint(low, high, size, **kwargs)

    real_j_uniform, real_j_randint = jax.random.uniform, jax.random.randint

    def fake_j_uniform(key, shape=(), *args, **kwargs):
        # the level draw is the only (bs, 1, 1) uniform in the model; all
        # other call sites (param initializers under flax eval_shape, other
        # samplers) pass through untouched
        if tuple(shape) == (bs, 1, 1):
            dtype = args[0] if args else kwargs.get("dtype", jnp.float32)
            return jnp.asarray(U, dtype)
        return real_j_uniform(key, shape, *args, **kwargs)

    def fake_j_randint(key, shape, *args, **kwargs):
        if tuple(shape)[1:] == (1, 1) and tuple(shape)[0] <= bs:
            return jnp.asarray(DEPTHS[: tuple(shape)[0]])
        return real_j_randint(key, shape, *args, **kwargs)

    torch.rand, torch.randint = fake_rand, fake_randint
    jax.random.uniform, jax.random.randint = fake_j_uniform, fake_j_randint
    try:
        # ---- torch train-mode forward/backward (recon + vq + rate: the
        # discriminator path's parity is covered by the eval-mode test;
        # dropping it here keeps the CPU backward tractable)
        tout = tmodel(xt, SR)
        recons = tout["audio"]
        total_t = (
            15.0 * t_mel_loss(recons, xt)
            + 1.0 * t_multiscale_stft_loss(recons, xt)
            + 10.0 * torch.nn.functional.l1_loss(recons, xt)
            + 0.25 * tout["vq/commitment_loss"]
            + 1.0 * tout["vq/codebook_loss"]
            + 2.0 * tout["imp_map"].mean()
        )
        tmodel.zero_grad()
        total_t.backward()
        t_grads = {
            n: (p.grad.numpy() if p.grad is not None
                else np.zeros(tuple(p.shape), np.float32))
            for n, p in tmodel.named_parameters()
        }
        t_tree = jax.tree_util.tree_map(
            jnp.asarray, convert_torch_state_dict(t_grads)
        )
        # the batch partition keeps 2 imp rows, 1 depth-2 dropout row, 1
        # all-ones row: check the masks really took the train branch
        # (generate_mask_hard: stage i on iff depth >= i, so depth 2 keeps
        # stages 0..2)
        m = tout["mask_imp"].detach().numpy()
        assert (m[3] == 1.0).all()
        assert (m[2][:3] == 1.0).all() and (m[2][3:] == 0.0).all()
        assert tout["imp_map"].shape[0] == 2

        mel_l = MelSpectrogramLoss(
            n_mels=MEL_NMELS, window_lengths=MEL_WINDOWS,
            mel_fmin=(0.0,) * len(MEL_WINDOWS),
            mel_fmax=(None,) * len(MEL_WINDOWS),
            pow=1.0, mag_weight=0.0, clamp_eps=1e-5, sample_rate=SR,
        )
        stft_l = MultiScaleSTFTLoss(window_lengths=STFT_WINDOWS)
        rngs = {"vbr": jax.random.PRNGKey(3),
                "vbr_dropout": jax.random.PRNGKey(4)}

        def loss_fn(p):
            out = jmodel.apply(p, xj, SR, level=None, train=True, rngs=rngs)
            rec = out["audio"]
            return (
                15.0 * mel_l(rec, xj)
                + 1.0 * stft_l(rec, xj)
                + 10.0 * jnp.mean(jnp.abs(rec - xj))
                + 0.25 * out["vq/commitment_loss"]
                + 1.0 * out["vq/codebook_loss"]
                + 2.0 * jnp.mean(out["imp_map"])
            )

        total_j, j_grads = jax.value_and_grad(loss_fn)(params)
    finally:
        torch.rand, torch.randint = real_rand, real_randint
        jax.random.uniform, jax.random.randint = real_j_uniform, real_j_randint

    np.testing.assert_allclose(float(total_j), float(total_t), rtol=1e-4)
    errs = _grad_rel_errors(j_grads, t_tree)
    _assert_close(errs, tol=5e-3)


def test_generator_recon_only_grads_match_torch(gen_pair):
    """Recon + vq losses alone (no discriminator): a tighter-tolerance
    check of the mel/stft/L1 + STE + commitment/codebook gradient paths."""
    tmodel, jmodel, params = gen_pair
    x = _batch()
    xt = torch.tensor(x)

    tout = tmodel(xt, SR, level=1.0)
    recons = tout["audio"]
    total_t = (
        15.0 * t_mel_loss(recons, xt)
        + 1.0 * t_multiscale_stft_loss(recons, xt)
        + 10.0 * torch.nn.functional.l1_loss(recons, xt)
        + 0.25 * tout["vq/commitment_loss"]
        + 1.0 * tout["vq/codebook_loss"]
        + 2.0 * tout["imp_map"].mean()
    )
    tmodel.zero_grad()
    total_t.backward()
    t_grads = {n: p.grad.numpy() for n, p in tmodel.named_parameters()}
    t_tree = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_state_dict(t_grads)
    )

    xj = jnp.asarray(x)
    mel_l = MelSpectrogramLoss(
        n_mels=MEL_NMELS, window_lengths=MEL_WINDOWS,
        mel_fmin=(0.0,) * len(MEL_WINDOWS),
        mel_fmax=(None,) * len(MEL_WINDOWS),
        pow=1.0, mag_weight=0.0, clamp_eps=1e-5, sample_rate=SR,
    )
    stft_l = MultiScaleSTFTLoss(window_lengths=STFT_WINDOWS)

    def loss_fn(p):
        out = jmodel.apply(p, xj, SR, level=1.0, train=False)
        rec = out["audio"]
        return (
            15.0 * mel_l(rec, xj)
            + 1.0 * stft_l(rec, xj)
            + 10.0 * jnp.mean(jnp.abs(rec - xj))
            + 0.25 * out["vq/commitment_loss"]
            + 1.0 * out["vq/codebook_loss"]
            + 2.0 * jnp.mean(out["imp_map"])
        )

    total_j, j_grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(total_j), float(total_t), rtol=1e-4)
    errs = _grad_rel_errors(j_grads, t_tree)
    _assert_close(errs, tol=2e-3)
