"""The jit'd GAN train/val steps.

Reference: scripts/train.py:231-335. One XLA program per step:

  1. generator forward (train mode, explicit PRNG keys for level sampling
     and quantizer dropout);
  2. discriminator update on (stop_grad(recons), real) with grad-clip 10.0;
  3. generator losses (multi-scale STFT/mel, waveform L1, LSGAN adv +
     feature matching, VQ commitment/codebook, rate = mean(imp_map))
     against the *updated* discriminator — same ordering as the reference;
  4. generator update with grad-clip 1e3.

The generator forward appears twice textually (once for the disc step, once
inside the generator grad) with identical params/inputs/rngs, so XLA CSEs
them into one computation. bf16 mixed precision replaces the reference's
AMP GradScaler (TPU bf16 needs no loss scaling).

Multi-chip: the caller jit's this with the batch sharded over the ``data``
mesh axis and params replicated; XLA inserts the gradient psums over ICI.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..losses.gan import discriminator_loss, generator_loss
from .state import TrainState


def _make_gen_forward(generator, remat: bool):
    """Train-mode generator forward with explicit level/dropout rngs;
    ``remat`` wraps it in jax.checkpoint. Shared by every step factory."""

    def gen_forward(gen_params, audio, rng):
        rng_vbr, rng_drop = jax.random.split(rng)

        def apply(p, a):
            return generator.apply(
                p, a, train=True,
                rngs={"vbr": rng_vbr, "vbr_dropout": rng_drop},
            )

        if remat:
            apply = jax.checkpoint(apply)
        return apply(gen_params, audio)

    return gen_forward


def _make_g_loss(gen_forward, discriminator, lambdas,
                 stft_loss, mel_loss, waveform_loss):
    """The generator loss body (reference scripts/train.py:300-330),
    shared verbatim by the fused, split, and accumulated step factories so
    a reweighted or added loss term cannot silently diverge between them.

    Returns ``g_loss(gen_params, disc_params, audio, rng) ->
    (total, losses)`` for use under ``jax.value_and_grad(has_aux=True)``.
    """

    def g_loss(gen_params, disc_params, audio, rng):
        g_out = gen_forward(gen_params, audio, rng)
        g_recons = g_out["audio"]
        losses: Dict[str, jnp.ndarray] = {}
        losses["stft/loss"] = stft_loss(g_recons, audio)
        losses["mel/loss"] = mel_loss(g_recons, audio)
        losses["waveform/loss"] = waveform_loss(g_recons, audio)
        f_fake = discriminator.apply(disc_params, g_recons)
        f_real = discriminator.apply(disc_params, audio)
        adv_g, adv_feat = generator_loss(f_fake, f_real)
        losses["adv/gen_loss"] = adv_g
        losses["adv/feat_loss"] = adv_feat
        losses["vq/commitment_loss"] = g_out["vq/commitment_loss"]
        losses["vq/codebook_loss"] = g_out["vq/codebook_loss"]
        if g_out["imp_map"] is not None:
            losses["vq/rate_loss"] = jnp.mean(g_out["imp_map"])
        total = sum(
            weight * losses[key]
            for key, weight in lambdas.items()
            if key in losses
        )
        losses["loss"] = total
        return total, losses

    return g_loss


def _make_d_loss(discriminator):
    """LSGAN discriminator loss on (already stop-gradiented) recons."""

    def d_loss(disc_params, recons, audio):
        f_fake = discriminator.apply(disc_params, recons)
        f_real = discriminator.apply(disc_params, audio)
        return discriminator_loss(f_fake, f_real)

    return d_loss


def make_train_step(
    generator,
    discriminator,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    lambdas: Dict[str, float],
    stft_loss,
    mel_loss,
    waveform_loss,
    remat: bool = False,
) -> Callable:
    """Build the jit-able train step closure over static modules/losses.

    ``remat=True`` rematerializes the generator forward in the backward
    pass (jax.checkpoint) — trades ~1 extra forward of FLOPs for not
    keeping the 54M-param decoder's activations alive, letting much larger
    train batches fit in HBM.
    """

    gen_forward = _make_gen_forward(generator, remat)
    g_loss = _make_g_loss(gen_forward, discriminator, lambdas,
                          stft_loss, mel_loss, waveform_loss)
    d_loss_of = _make_d_loss(discriminator)

    def train_step(state: TrainState, audio: jnp.ndarray, rng: jax.Array):
        """audio: (B, 1, T) already transformed. Returns (state, metrics)."""
        output: Dict[str, jnp.ndarray] = {}

        # ---- 1. generator forward (shared; CSE'd with the grad pass)
        out = gen_forward(state.gen_params, audio, rng)
        recons = out["audio"]

        # ---- 2. discriminator update (reference: train.py:287-297)
        def d_loss_fn(disc_params):
            return d_loss_of(
                disc_params, jax.lax.stop_gradient(recons), audio
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        output["adv/disc_loss"] = d_loss
        output["other/grad_norm_d"] = optax.global_norm(d_grads)
        d_updates, new_opt_d = opt_d.update(
            d_grads, state.opt_d, state.disc_params
        )
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)

        # ---- 3+4. generator losses vs updated disc, then update
        # (reference: train.py:300-330)
        (g_total, g_losses), g_grads = jax.value_and_grad(
            lambda p: g_loss(p, new_disc_params, audio, rng), has_aux=True
        )(state.gen_params)
        output.update(g_losses)
        output["other/grad_norm_g"] = optax.global_norm(g_grads)
        g_updates, new_opt_g = opt_g.update(
            g_grads, state.opt_g, state.gen_params
        )
        new_gen_params = optax.apply_updates(state.gen_params, g_updates)

        new_state = TrainState(
            step=state.step + 1,
            gen_params=new_gen_params,
            disc_params=new_disc_params,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
        )
        output["other/batch_size"] = jnp.asarray(audio.shape[0], jnp.float32)
        return new_state, {k: v for k, v in sorted(output.items())}

    return train_step


def make_split_train_steps(
    generator,
    discriminator,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    lambdas: Dict[str, float],
    stft_loss,
    mel_loss,
    waveform_loss,
    remat: bool = False,
):
    """The same update as ``make_train_step`` split into two jit programs
    (disc step, then gen step) — mirroring the reference's two separate
    backwards (scripts/train.py:287-330) and roughly halving peak
    compile-time memory for the full-size model. Costs one extra generator
    forward per step vs the fused variant (no cross-program CSE).

    Returns (d_step, g_step):
      d_step(state, audio, rng)  -> (state, metrics)
      g_step(state, audio, rng)  -> (state, metrics)
    Call with the SAME rng so both see the same level/dropout draws.
    """

    gen_forward = _make_gen_forward(generator, remat)
    g_loss = _make_g_loss(gen_forward, discriminator, lambdas,
                          stft_loss, mel_loss, waveform_loss)
    d_loss_of = _make_d_loss(discriminator)

    def d_step(state: TrainState, audio, rng):
        out = gen_forward(state.gen_params, audio, rng)
        recons = jax.lax.stop_gradient(out["audio"])

        d_loss, d_grads = jax.value_and_grad(
            lambda dp: d_loss_of(dp, recons, audio)
        )(state.disc_params)
        d_updates, new_opt_d = opt_d.update(
            d_grads, state.opt_d, state.disc_params
        )
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)
        metrics = {
            "adv/disc_loss": d_loss,
            "other/grad_norm_d": optax.global_norm(d_grads),
        }
        return state.replace(disc_params=new_disc_params, opt_d=new_opt_d), metrics

    def g_step(state: TrainState, audio, rng):
        (_, g_losses), g_grads = jax.value_and_grad(
            lambda p: g_loss(p, state.disc_params, audio, rng),
            has_aux=True,
        )(state.gen_params)
        g_updates, new_opt_g = opt_g.update(
            g_grads, state.opt_g, state.gen_params
        )
        new_gen_params = optax.apply_updates(state.gen_params, g_updates)
        g_losses["other/grad_norm_g"] = optax.global_norm(g_grads)
        return (
            state.replace(
                gen_params=new_gen_params, opt_g=new_opt_g,
                step=state.step + 1,
            ),
            g_losses,
        )

    return d_step, g_step


def make_accum_train_step(
    generator,
    discriminator,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    lambdas: Dict[str, float],
    stft_loss,
    mel_loss,
    waveform_loss,
    accum_steps: int,
    remat: bool = False,
    split: bool = False,
):
    """Gradient-accumulated GAN step: effective batch = ``accum_steps`` ×
    the micro-batch that fits in HBM.

    The reference reaches batch 64 by DDP over ≤8 GPUs
    (conf/training.yml:2, scripts/main.sh:3); one TPU chip comfortably fits
    a 16×0.38 s micro-batch, so the same effective batch comes from
    ``lax.scan``-ing ``accum_steps`` micro-batches and applying ONE
    optimizer update on the mean gradient. Update ordering matches the
    reference (scripts/train.py:287-330): one discriminator update from
    the mean disc-gradient over every micro-batch, then one generator
    update against the *updated* discriminator. Each micro-batch draws its
    own level/dropout rng (iid per-sample draws — exactly what one large
    batch would do). Since every loss is a batch mean, the mean of
    micro-gradients equals the full-batch gradient, so grad clipping and
    AdamW see the same statistics as a genuine large batch.

    lax.scan keeps peak activation memory at micro-batch scale; only the
    accumulated gradient pytree (~330 MB f32 for the 82M generator)
    persists across scan iterations.

    ``split=True`` returns ``(d_step, g_step)`` like
    :func:`make_split_train_steps` (same call protocol: same rng to both).
    """
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    gen_forward = _make_gen_forward(generator, remat)
    g_loss = _make_g_loss(gen_forward, discriminator, lambdas,
                          stft_loss, mel_loss, waveform_loss)
    d_loss_of = _make_d_loss(discriminator)

    def _micro_split(audio, rng):
        b = audio.shape[0]
        if b % accum_steps:
            raise ValueError(
                f"batch {b} is not divisible by grad_accum_steps="
                f"{accum_steps}"
            )
        micro = audio.reshape(accum_steps, b // accum_steps, *audio.shape[1:])
        return micro, jax.random.split(rng, accum_steps)

    def _disc_phase(gen_params, disc_params, micro, rngs):
        """Mean discriminator gradient over all micro-batches."""

        def body(acc, xs):
            audio_i, rng_i = xs
            out = gen_forward(gen_params, audio_i, rng_i)
            recons = jax.lax.stop_gradient(out["audio"])
            loss, grads = jax.value_and_grad(
                lambda dp: d_loss_of(dp, recons, audio_i)
            )(disc_params)
            return jax.tree_util.tree_map(jnp.add, acc, grads), loss

        zeros = jax.tree_util.tree_map(jnp.zeros_like, disc_params)
        acc, losses = jax.lax.scan(body, zeros, (micro, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, acc)
        return grads, jnp.mean(losses)

    def _gen_phase(gen_params, disc_params, micro, rngs):
        """Mean generator gradient (vs a fixed discriminator) + mean losses."""

        def body(acc, xs):
            audio_i, rng_i = xs
            (_, losses), grads = jax.value_and_grad(
                lambda p: g_loss(p, disc_params, audio_i, rng_i),
                has_aux=True,
            )(gen_params)
            return jax.tree_util.tree_map(jnp.add, acc, grads), losses

        zeros = jax.tree_util.tree_map(jnp.zeros_like, gen_params)
        acc, losses = jax.lax.scan(body, zeros, (micro, rngs))
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, acc)
        return grads, jax.tree_util.tree_map(jnp.mean, losses)

    def d_step(state: TrainState, audio, rng):
        micro, rngs = _micro_split(audio, rng)
        d_grads, d_loss = _disc_phase(
            state.gen_params, state.disc_params, micro, rngs
        )
        d_updates, new_opt_d = opt_d.update(
            d_grads, state.opt_d, state.disc_params
        )
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)
        metrics = {
            "adv/disc_loss": d_loss,
            "other/grad_norm_d": optax.global_norm(d_grads),
        }
        return (
            state.replace(disc_params=new_disc_params, opt_d=new_opt_d),
            metrics,
        )

    def g_step(state: TrainState, audio, rng):
        micro, rngs = _micro_split(audio, rng)
        g_grads, g_losses = _gen_phase(
            state.gen_params, state.disc_params, micro, rngs
        )
        g_updates, new_opt_g = opt_g.update(
            g_grads, state.opt_g, state.gen_params
        )
        new_gen_params = optax.apply_updates(state.gen_params, g_updates)
        g_losses["other/grad_norm_g"] = optax.global_norm(g_grads)
        return (
            state.replace(
                gen_params=new_gen_params, opt_g=new_opt_g,
                step=state.step + 1,
            ),
            g_losses,
        )

    if split:
        return d_step, g_step

    def train_step(state: TrainState, audio, rng):
        new_state, m_d = d_step(state, audio, rng)
        new_state, output = g_step(new_state, audio, rng)
        output.update(m_d)
        output["other/batch_size"] = jnp.asarray(audio.shape[0], jnp.float32)
        return new_state, {k: v for k, v in sorted(output.items())}

    return train_step


def make_val_step(generator, stft_loss, mel_loss, waveform_loss) -> Callable:
    """Eval-mode forward + losses (reference: scripts/train.py:231-259)."""

    def val_step(gen_params, audio: jnp.ndarray):
        out = generator.apply(gen_params, audio, level=1.0)
        recons = out["audio"]
        mel = mel_loss(recons, audio)
        result = {
            "loss": mel,
            "mel/loss": mel,
            "stft/loss": stft_loss(recons, audio),
            "waveform/loss": waveform_loss(recons, audio),
        }
        if out["imp_map"] is not None:
            result["vq/rate_loss"] = jnp.mean(out["imp_map"])
        return result

    return val_step


def init_train_state(
    generator,
    discriminator,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    sample_audio: jnp.ndarray,
    seed: int = 0,
) -> TrainState:
    """Initialize all params + optimizer states from a sample batch.

    The whole init runs under one jit: eager flax init dispatches every
    layer's ops separately, which costs minutes through a remote-TPU
    tunnel (~26 ms/dispatch) where a single compiled program takes seconds.
    """
    def _init(key):
        k_gen, k_disc, k_vbr, k_drop = jax.random.split(key, 4)
        gen_params = generator.init(
            {"params": k_gen, "vbr": k_vbr, "vbr_dropout": k_drop},
            sample_audio, level=1.0,
        )
        disc_params = discriminator.init(k_disc, sample_audio)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            disc_params=disc_params,
            opt_g=opt_g.init(gen_params),
            opt_d=opt_d.init(disc_params),
        )

    return jax.jit(_init)(jax.random.PRNGKey(seed))
