"""Mesh / sharding tests on 8 virtual CPU devices."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vrvq_tpu.parallel.mesh import (
    batch_sharding, local_batch_size, make_mesh, replicate, shard_batch,
    zero_shard_opt_state,
)


def test_make_mesh_8():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_layout():
    mesh = make_mesh(8)
    x = jnp.zeros((16, 1, 100))
    xs = shard_batch(x, mesh)
    # each device holds 2 batch rows
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 1, 100)}


def test_local_batch_size():
    mesh = make_mesh(8)
    assert local_batch_size(64, mesh) == 8
    with pytest.raises(AssertionError):
        local_batch_size(10, mesh)


@pytest.mark.slow
def test_zero_sharded_opt_state_train_step():
    """Train step still runs (and syncs) with Adam state sharded over the
    mesh — the ZeroRedundancyOptimizer equivalent."""
    from vrvq_tpu.models import DAC_VRVQ, Discriminator
    from vrvq_tpu.losses import L1Loss, MultiScaleSTFTLoss, MelSpectrogramLoss
    from vrvq_tpu.train.state import make_optimizer
    from vrvq_tpu.train.loop import make_train_step, init_train_state

    gen = DAC_VRVQ(
        encoder_dim=8, decoder_dim=64, n_codebooks=2, codebook_size=16,
        codebook_dim=4, model_type="VBR", level_min=0.125, level_max=6.0,
        full_codebook_rate=0.25,
    )
    disc = Discriminator(periods=(2,), fft_sizes=(512,), rates=())
    opt_g = make_optimizer(max_grad_norm=1e3)
    opt_d = make_optimizer(max_grad_norm=10.0)
    mel = MelSpectrogramLoss(n_mels=(40,), window_lengths=(512,),
                             mel_fmin=(0,), mel_fmax=(None,), pow=1.0,
                             mag_weight=0.0, sample_rate=44100)
    step = make_train_step(
        gen, disc, opt_g, opt_d,
        {"mel/loss": 15.0, "vq/commitment_loss": 0.25,
         "vq/codebook_loss": 1.0, "vq/rate_loss": 2.0,
         "adv/gen_loss": 1.0, "adv/feat_loss": 2.0},
        MultiScaleSTFTLoss(window_lengths=(512,)), mel, L1Loss(),
    )

    mesh = make_mesh(8)
    state = init_train_state(gen, disc, opt_g, opt_d, jnp.zeros((1, 1, 2048)))
    state = replicate(state, mesh)
    state = state.replace(
        opt_g=zero_shard_opt_state(state.opt_g, mesh),
        opt_d=zero_shard_opt_state(state.opt_d, mesh),
    )
    # the pre-step state must actually hold ZeRO-sharded Adam moments
    def data_sharded_leaves(tree):
        return [
            l for l in jax.tree_util.tree_leaves(tree)
            if hasattr(l, "sharding")
            and l.sharding.spec == jax.sharding.PartitionSpec("data")
        ]

    pre_sharded = data_sharded_leaves(state.opt_g)
    assert len(pre_sharded) > 0, "zero_shard_opt_state sharded nothing"
    for leaf in pre_sharded:
        shard_shapes = {s.data.shape[0] for s in leaf.addressable_shards}
        assert shard_shapes == {leaf.shape[0] // 8}, (
            "moment leaf not evenly distributed over the mesh"
        )

    rng = np.random.RandomState(0)
    audio = shard_batch(
        jnp.asarray(rng.randn(8, 1, 2048).astype(np.float32) * 0.1), mesh
    )
    # preserve the input placement across the update (the production
    # pattern: opt state stays distributed step over step)
    state_shardings = jax.tree_util.tree_map(lambda x: x.sharding, state)
    step_j = jax.jit(step, out_shardings=(state_shardings, None))
    new_state, metrics = step_j(state, audio, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    post_sharded = data_sharded_leaves(new_state.opt_g)
    assert len(post_sharded) == len(pre_sharded), (
        "Adam moment leaves lost their ZeRO sharding across the update"
    )
    # and the moments actually changed (the update really ran distributed)
    mu_pre = pre_sharded[0]
    mu_post = post_sharded[0]
    assert mu_pre.shape == mu_post.shape
    assert not np.allclose(np.asarray(mu_pre), np.asarray(mu_post))


def _tiny_model():
    from vrvq_tpu.models import DAC_VRVQ

    return DAC_VRVQ(
        encoder_dim=8, decoder_dim=64, n_codebooks=2, codebook_size=16,
        codebook_dim=4, model_type="VBR", level_min=0.125, level_max=6.0,
    )


def test_weak_scaling_sharded_eval_flops():
    """Weak-scaling evidence for data-parallel eval (SURVEY §2 parallelism
    table): at a FIXED per-device batch, the compiled sharded program's
    per-device FLOPs (what XLA's cost_analysis reports after SPMD
    partitioning) must stay CONSTANT as the mesh grows — no superlinear
    collective/overhead term. This box exposes 8 fake devices on one
    physical core, so wall-clock is meaningless here; XLA's cost analysis
    of the actual partitioned executable is the deterministic stand-in
    (real-chip throughput is bench.py's job)."""
    from vrvq_tpu.models import DAC_VRVQ

    m = _tiny_model()
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, jnp.zeros((1, 1, 2048)), level=1.0)
    enc = jax.jit(
        lambda p, a: m.apply(p, a, level=1.0, method=DAC_VRVQ.encode)
    )

    per_device = 2
    flops = {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        params_n = replicate(params, mesh)
        audio = shard_batch(
            jnp.zeros((per_device * n, 1, 2048), jnp.float32), mesh
        )
        cost = enc.lower(params_n, audio).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops[n] = float(cost["flops"])
        # the program must actually execute sharded, shards on every device
        out = enc(params_n, audio)
        assert len(out["codes"].addressable_shards) == n
        shapes = {s.data.shape for s in out["codes"].addressable_shards}
        assert shapes == {(per_device, 2, 4)}, shapes

    # weak scaling: per-device work constant as devices scale with load
    for n in (2, 4, 8):
        ratio = flops[n] / flops[1]
        assert 0.9 <= ratio <= 1.15, (
            f"mesh {n}: per-device flops ratio {ratio:.2f} not ~1 "
            f"(per-device work is not constant)"
        )

    # strong-scaling converse: FIXED global batch of 8 rows — per-device
    # FLOPs must fall ~1/n as the mesh absorbs the same total work
    strong = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        params_n = replicate(params, mesh)
        audio = shard_batch(jnp.zeros((8, 1, 2048), jnp.float32), mesh)
        cost = enc.lower(params_n, audio).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        strong[n] = float(cost["flops"])
    ratio = strong[1] / strong[8]
    assert 8 * 0.85 <= ratio <= 8 * 1.2, (
        f"strong scaling: per-device flops only fell {ratio:.2f}x "
        f"going 1->8 devices at fixed global batch (expected ~8x)"
    )


def test_weak_scaling_stream_pool_mesh():
    """StreamPool over a mesh: as stream count scales with mesh size, the
    batched serving encode keeps per-device rows constant (the batch pads
    to a mesh multiple and shards over the data axis) and codes stay
    identical to the single-device pool's."""
    from vrvq_tpu.infer.codec_api import CodecProcessor
    from vrvq_tpu.infer.streaming import StreamPool

    m = _tiny_model()
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, jnp.zeros((1, 1, 4096)), level=1.0)
    rng = np.random.RandomState(0)
    secs = 0.8
    clips = [rng.randn(int(secs * 44100)).astype(np.float32) * 0.1
             for _ in range(8)]

    def run(n_devices, n_streams):
        mesh = make_mesh(n_devices) if n_devices > 1 else None
        proc = CodecProcessor(m, params, mesh=mesh)
        pool = StreamPool(proc, win_duration=0.7, level=1.0, max_batch=8)
        for i in range(n_streams):
            pool.add_stream(i)
        got = {}
        block = 44100 // 4
        for off in range(0, int(secs * 44100), block):
            for i in range(n_streams):
                pool.push(i, clips[i][off: off + block])
            for sid, codes, counts in pool.poll():
                got.setdefault(sid, []).append(np.asarray(codes))
        for i in range(n_streams):
            pool.flush(i)
        for sid, codes, counts in pool.poll():
            got.setdefault(sid, []).append(np.asarray(codes))
        return {k: np.concatenate(v, axis=-1) for k, v in got.items()}

    base = run(1, 2)
    for n in (2, 4, 8):
        out = run(n, n)  # streams scale with devices: weak scaling
        for sid in range(2):
            np.testing.assert_array_equal(out[sid], base[sid])


def test_sharded_batched_eval():
    """Multi-chip data-parallel inference: encode a sharded batch over the
    mesh (BASELINE config #5: 'data-parallel eval sharded over multi-chip
    ICI')."""
    import jax.numpy as jnp
    from vrvq_tpu.models import DAC_VRVQ

    m = DAC_VRVQ(
        encoder_dim=8, decoder_dim=64, n_codebooks=2, codebook_size=16,
        codebook_dim=4, model_type="VBR", level_min=0.125, level_max=6.0,
    )
    rngs = {"params": jax.random.PRNGKey(0), "vbr": jax.random.PRNGKey(1),
            "vbr_dropout": jax.random.PRNGKey(2)}
    params = m.init(rngs, jnp.zeros((1, 1, 2048)), level=1.0)

    mesh = make_mesh(8)
    params_r = replicate(params, mesh)
    rng = np.random.RandomState(0)
    audio = shard_batch(
        jnp.asarray(rng.randn(16, 1, 2048).astype(np.float32) * 0.1), mesh
    )
    enc = jax.jit(
        lambda p, a: m.apply(p, a, level=1.0, method=DAC_VRVQ.encode)
    )
    out = enc(params_r, audio)
    assert out["codes"].shape == (16, 2, 4)
    # per-device shards hold 2 batch rows each
    shapes = {s.data.shape for s in out["codes"].addressable_shards}
    assert shapes == {(2, 2, 4)}
