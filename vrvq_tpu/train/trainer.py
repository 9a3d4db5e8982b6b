"""Training orchestration: config -> State -> infinite loop with
validation, checkpointing, sample logging.

Reference: scripts/train.py:100-527. TPU-native differences:
  * the data pipeline is a host-side thread pool prefetching collated
    numpy batches while the previous step runs on device (no torch
    DataLoader workers);
  * the train step is one jit program over a ``data`` mesh (DP over ICI),
    resumable via orbax instead of audiotools save_to_folder;
  * dataloader resume = start_idx, identical semantics to the reference's
    resumable sampler (start at step * batch_size).
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from pathlib import Path
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import Signal
from ..config import Config
from ..data.loaders import AudioDataset, AudioLoader, ConcatDataset
from ..data.transforms import apply_on_host, build_transform
from ..losses import L1Loss, MelSpectrogramLoss, MultiScaleSTFTLoss
from ..models import DAC_VRVQ, Discriminator
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils import PhaseTimer
from . import checkpoint as ckpt
from .loop import init_train_state, make_train_step, make_val_step
from .state import TrainState, make_optimizer
from .tracker import Tracker


@dataclasses.dataclass
class State:
    """Reference: scripts/train.py:117-135."""

    generator: DAC_VRVQ
    discriminator: Discriminator
    train_state: TrainState
    train_step: Callable
    val_step: Callable
    stft_loss: MultiScaleSTFTLoss
    mel_loss: MelSpectrogramLoss
    waveform_loss: L1Loss
    train_data: Any
    val_data: Any
    tracker: Tracker
    mesh: Any
    # augmentation runs on the host CPU backend by default (TPU input
    # pipelines feed the device ready batches; set transforms_on_host:
    # false in the config to dispatch the chain on the accelerator)
    transforms_on_host: bool = True


def build_dataset(cfg: Config, sample_rate: int, scope: str):
    """Reference: scripts/train.py:100-114."""
    with cfg.scope(scope):
        folders = cfg.get("build_dataset.folders", {}) or {}
        datasets = []
        transform = build_transform(
            augment_prob=cfg.get("build_transform.augment_prob", 1.0),
            preprocess=cfg.get("build_transform.preprocess"),
            augment=cfg.get("build_transform.augment"),
            postprocess=cfg.get("build_transform.postprocess"),
            cfg=cfg,
        )
        for _, sources in folders.items():
            loader = AudioLoader(sources=sources, **cfg.kwargs("AudioLoader"))
            dataset = AudioDataset(
                loader, sample_rate, transform=transform,
                **cfg.kwargs("AudioDataset"),
            )
            datasets.append(dataset)
        dataset = ConcatDataset(datasets) if len(datasets) != 1 else datasets[0]
        dataset.transform = transform
        return dataset


def _batch_iterator(
    dataset,
    batch_size: int,
    start_idx: int = 0,
    num_workers: int = 4,
    prefetch: int = 2,
    prepare: Optional[Callable[[Dict], Any]] = None,
    local_slice: Optional[Tuple[int, int]] = None,
) -> Iterator[Dict]:
    """Infinite prefetching batch iterator (deterministic by global idx —
    the reference's resumable sampler equivalent).

    ``prepare`` runs in the producer thread on each collated batch and its
    result is stored under ``batch["prepared_audio"]`` — the trainer uses
    it to apply the (host-side) transform chain OVERLAPPED with the device
    step instead of serially in the train loop.

    ``local_slice=(lo, hi)``: multi-host data sharding — ``batch_size``
    stays the GLOBAL batch (the step/idx arithmetic every process agrees
    on, so resume is host-count-independent), but this process only loads
    and collates rows [lo, hi) of each global batch. The equivalent of
    the reference's per-rank distributed sampler
    (audiotools Accelerator, scripts/train.py:452-467)."""
    from concurrent.futures import ThreadPoolExecutor

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    pool = ThreadPoolExecutor(max_workers=max(1, num_workers))

    def producer():
        idx = start_idx
        try:
            while True:
                indices = [
                    (idx + i) % max(len(dataset), 1) for i in range(batch_size)
                ]
                if local_slice is not None:
                    indices = indices[local_slice[0]: local_slice[1]]
                items = list(pool.map(dataset.__getitem__, indices))
                batch = dataset.collate(items)
                if prepare is not None:
                    batch["prepared_audio"] = prepare(batch)
                q.put(batch)
                idx += batch_size
        except BaseException as e:  # re-raise in the consumer, don't hang it
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        batch = q.get()
        if isinstance(batch, BaseException):
            raise batch
        yield batch


def _data_mesh_size(batch_size: int, n_devices: int, n_proc: int) -> int:
    """Device count for the data mesh.

    Single-process: the largest device count dividing the batch (the
    reference's DDP likewise requires batch % world_size == 0).

    Multihost: shard_batch assembles global batches from per-process
    shards, which requires every process to own the same number of mesh
    devices — a devices[:n] subset mesh mixes per-process device counts
    and make_array_from_process_local_data rejects it ("non-uniform
    sharding"), so ALL devices must be used and the global batch must
    divide over them.
    """
    if n_proc > 1:
        if batch_size % n_devices:
            raise ValueError(
                f"multihost training requires batch_size ({batch_size}) "
                f"divisible by the global device count ({n_devices})"
            )
        return n_devices
    n = n_devices
    while n > 1 and batch_size % n != 0:
        n -= 1
    return n


def load(
    cfg: Config,
    tracker: Tracker,
    save_path: str,
    resume: bool = False,
    tag: str = "latest",
    mesh=None,
) -> State:
    """Build (or resume) everything (reference: scripts/train.py:138-229)."""
    generator = DAC_VRVQ(**cfg.kwargs("DAC_VRVQ"))
    discriminator = Discriminator(**cfg.kwargs("Discriminator"))

    adamw = cfg.kwargs("AdamW")
    explr = cfg.kwargs("ExponentialLR")
    opt_kw = dict(
        lr=adamw.get("lr", 1e-4),
        betas=tuple(adamw.get("betas", (0.8, 0.99))),
        gamma=explr.get("gamma", 1.0),
        warmup=explr.get("warmup", 0),
    )
    opt_g = make_optimizer(max_grad_norm=1e3, **opt_kw)
    opt_d = make_optimizer(max_grad_norm=10.0, **opt_kw)

    waveform_loss = L1Loss()
    stft_loss = MultiScaleSTFTLoss(**cfg.kwargs("MultiScaleSTFTLoss"))
    mel_kwargs = cfg.kwargs("MelSpectrogramLoss")
    mel_kwargs.setdefault("sample_rate", generator.sample_rate)
    mel_loss = MelSpectrogramLoss(**mel_kwargs)

    lambdas = cfg.get("lambdas", {})
    remat = bool(cfg.get("remat", False))
    accum = int(cfg.get("grad_accum_steps", 1))
    split = bool(cfg.get("split_train_step", False))
    loss_args = (lambdas, stft_loss, mel_loss, waveform_loss)
    if accum > 1:
        # effective batch = batch_size, HBM footprint = batch_size / accum
        # (the reference's batch-64 regime on one chip; loop.py docstring)
        from .loop import make_accum_train_step

        steps = make_accum_train_step(
            generator, discriminator, opt_g, opt_d, *loss_args,
            accum_steps=accum, remat=remat, split=split,
        )
    elif split:
        # two jit programs (disc, gen): halves peak compile memory for the
        # full-size model at the cost of one extra generator forward
        from .loop import make_split_train_steps

        steps = make_split_train_steps(
            generator, discriminator, opt_g, opt_d, *loss_args, remat=remat,
        )
    else:
        steps = make_train_step(
            generator, discriminator, opt_g, opt_d, *loss_args, remat=remat,
        )
    if split:
        d_jit = jax.jit(steps[0], donate_argnums=(0,))
        g_jit = jax.jit(steps[1], donate_argnums=(0,))

        def train_step(state, audio, rng):
            state, m_d = d_jit(state, audio, rng)
            state, m_g = g_jit(state, audio, rng)
            m_g.update(m_d)
            return state, m_g
    else:
        train_step = jax.jit(steps, donate_argnums=(0,))
    val_step = make_val_step(generator, stft_loss, mel_loss, waveform_loss)

    hop = generator.hop_length
    sample = jnp.zeros(
        (1, 1, int(np.ceil(0.38 * generator.sample_rate / hop) * hop)),
        jnp.float32,
    )
    tracker.print(
        f"Initializing params on {jax.devices()[0].platform} "
        f"({len(jax.devices())} device(s))..."
    )
    train_state = init_train_state(
        generator, discriminator, opt_g, opt_d, sample,
        seed=cfg.get("seed", 0),
    )
    tracker.print("Params initialized.")
    if resume:
        tracker.print(f"Resuming from {save_path}/{tag}")
        train_state = ckpt.load_checkpoint(save_path, train_state, tag)
        meta = ckpt.load_metadata(save_path, tag)
        tracker.load_state_dict(meta.get("tracker", {"step": int(train_state.step)}))
        tracker.step = int(train_state.step)

    if mesh is None:
        mesh = make_mesh(_data_mesh_size(
            cfg.get("batch_size", 12), len(jax.devices()),
            jax.process_count(),
        ))
    if mesh.devices.size > 1:
        train_state = replicate(train_state, mesh)
    # single-device: leave state/batches unannotated so the jit programs are
    # byte-identical to the plain (bench/inference) ones and hit the
    # persistent compilation cache — sharding-annotated HLO caches separately

    train_data = build_dataset(cfg, generator.sample_rate, "train")
    val_data = build_dataset(cfg, generator.sample_rate, "val")
    tracker.print(
        f"Datasets ready: train={len(train_data)} val={len(val_data)}; "
        f"mesh={tuple(mesh.devices.shape)}"
    )

    return State(
        generator=generator,
        discriminator=discriminator,
        train_state=train_state,
        train_step=train_step,
        val_step=jax.jit(val_step),
        stft_loss=stft_loss,
        mel_loss=mel_loss,
        waveform_loss=waveform_loss,
        train_data=train_data,
        val_data=val_data,
        tracker=tracker,
        mesh=mesh,
        transforms_on_host=bool(cfg.get("transforms_on_host", True)),
    )


def _apply_transform(state: State, dataset, batch: Dict):
    """The trainer-side transform application: host CPU backend by
    default, device-side when ``transforms_on_host: false``."""
    signal = batch["signal"]
    args = batch.get("transform_args", {})
    if state.transforms_on_host:
        return apply_on_host(dataset.transform, signal, args)
    return dataset.transform(signal, **args)


def _prepare_signal(state: State, batch: Dict) -> jnp.ndarray:
    """Apply the train transform to a collated batch -> (B, 1, T) array
    (reference: scripts/train.py:272-277, transform under no_grad).
    When the prefetch producer already applied it (host-side transforms,
    ``prepared_audio``), just pick up the result."""
    if "prepared_audio" in batch:
        transformed = batch["prepared_audio"]
    else:
        transformed = _apply_transform(state, state.train_data, batch)
    # NOTE: the clip is fed at its native length — the model pads to a hop
    # multiple in-graph and trims the recon back, so the losses compare the
    # true clip exactly like the reference. Pre-padding here would leak the
    # zero tail into the losses/discriminator (a parity break) for a cache
    # win; if you want train steps to share compiled programs with bench,
    # choose a hop-multiple train duration in the config instead.
    audio = jnp.asarray(
        transformed.audio_data if isinstance(transformed, Signal) else transformed
    )
    if state.mesh.devices.size > 1:
        audio = shard_batch(audio, state.mesh)
    return audio


def validate(state: State, batch_size: int,
             num_batches: Optional[int] = None) -> Dict:
    """Run the val loop over the FULL val set (the reference iterates the
    whole val dataloader, scripts/train.py:407-415, and 'best' checkpoint
    selection rides on this mean); ``num_batches`` can cap it for smoke
    tests."""
    results = []
    n = len(state.val_data)
    if num_batches is not None:
        n = min(n, batch_size * num_batches)
    n_proc = jax.process_count()
    rank = jax.process_index()
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        sharded = (state.mesh.devices.size > 1
                   and len(idxs) % state.mesh.devices.size == 0)
        if sharded and n_proc > 1:
            # multihost: each process loads/collates only ITS rows of the
            # global batch — shard_batch assembles the global array from
            # the per-process shards (same contract as the train loader)
            per = len(idxs) // n_proc
            idxs = idxs[rank * per:(rank + 1) * per]
        items = [state.val_data[i] for i in idxs]
        batch = state.val_data.collate(items)
        transformed = _apply_transform(state, state.val_data, batch)
        audio = jnp.asarray(
            transformed.audio_data if isinstance(transformed, Signal)
            else transformed
        )
        # data-parallel validation when the batch divides the mesh
        # (ragged final batches just run replicated)
        if sharded:
            audio = shard_batch(audio, state.mesh)
        # one batched host transfer per val step (each individual float()
        # would pay its own ~26 ms tunnel round-trip)
        out = jax.device_get(state.val_step(state.train_state.gen_params, audio))
        results.append({k: float(v) for k, v in out.items()})
        state.tracker.log_metrics("val", results[-1])
    return state.tracker.done("val", f"Iteration {state.tracker.step}")


def save_samples(state: State, val_idx: List[int], writer) -> None:
    """Audio + importance-map images to TensorBoard
    (reference: scripts/train.py:369-404).

    Under jax.distributed this must run on EVERY process even though only
    rank 0 has a writer: the params live replicated on the global mesh,
    so the forward is a multi-controller launch all ranks must join
    (same reason checkpoint saves are collective, train/checkpoint.py).
    """
    multiproc = jax.process_count() > 1
    if not val_idx or (writer is None and not multiproc):
        return
    items = [state.val_data[i] for i in val_idx]
    batch = state.val_data.collate(items)
    signal = batch["signal"]
    audio = jnp.asarray(signal.audio_data)
    out = state.generator.apply(
        state.train_state.gen_params, audio, level=1.0
    )
    if writer is None:  # non-zero rank: joined the launch, nothing to write
        return
    recons = np.asarray(out["audio"])
    sr = state.generator.sample_rate
    try:
        for nb in range(recons.shape[0]):
            if state.tracker.step == 0:
                writer.add_audio(f"signal/sample_{nb}.wav",
                                 np.asarray(audio)[nb, 0],
                                 state.tracker.step, sr)
            writer.add_audio(f"recons/sample_{nb}.wav", recons[nb, 0],
                             state.tracker.step, sr)
    except (ImportError, ModuleNotFoundError):
        # tensorboardX add_audio needs soundfile; fall back to wav artifacts
        out_dir = Path(writer.logdir) / "samples"
        out_dir.mkdir(parents=True, exist_ok=True)
        from ..data.audio_io import write_wav

        for nb in range(recons.shape[0]):
            write_wav(out_dir / f"recons_{state.tracker.step}_{nb}.wav",
                      recons[nb], sr)
    mask_imp = out.get("mask_imp")
    if mask_imp is not None:
        mask = np.asarray(mask_imp) * 0.7
        for nb in range(mask.shape[0]):
            writer.add_image(f"imp_map/sample_{nb}", mask[nb][None],
                             state.tracker.step)


def train(cfg: Config, save_path: str = "ckpt") -> str:
    """Main loop (reference: scripts/train.py:418-527)."""
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        SummaryWriter = None

    rank = jax.process_index()
    # Clobber guard: a fresh (non-resume) run pointed at a directory that
    # already holds trained checkpoints would silently overwrite them at
    # its first save (this destroyed a 4000-step run once: the new run's
    # step-1 init checkpoint replaced 'latest'). Demand an explicit
    # decision: resume, a fresh save_path, or overwrite_ok: true.
    # Key on EITHER meta.json or the state tree: save_checkpoint writes
    # meta.json after the state dir, so a run killed mid-first-save can
    # leave state without meta — that partial save still must not be
    # silently clobbered by the next fresh run.
    _latest = Path(save_path) / "latest"
    if (not cfg.get("resume", False) and not cfg.get("overwrite_ok", False)
            and ((_latest / "meta.json").exists()
                 or (_latest / "state").exists())):
        raise FileExistsError(
            f"{save_path!r} already contains checkpoints; set resume: true "
            "to continue that run, overwrite_ok: true to discard it, or "
            "pick a fresh --save_path"
        )
    Path(save_path).mkdir(exist_ok=True, parents=True)
    writer = (
        SummaryWriter(logdir=f"{save_path}/logs")
        if (SummaryWriter and rank == 0) else None
    )
    tracker = Tracker(writer=writer, log_file=f"{save_path}/log.txt", rank=rank)

    state = load(
        cfg, tracker, save_path,
        resume=cfg.get("resume", False), tag=cfg.get("tag", "latest"),
    )

    batch_size = cfg.get("batch_size", 12)
    val_batch_size = cfg.get("val_batch_size", 10)
    num_iters = cfg.get("num_iters", 250000)
    save_iters = cfg.get("save_iters", []) or []
    sample_freq = cfg.get("sample_freq", 10000)
    valid_freq = cfg.get("valid_freq", 1000)
    val_idx = cfg.get("val_idx", [0, 1, 2, 3, 4, 5, 6, 7])
    num_workers = cfg.get("num_workers", 8)

    prepare = None
    if state.transforms_on_host:
        # apply the (host-side) transform chain in the producer thread,
        # overlapped with the device step
        def prepare(batch):
            t = _apply_transform(state, state.train_data, batch)
            return np.asarray(
                t.audio_data if isinstance(t, Signal) else t
            )

    local_slice = None
    n_proc = jax.process_count()
    if n_proc > 1:
        # multi-host: this process loads rows [rank*per, (rank+1)*per) of
        # every global batch; shard_batch assembles the global array from
        # the per-process shards (parallel/mesh.py)
        if batch_size % n_proc:
            raise ValueError(
                f"batch_size {batch_size} must divide over "
                f"{n_proc} processes"
            )
        per = batch_size // n_proc
        local_slice = (rank * per, (rank + 1) * per)

    loader = _batch_iterator(
        state.train_data, batch_size,
        start_idx=tracker.step * batch_size, num_workers=num_workers,
        prepare=prepare, local_slice=local_slice,
    )

    # Per-step key derived from (seed, step) — not split sequentially from
    # the run start — so a resumed run replays the exact key stream of an
    # uninterrupted one (bit-exact resume; tests/test_trainer_integration).
    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    first = True
    timer = PhaseTimer()
    for step, batch in enumerate(loader, start=tracker.step):
        tracker.step = step
        if first:
            tracker.print("Compiling + running first train step "
                          "(full-size remote compiles can take minutes)...")
            first = False
        timer.mark("data")
        audio = _prepare_signal(state, batch)
        sub = jax.random.fold_in(rng, step)
        timer.mark("h2d")
        state.train_state, metrics = state.train_step(
            state.train_state, audio, sub
        )
        timer.mark("dispatch")
        tracker.log_metrics("train", metrics)
        timer.mark("log")
        if step % tracker.log_every == 0 and step > 0:
            tracker.print(f"[timing] step {step}: {timer.report()}")

        last_iter = step == num_iters - 1
        if step % sample_freq == 0 or last_iter:
            # every rank joins (multi-controller forward); only rank 0's
            # writer emits artifacts — see save_samples
            save_samples(state, val_idx, writer)
            timer.mark("samples")
        if step % valid_freq == 0 or last_iter:
            validate(state, val_batch_size)
            # deterministic on every rank (same val metrics); orbax saves
            # are collective under jax.distributed, so all ranks join —
            # process 0 does the actual writing (train/checkpoint.py)
            tags = ckpt.checkpoint_tags(
                step, save_iters, tracker.is_best("val", "mel/loss")
            )
            tracker.print(f"Saving to {save_path} tags={tags}")
            ckpt.save_checkpoint(
                state.train_state, save_path, tags,
                metadata={"tracker": tracker.state_dict()},
            )
            # charge the val+checkpoint tail to its own phase — otherwise
            # the NEXT iteration's "data" mark absorbs it and the timing
            # report misdiagnoses the input pipeline
            timer.mark("val+ckpt")
        if last_iter:
            break
    return save_path
