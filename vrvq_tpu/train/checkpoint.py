"""Checkpointing: tagged orbax saves + torch-checkpoint conversion.

Reference: scripts/train.py:338-366 — tags ``latest`` always, ``best`` on
val mel-loss improvement, ``{N}k`` at save_iters milestones; resume reloads
params + both optimizer states + tracker state (scripts/train.py:138-201).

Layout on disk:
    {save_path}/{tag}/state/   — orbax checkpoint of the TrainState pytree
    {save_path}/{tag}/meta.json — step, tracker history, config snapshot
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _sync(name: str) -> None:
    """Cross-process barrier (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def save_checkpoint(
    state: TrainState,
    save_path: str | Path,
    tags: List[str],
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    """Tagged checkpoint write.

    Under ``jax.distributed`` orbax saves are COLLECTIVE (internal commit
    barriers) — every process must call this, unlike torch's rank-0-only
    ``save_to_folder`` (reference scripts/train.py:349-366). Filesystem
    prep and meta.json stay on process 0.
    """
    save_path = Path(save_path).resolve()
    rank = jax.process_index()
    checkpointer = ocp.StandardCheckpointer()
    state = jax.device_get(state)
    first_state_dir = None
    for tag in tags:
        tag_dir = save_path / tag
        state_dir = tag_dir / "state"
        if rank == 0:
            if state_dir.exists():
                shutil.rmtree(state_dir)
            tag_dir.mkdir(parents=True, exist_ok=True)
        _sync(f"ckpt_prep_{tag}")
        if first_state_dir is None:
            checkpointer.save(state_dir, state)
            checkpointer.wait_until_finished()
            first_state_dir = state_dir
        elif rank == 0:
            # Identical bytes for every further tag (a flagship state is
            # ~1.5 GB; 'latest'+'best' used to serialize it twice) —
            # hardlink-copy the finished tree instead. Safe against later
            # overwrites: rewriting a tag rmtree's it and creates fresh
            # inodes, so sibling tags keep the old data.
            try:
                shutil.copytree(first_state_dir, state_dir,
                                copy_function=os.link)
            except OSError:
                # Hardlinks unavailable (network/FUSE mounts, cross-device
                # save paths raise EXDEV/EPERM) — fall back to real copies
                # rather than failing the whole checkpoint write.
                shutil.rmtree(state_dir, ignore_errors=True)
                shutil.copytree(first_state_dir, state_dir)
        if rank == 0:
            meta = {"step": int(state.step)}
            meta.update(metadata or {})
            with open(tag_dir / "meta.json", "w") as f:
                json.dump(meta, f, indent=2, default=str)
        _sync(f"ckpt_done_{tag}")


def load_checkpoint(
    save_path: str | Path,
    abstract_state: TrainState,
    tag: str = "latest",
) -> TrainState:
    save_path = Path(save_path).resolve()
    checkpointer = ocp.StandardCheckpointer()
    target = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, abstract_state
    )
    return checkpointer.restore(save_path / tag / "state", target)


def load_metadata(save_path: str | Path, tag: str = "latest") -> Dict[str, Any]:
    with open(Path(save_path) / tag / "meta.json") as f:
        return json.load(f)


def checkpoint_tags(step: int, save_iters: List[int], is_best: bool) -> List[str]:
    """Which tags to write at this step (reference: scripts/train.py:341-347)."""
    tags = ["latest"]
    if is_best:
        tags.append("best")
    if step in save_iters:
        tags.append(f"{step // 1000}k")
    return tags


# ------------------------------------------------------- torch conversion
def _child_indices(keys, prefix: str) -> List[int]:
    """Sorted distinct integer child indices under ``prefix.`` in a flat
    torch state_dict key set (e.g. prefix='encoder.block' -> [0,1,...])."""
    import re

    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.")
    found = {int(m.group(1)) for k in keys for m in [pat.match(k)] if m}
    return sorted(found)


def convert_torch_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    n_codebooks: Optional[int] = None,
    model_type: Optional[str] = None,
) -> Dict[str, Any]:
    """Map a reference DAC_VRVQ torch ``state_dict`` onto our param pytree.

    The topology (number of encoder/decoder blocks, residual units per
    block, codebooks, importance-subnet depth) is inferred from the
    state_dict keys themselves, so non-default configs (e.g. 3 strides or
    28 codebooks) convert correctly. ``n_codebooks``/``model_type`` are
    accepted for backward compatibility and validated against the
    inferred structure.

    Key mapping (torch layout -> ours):
      * Conv1d ``weight_v`` (out, in, k) -> ``v`` (k, in, out);
        ``weight_g`` (out, 1, 1) -> ``g`` (out,)
      * ConvTranspose1d ``weight_v`` (in, out, k) stays (in, out, k)
      * quantizer ``in_proj/out_proj`` k=1 convs -> WNDense1x1 ``v`` (in, out)
      * codebook ``codebook.weight`` -> ``codebook``

    Accepts numpy arrays (call ``.numpy()`` on torch tensors first).
    Structure references: models/dac_vrvq.py:19-80 (Encoder/Decoder
    Sequentials), models/quantize.py (quantizers ModuleList),
    models/importance_subnet.py:18-34 (in_block + blocks).
    """
    keys = set(state_dict)
    params: Dict[str, Any] = {}

    def put(path: List[str], leaf):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(leaf)

    def conv(path, prefix, transpose=False, dense=False):
        v = state_dict[f"{prefix}.weight_v"]
        g = state_dict[f"{prefix}.weight_g"]
        b = state_dict.get(f"{prefix}.bias")
        if dense:
            # (out, in, 1) -> (in, out)
            put(path + ["v"], np.asarray(v)[:, :, 0].T)
        elif transpose:
            put(path + ["v"], v)  # (in, out, k) stays
        else:
            put(path + ["v"], np.transpose(np.asarray(v), (2, 1, 0)))
        put(path + ["g"], np.asarray(g).reshape(-1))
        if b is not None:
            put(path + ["bias"], b)

    def snake(path, prefix):
        put(path + ["alpha"], np.asarray(state_dict[f"{prefix}.alpha"]).reshape(-1))

    def res_unit(path, prefix):
        snake(path + ["snake1"], f"{prefix}.block.0")
        conv(path + ["conv1"], f"{prefix}.block.1")
        snake(path + ["snake2"], f"{prefix}.block.2")
        conv(path + ["conv2"], f"{prefix}.block.3")

    def is_res_unit(prefix: str) -> bool:
        return f"{prefix}.block.0.alpha" in keys

    # ---- encoder (reference models/dac_vrvq.py:19-48: Sequential
    # [in_conv, EncoderBlock x n_strides, Snake, out_conv])
    enc_blocks = [
        i for i in _child_indices(keys, "encoder.block")
        if _child_indices(keys, f"encoder.block.{i}.block")
    ]
    conv(["encoder", "in_conv"], "encoder.block.0")
    for n, i in enumerate(enc_blocks):
        blk = f"encoder.block.{i}.block"
        base = ["encoder", f"block_{n}"]
        res = [j for j in _child_indices(keys, blk) if is_res_unit(f"{blk}.{j}")]
        for n_r, j in enumerate(res):
            res_unit(base + [f"res{n_r}"], f"{blk}.{j}")
        snake(base + ["snake"], f"{blk}.{len(res)}")
        conv(base + ["down"], f"{blk}.{len(res) + 1}")
    snake(["encoder", "snake"], f"encoder.block.{len(enc_blocks) + 1}")
    conv(["encoder", "out_conv"], f"encoder.block.{len(enc_blocks) + 2}")

    # ---- quantizer (models/quantize.py: ModuleList of VectorQuantize)
    cb = _child_indices(keys, "quantizer.quantizers")
    if n_codebooks is not None and len(cb) != n_codebooks:
        raise ValueError(
            f"state_dict has {len(cb)} codebooks, caller said {n_codebooks}"
        )
    for i in cb:
        q = f"quantizer.quantizers.{i}"
        base = ["quantizer", f"quantizers_{i}"]
        conv(base + ["in_proj"], f"{q}.in_proj", dense=True)
        conv(base + ["out_proj"], f"{q}.out_proj", dense=True)
        put(base + ["codebook"], state_dict[f"{q}.codebook.weight"])

    # ---- MOE router (DAC_MOE: per-frame Linear over feat_enc,
    # reference models/dac_moe.py:50,96-99; torch Linear weight
    # (nq, in) -> flax Dense kernel (in, nq))
    moe = "quantizer.router.weight" in keys
    if moe:
        put(["quantizer", "router", "kernel"],
            np.asarray(state_dict["quantizer.router.weight"]).T)
        if "quantizer.router.bias" in keys:
            put(["quantizer", "router", "bias"],
                state_dict["quantizer.router.bias"])

    # ---- importance subnet (VBR only; models/importance_subnet.py:18-34)
    vbr = any(k.startswith("quantizer.imp_subnet.") for k in keys)
    if model_type is not None and not moe and (model_type == "VBR") != vbr:
        raise ValueError(
            f"caller said model_type={model_type} but imp_subnet keys "
            f"{'present' if vbr else 'absent'}"
        )
    if vbr:
        imp = "quantizer.imp_subnet"
        base = ["quantizer", "imp_subnet"]
        snake(base + ["in_snake"], f"{imp}.in_block.0")
        conv(base + ["in_conv"], f"{imp}.in_block.1")
        for i in _child_indices(keys, f"{imp}.blocks"):
            snake(base + [f"snake_{i}"], f"{imp}.blocks.{i}.0")
            conv(base + [f"conv_{i}"], f"{imp}.blocks.{i}.1")

    # ---- decoder (Sequential [in_conv, DecoderBlock x n_rates, Snake,
    # out_conv, Tanh]; models/dac_vrvq.py:51-80)
    dec_blocks = [
        i for i in _child_indices(keys, "decoder.model")
        if _child_indices(keys, f"decoder.model.{i}.block")
    ]
    conv(["decoder", "in_conv"], "decoder.model.0")
    for n, i in enumerate(dec_blocks):
        blk = f"decoder.model.{i}.block"
        base = ["decoder", f"block_{n}"]
        snake(base + ["snake"], f"{blk}.0")
        conv(base + ["up"], f"{blk}.1", transpose=True)
        res = [j for j in _child_indices(keys, blk) if is_res_unit(f"{blk}.{j}")]
        for n_r, j in enumerate(res):
            res_unit(base + [f"res{n_r}"], f"{blk}.{j}")
    snake(["decoder", "snake"], f"decoder.model.{len(dec_blocks) + 1}")
    conv(["decoder", "out_conv"], f"decoder.model.{len(dec_blocks) + 2}")

    return {"params": params}


def export_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_state_dict`: our DAC_VRVQ param
    pytree -> a reference-layout torch ``state_dict`` (numpy leaves), so
    models trained here can be loaded by the PyTorch reference
    (``model.load_state_dict`` after ``torch.tensor``-wrapping, layout of
    models/dac_vrvq.py:19-80 + models/quantize.py + importance_subnet.py).

    Topology is read off the pytree (block_*/res*/quantizers_*/imp_subnet
    presence), so any encoder/decoder rate count and subnet depth exports.
    Round-trips bit-exactly through convert_torch_state_dict (tested).
    Folded fast-inference params (nn/fold.py, leaves named ``w``) carry no
    weight-norm split and cannot be exported — export the live params.
    """
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}

    def conv(prefix, node, transpose=False, dense=False):
        if "v" not in node:
            raise ValueError(
                f"{prefix}: no weight-norm 'v' leaf (folded fast-inference "
                "params cannot be exported; use the live training params)"
            )
        v = np.asarray(node["v"])
        g = np.asarray(node["g"])
        if dense:
            sd[f"{prefix}.weight_v"] = v.T[:, :, None]     # (in,out)->(out,in,1)
        elif transpose:
            sd[f"{prefix}.weight_v"] = v                   # (in,out,k) stays
        else:
            sd[f"{prefix}.weight_v"] = np.transpose(v, (2, 1, 0))
        sd[f"{prefix}.weight_g"] = g.reshape(-1, 1, 1)
        if "bias" in node:
            sd[f"{prefix}.bias"] = np.asarray(node["bias"])

    def snake(prefix, node):
        sd[f"{prefix}.alpha"] = np.asarray(node["alpha"]).reshape(1, -1, 1)

    def res_unit(prefix, node):
        snake(f"{prefix}.block.0", node["snake1"])
        conv(f"{prefix}.block.1", node["conv1"])
        snake(f"{prefix}.block.2", node["snake2"])
        conv(f"{prefix}.block.3", node["conv2"])

    def child_ids(node, prefix):
        return sorted(
            int(k[len(prefix):]) for k in node if k.startswith(prefix)
        )

    enc = p["encoder"]
    conv("encoder.block.0", enc["in_conv"])
    enc_blocks = child_ids(enc, "block_")
    for n in enc_blocks:
        node = enc[f"block_{n}"]
        blk = f"encoder.block.{n + 1}.block"
        res = child_ids(node, "res")
        for r in res:
            res_unit(f"{blk}.{r}", node[f"res{r}"])
        snake(f"{blk}.{len(res)}", node["snake"])
        conv(f"{blk}.{len(res) + 1}", node["down"])
    snake(f"encoder.block.{len(enc_blocks) + 1}", enc["snake"])
    conv(f"encoder.block.{len(enc_blocks) + 2}", enc["out_conv"])

    q = p["quantizer"]
    for i in child_ids(q, "quantizers_"):
        node = q[f"quantizers_{i}"]
        base = f"quantizer.quantizers.{i}"
        conv(f"{base}.in_proj", node["in_proj"], dense=True)
        conv(f"{base}.out_proj", node["out_proj"], dense=True)
        sd[f"{base}.codebook.weight"] = np.asarray(node["codebook"])
    if "imp_subnet" in q:
        node = q["imp_subnet"]
        snake("quantizer.imp_subnet.in_block.0", node["in_snake"])
        conv("quantizer.imp_subnet.in_block.1", node["in_conv"])
        for i in child_ids(node, "snake_"):
            snake(f"quantizer.imp_subnet.blocks.{i}.0", node[f"snake_{i}"])
            conv(f"quantizer.imp_subnet.blocks.{i}.1", node[f"conv_{i}"])
    if "router" in q:  # DAC_MOE: flax Dense kernel (in, nq) -> Linear (nq, in)
        sd["quantizer.router.weight"] = np.asarray(q["router"]["kernel"]).T
        if "bias" in q["router"]:
            sd["quantizer.router.bias"] = np.asarray(q["router"]["bias"])

    dec = p["decoder"]
    conv("decoder.model.0", dec["in_conv"])
    dec_blocks = child_ids(dec, "block_")
    for n in dec_blocks:
        node = dec[f"block_{n}"]
        blk = f"decoder.model.{n + 1}.block"
        snake(f"{blk}.0", node["snake"])
        conv(f"{blk}.1", node["up"], transpose=True)
        for r in child_ids(node, "res"):
            res_unit(f"{blk}.{r + 2}", node[f"res{r}"])
    snake(f"decoder.model.{len(dec_blocks) + 1}", dec["snake"])
    conv(f"decoder.model.{len(dec_blocks) + 2}", dec["out_conv"])
    return sd


def convert_torch_discriminator_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    periods: List[int] = (2, 3, 5, 7, 11),
    rates: List[int] = (),
    fft_sizes: List[int] = (2048, 1024, 512),
) -> Dict[str, Any]:
    """Map a reference ``Discriminator`` torch ``state_dict`` onto our
    discriminator param pytree (models/discriminator.py here vs reference
    models/discriminator.py:178-208: ModuleList ordered MPD(periods) +
    MSD(rates) + MRD(fft_sizes)).

    The period/rate/fft values name our submodules (``mpd_2`` etc.) and
    cannot be inferred from tensor shapes, so they are passed explicitly
    (they are config, ``Discriminator.periods/rates/fft_sizes``).

    Layout mapping:
      * Conv1d ``weight_v`` (out, in/groups, k) -> (k, in/groups, out)
      * Conv2d ``weight_v`` (out, in, kh, kw) -> (kh, kw, in, out)
      * ``weight_g`` -> (out,)

    Purely structural (transposes/reshapes only), so it maps gradients the
    same way it maps weights — tests/test_parity_grads.py relies on that.
    """
    params: Dict[str, Any] = {}

    def conv(dst: Dict[str, Any], prefix: str):
        v = np.asarray(state_dict[f"{prefix}.weight_v"])
        if v.ndim == 4:
            dst["v"] = np.transpose(v, (2, 3, 1, 0))
        else:
            dst["v"] = np.transpose(v, (2, 1, 0))
        dst["g"] = np.asarray(state_dict[f"{prefix}.weight_g"]).reshape(-1)
        b = state_dict.get(f"{prefix}.bias")
        if b is not None:
            dst["bias"] = np.asarray(b)

    idx = 0
    for p in periods:  # MPD: convs.{j} are Sequential(conv, leaky)
        node: Dict[str, Any] = {}
        for j in range(5):
            node[f"conv_{j}"] = {}
            conv(node[f"conv_{j}"], f"discriminators.{idx}.convs.{j}.0")
        node["conv_post"] = {}
        conv(node["conv_post"], f"discriminators.{idx}.conv_post")
        params[f"mpd_{p}"] = node
        idx += 1
    for r in rates:  # MSD
        node = {}
        for j in range(6):
            node[f"conv_{j}"] = {}
            conv(node[f"conv_{j}"], f"discriminators.{idx}.convs.{j}.0")
        node["conv_post"] = {}
        conv(node["conv_post"], f"discriminators.{idx}.conv_post")
        params[f"msd_{r}"] = node
        idx += 1
    for f in fft_sizes:  # MRD: band_convs.{b}.{j} Sequentials
        node = {}
        b = 0
        while f"discriminators.{idx}.band_convs.{b}.0.0.weight_v" in state_dict:
            for j in range(5):
                node[f"band_{b}_conv_{j}"] = {}
                conv(node[f"band_{b}_conv_{j}"],
                     f"discriminators.{idx}.band_convs.{b}.{j}.0")
            b += 1
        node["conv_post"] = {}
        conv(node["conv_post"], f"discriminators.{idx}.conv_post")
        params[f"mrd_{f}"] = node
        idx += 1
    return {"params": params}


def export_torch_discriminator_state_dict(
    params: Dict[str, Any],
    periods: List[int] = (2, 3, 5, 7, 11),
    rates: List[int] = (),
    fft_sizes: List[int] = (2048, 1024, 512),
) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_discriminator_state_dict`, so a GAN
    training run here can be resumed by the PyTorch reference (including
    the discriminator, not just the generator)."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}

    def conv(prefix: str, node: Dict[str, Any]):
        v = np.asarray(node["v"])
        if v.ndim == 4:
            sd[f"{prefix}.weight_v"] = np.transpose(v, (3, 2, 0, 1))
            sd[f"{prefix}.weight_g"] = np.asarray(node["g"]).reshape(-1, 1, 1, 1)
        else:
            sd[f"{prefix}.weight_v"] = np.transpose(v, (2, 1, 0))
            sd[f"{prefix}.weight_g"] = np.asarray(node["g"]).reshape(-1, 1, 1)
        if "bias" in node:
            sd[f"{prefix}.bias"] = np.asarray(node["bias"])

    idx = 0
    for per in periods:
        node = p[f"mpd_{per}"]
        for j in range(5):
            conv(f"discriminators.{idx}.convs.{j}.0", node[f"conv_{j}"])
        conv(f"discriminators.{idx}.conv_post", node["conv_post"])
        idx += 1
    for r in rates:
        node = p[f"msd_{r}"]
        for j in range(6):
            conv(f"discriminators.{idx}.convs.{j}.0", node[f"conv_{j}"])
        conv(f"discriminators.{idx}.conv_post", node["conv_post"])
        idx += 1
    for f in fft_sizes:
        node = p[f"mrd_{f}"]
        bands = sorted({
            int(k.split("_")[1]) for k in node if k.startswith("band_")
        })
        for b in bands:
            for j in range(5):
                conv(f"discriminators.{idx}.band_convs.{b}.{j}.0",
                     node[f"band_{b}_conv_{j}"])
        conv(f"discriminators.{idx}.conv_post", node["conv_post"])
        idx += 1
    return sd


def save_torch_checkpoint(params: Dict[str, Any], path) -> None:
    """Write a reference-loadable ``weights.pth`` (``{"state_dict": ...}``
    of torch tensors, the layout scripts/inference.py:44-48 loads)."""
    import torch

    sd = {k: torch.tensor(v) for k, v in export_torch_state_dict(params).items()}
    torch.save({"state_dict": sd}, path)


def load_torch_checkpoint(path, n_codebooks: Optional[int] = None,
                          model_type: Optional[str] = None):
    """Load a reference ``weights.pth`` and convert to our pytree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_torch_state_dict(sd, n_codebooks, model_type)


def load_gen_params(cfg, model):
    """Generator params for an inference CLI: torch checkpoint, tagged
    orbax checkpoint (``ckpt_path``/``ckpt_dir`` + ``tag``), or fresh
    random init. One shared recipe so scripts/inference.py and
    scripts/stream_demo.py cannot drift (the abstract TrainState must use
    the same optimizer chain the trainer built)."""
    import jax.numpy as jnp

    torch_ckpt = cfg.get("torch_ckpt")
    if torch_ckpt:
        return load_torch_checkpoint(
            torch_ckpt, model.n_codebooks, model.model_type
        )
    rngs = {
        "params": jax.random.PRNGKey(0),
        "vbr": jax.random.PRNGKey(1),
        "vbr_dropout": jax.random.PRNGKey(2),
    }
    sample = jnp.zeros((1, 1, 512))
    params = model.init(rngs, sample, level=1.0)
    base = cfg.get("ckpt_path") or cfg.get("ckpt_dir")
    if base:
        from ..models import Discriminator
        from .loop import init_train_state
        from .state import make_optimizer

        disc = Discriminator(**cfg.kwargs("Discriminator"))
        abstract = init_train_state(
            model, disc, make_optimizer(max_grad_norm=1e3),
            make_optimizer(max_grad_norm=10.0), sample,
        )
        params = load_checkpoint(
            base, abstract, cfg.get("tag", "latest")
        ).gen_params
    return params
