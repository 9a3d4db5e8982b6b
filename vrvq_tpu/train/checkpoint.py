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
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def save_checkpoint(
    state: TrainState,
    save_path: str | Path,
    tags: List[str],
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    save_path = Path(save_path).resolve()
    checkpointer = ocp.StandardCheckpointer()
    state = jax.device_get(state)
    for tag in tags:
        tag_dir = save_path / tag
        state_dir = tag_dir / "state"
        if state_dir.exists():
            shutil.rmtree(state_dir)
        tag_dir.mkdir(parents=True, exist_ok=True)
        checkpointer.save(state_dir, state)
        checkpointer.wait_until_finished()
        meta = {"step": int(state.step)}
        meta.update(metadata or {})
        with open(tag_dir / "meta.json", "w") as f:
            json.dump(meta, f, indent=2, default=str)


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
def convert_torch_state_dict(
    state_dict: Dict[str, "np.ndarray"],
    n_codebooks: int,
    model_type: str = "VBR",
) -> Dict[str, Any]:
    """Map a reference DAC_VRVQ torch ``state_dict`` onto our param pytree.

    Key mapping (torch layout -> ours):
      * Conv1d ``weight_v`` (out, in, k) -> ``v`` (k, in, out);
        ``weight_g`` (out, 1, 1) -> ``g`` (out,)
      * ConvTranspose1d ``weight_v`` (in, out, k) stays (in, out, k)
      * quantizer ``in_proj/out_proj`` k=1 convs -> WNDense1x1 ``v`` (in, out)
      * codebook ``codebook.weight`` -> ``codebook``

    Accepts numpy arrays (call ``.numpy()`` on torch tensors first).
    """
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

    # ---- encoder (reference models/dac_vrvq.py:19-48: Sequential
    # [in_conv, EncoderBlock x4, Snake, out_conv])
    conv(["encoder", "in_conv"], "encoder.block.0")
    for i in range(4):
        blk = f"encoder.block.{i + 1}.block"
        base = ["encoder", f"block_{i}"]
        for j in range(3):
            res_unit(base + [f"res{j}"], f"{blk}.{j}")
        snake(base + ["snake"], f"{blk}.3")
        conv(base + ["down"], f"{blk}.4")
    snake(["encoder", "snake"], "encoder.block.5")
    conv(["encoder", "out_conv"], "encoder.block.6")

    # ---- quantizer
    for i in range(n_codebooks):
        q = f"quantizer.quantizers.{i}"
        base = ["quantizer", f"quantizers_{i}"]
        conv(base + ["in_proj"], f"{q}.in_proj", dense=True)
        conv(base + ["out_proj"], f"{q}.out_proj", dense=True)
        put(base + ["codebook"], state_dict[f"{q}.codebook.weight"])

    if model_type == "VBR":
        imp = "quantizer.imp_subnet"
        base = ["quantizer", "imp_subnet"]
        snake(base + ["in_snake"], f"{imp}.in_block.0")
        conv(base + ["in_conv"], f"{imp}.in_block.1")
        for i in range(5):
            snake(base + [f"snake_{i}"], f"{imp}.blocks.{i}.0")
            conv(base + [f"conv_{i}"], f"{imp}.blocks.{i}.1")

    # ---- decoder (Sequential [in_conv, DecoderBlock x4, Snake, out_conv, Tanh])
    conv(["decoder", "in_conv"], "decoder.model.0")
    for i in range(4):
        blk = f"decoder.model.{i + 1}.block"
        base = ["decoder", f"block_{i}"]
        snake(base + ["snake"], f"{blk}.0")
        conv(base + ["up"], f"{blk}.1", transpose=True)
        for j in range(3):
            res_unit(base + [f"res{j}"], f"{blk}.{j + 2}")
    snake(["decoder", "snake"], "decoder.model.5")
    conv(["decoder", "out_conv"], "decoder.model.6")

    return {"params": params}


def load_torch_checkpoint(path, n_codebooks: int, model_type: str = "VBR"):
    """Load a reference ``weights.pth`` and convert to our pytree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_torch_state_dict(sd, n_codebooks, model_type)
