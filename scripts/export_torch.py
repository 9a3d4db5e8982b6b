"""Export a trained checkpoint to the reference's torch layout.

Writes a ``weights.pth`` (``{"state_dict": ...}``) that the PyTorch
reference loads with ``load_state_dict`` (scripts/inference.py:44-48),
so models trained in this framework run in the reference ecosystem.

Usage:
    python scripts/export_torch.py --args.load conf/vrvq/vrvq_a2.yml \
        --ckpt_dir ckpt --tag latest --out weights.pth
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("JAX_PLATFORMS") not in (None, "", "axon"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from vrvq_tpu.config import parse_args
from vrvq_tpu.models import DAC_VRVQ
from vrvq_tpu.train import checkpoint as ckpt


def export(cfg):
    model = DAC_VRVQ(**cfg.kwargs("DAC_VRVQ"))
    params = ckpt.load_gen_params(cfg, model)
    out = cfg.get("out", "weights.pth")
    ckpt.save_torch_checkpoint(params, out)
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    export(parse_args())
