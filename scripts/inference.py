"""VBR inference CLI: level sweep over examples from a data dir.

Reference: scripts/inference.py:26-122. Usage:
    python scripts/inference.py --args.load conf/vrvq/vrvq_a2.yml \
        --ckpt_dir ckpt --tag latest --data_dir /path/wavs \
        --save_result_dir results
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("JAX_PLATFORMS") not in (None, "", "axon"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

from vrvq_tpu.config import parse_args
from vrvq_tpu.data.loaders import AudioLoader
from vrvq_tpu.infer.sweep import DEFAULT_LEVELS, save_results
from vrvq_tpu.models import DAC_VRVQ
from vrvq_tpu.train import checkpoint as ckpt
from vrvq_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def inference(cfg):
    model = DAC_VRVQ(**cfg.kwargs("DAC_VRVQ"))

    params = ckpt.load_gen_params(cfg, model)

    if cfg.get("fast", True):
        # fold weight norm + bf16 decode: codes stay bit-exact (f32 encode);
        # decode agreement vs f32 is far above codec SI-SDR (BASELINE.md)
        from vrvq_tpu.infer.fast import make_inference_model

        model, params = make_inference_model(model, params)

    loader = AudioLoader(sources=[cfg.get("data_dir")], shuffle=False)
    num_examples = cfg.get("num_examples", 30)
    levels = cfg.get("levels", DEFAULT_LEVELS)
    out_dir = cfg.get("save_result_dir", "results")

    for idx in range(min(num_examples, len(loader.audio_indices))):
        state = np.random.RandomState(idx)
        item = loader(
            state=state,
            sample_rate=model.sample_rate,
            duration=cfg.get("duration", 10),
            num_channels=1,
        )
        signal = item["signal"]
        save_results(model, params, signal.audio_data, levels, out_dir)
        print("Saved results for", idx)


if __name__ == "__main__":
    cfg = parse_args(base_dir=Path(__file__).resolve().parents[1])
    inference(cfg)
