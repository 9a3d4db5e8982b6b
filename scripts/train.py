"""Train CLI: ``python scripts/train.py --args.load conf/vrvq/vrvq_a2.yml``.

Reference: scripts/train.py:530-537 + scripts/script_train.sh. Multi-host
TPU launch uses ``--coordinator/--num_processes/--process_id`` (the
torchrun/MASTER_ADDR equivalent); single-host multi-chip needs no flags —
the ``data`` mesh picks up every local device.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

# honor an explicit JAX_PLATFORMS even when a sitecustomize pre-registered
# another platform (e.g. this container's remote-TPU plugin)
if os.environ.get("JAX_PLATFORMS") not in (None, "", "axon"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from vrvq_tpu.config import parse_args
from vrvq_tpu.parallel.mesh import initialize_multihost
from vrvq_tpu.train.trainer import train
from vrvq_tpu.utils import enable_compilation_cache

enable_compilation_cache()

if __name__ == "__main__":
    cfg = parse_args(base_dir=Path(__file__).resolve().parents[1])
    if cfg.get("coordinator"):
        initialize_multihost(
            coordinator_address=cfg.get("coordinator"),
            num_processes=cfg.get("num_processes"),
            process_id=cfg.get("process_id"),
        )
    save_path = cfg.get("save_path", "ckpt")
    train(cfg, save_path=save_path)
