"""VBR inference: encode once, re-mask + decode per level.

Reference: scripts/inference.py:73-122 — the canonical VBR API: one encode
pass produces per-stage ``z_q_is`` + the importance map; each target level
rescales the map, hard-masks the stages, sums, and decodes. Encode and
decode are separate jit programs so the level sweep reuses the encoder
work (12 decoder invocations per utterance by default).
"""

from __future__ import annotations

import json
import math
import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import Signal
from ..metrics import cal_bpf_from_mask, si_sdr
from ..ops.masks import generate_mask_hard

DEFAULT_LEVELS = [0.2, 0.3, 0.4, 0.5, 0.6, 0.8, 1, 1.2, 1.5, 2, 2.5, 3]


class LevelSweep:
    """Jit-compiled encode-once / decode-per-level runner.

    ``fast=True`` decodes through the fused Pallas ResidualUnit decoder
    (ops/residual_kernel.py) — numerically equivalent to the module path to
    f32 tolerance; the sweep runs the decoder 12x per utterance so this is
    where the kernel pays off.
    """

    def __init__(self, model, params, fast: bool = False):
        self.model = model
        self.params = params
        self._encode = jax.jit(
            lambda p, a: model.apply(p, a, level=1.0, method=type(model).encode)
        )
        if fast:
            from ..ops.residual_kernel import fast_decoder_apply

            rates = tuple(model.decoder_rates)
            channels = model.decoder_dim

            def _dec(p, z):
                audio = fast_decoder_apply(
                    p["params"]["decoder"], z.transpose(0, 2, 1),
                    rates=rates, channels=channels,
                )
                return audio.transpose(0, 2, 1)

            self._decode = jax.jit(_dec)
        else:
            self._decode = jax.jit(
                lambda p, z: model.apply(p, z, method=type(model).decode)
            )

    def encode(self, audio: jnp.ndarray) -> Dict:
        """audio (B, 1, T) already padded to a hop multiple."""
        return self._encode(self.params, audio)

    def decode_at_level(self, enc: Dict, level: float):
        """Returns (recon audio (B,1,T), mask (B,Nq,T))."""
        n_q = self.model.n_codebooks
        imp_scaled = enc["imp_map"] * (level * n_q)
        mask = generate_mask_hard(imp_scaled, n_q)
        z_q = jnp.sum(enc["z_q_is"] * mask[:, :, None, :], axis=1)
        return self._decode(self.params, z_q), mask

    def sweep(
        self,
        audio: jnp.ndarray,
        levels: Sequence[float] = tuple(DEFAULT_LEVELS),
    ) -> Dict[float, Dict]:
        """Full sweep; returns {level: {audio, mask, kbps, bpf}}."""
        sr = self.model.sample_rate
        hop = self.model.hop_length
        n_q = self.model.n_codebooks
        bits = [int(math.log2(self.model.codebook_size))] * n_q
        enc = self.encode(audio)
        out = {}
        for level in levels:
            recon, mask = self.decode_at_level(enc, level)
            bpf = cal_bpf_from_mask(mask, bits)
            out[level] = {
                "audio": recon,
                "mask": mask,
                "bpf": bpf,
                "kbps": bpf * math.floor(sr / hop) / 1000,
            }
        return out


def save_results(
    model,
    params,
    input_tensor: jnp.ndarray,
    level_list: Sequence[float],
    save_result_dir: str,
) -> Dict:
    """Per-example artifact dump (reference: scripts/inference.py:73-122):
    recon wavs, imp-map PNGs (if matplotlib available), metadata.json with
    SI-SDR + kbps per level."""
    os.makedirs(save_result_dir, exist_ok=True)
    save_idx = 0
    while True:
        save_dir = os.path.join(save_result_dir, f"{save_idx}")
        if os.path.exists(save_dir):
            save_idx += 1
        else:
            os.makedirs(save_dir)
            break

    sr = model.sample_rate
    n_q = model.n_codebooks
    sweeper = LevelSweep(model, params)
    input_tensor = model.preprocess(jnp.asarray(input_tensor), sr)
    results = sweeper.sweep(input_tensor, level_list)

    metadata = {}
    for level, r in results.items():
        level_scaled = level * n_q
        recon = np.asarray(r["audio"])
        sisdr = si_sdr(recon, np.asarray(input_tensor))
        fname = f"recon_{level_scaled:.2f}.wav"
        Signal(recon, sr).write(os.path.join(save_dir, fname))
        _save_mask_png(np.asarray(r["mask"]), level_scaled, save_dir)
        metadata[f"level_{level_scaled:.2f}"] = {
            "sisdr": sisdr, "kbps": r["kbps"],
        }

    with open(os.path.join(save_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=4)
    Signal(np.asarray(input_tensor), sr).write(
        os.path.join(save_dir, "input.wav")
    )
    return metadata


def _save_mask_png(mask: np.ndarray, level: float, save_dir: str) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    nq = mask.shape[1]
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.imshow(mask[0], cmap="viridis", aspect="auto", interpolation="none")
    ax.set_yticks(np.arange(0, nq))
    ax.set_yticklabels(np.arange(1, nq + 1), fontsize=20)
    ax.invert_yaxis()
    ax.set_xticks([])
    plt.tight_layout()
    plt.savefig(os.path.join(save_dir, f"imp_map_{level:.2f}.png"))
    plt.close(fig)
