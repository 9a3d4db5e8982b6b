"""VBR inference: encode once, re-mask + decode per level.

Reference: scripts/inference.py:73-122 — the canonical VBR API: one encode
pass produces per-stage ``z_q_is`` + the importance map; each target level
rescales the map, hard-masks the stages, sums, and decodes. Encode and
decode are separate jit programs so the level sweep reuses the encoder
work (12 decoder invocations per utterance by default).
"""

from __future__ import annotations

import functools
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

    ``sweep(..., batched=True)`` folds all levels into one decoder launch
    (1.5x at B=1 on v5e). A fused Pallas ResidualUnit decoder was tried
    and measured 0.72x vs XLA (sublane-shift relayouts dominate — see
    CLAUDE.md), so the XLA conv path is the only decode path.
    """

    def __init__(self, model, params):
        self.model = model
        self.params = params
        self._encode = jax.jit(
            lambda p, a: model.apply(p, a, level=1.0, method=type(model).encode)
        )
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
        batched: bool = False,
        enc: Optional[Dict] = None,
    ) -> Dict[float, Dict]:
        """Full sweep; returns {level: {audio, mask, kbps, bpf}}.

        ``batched=True`` decodes ALL levels in one program call (levels
        folded into the batch axis; one-shot decode within the HBM-proven
        frame-batch limit, windowed beyond it) and computes every level's
        bits-per-frame in-graph, so the whole sweep costs one decoder
        launch and one scalar fetch. Measured 1.5x for the 12-level sweep
        at B=1 x 10 s on v5e: 1019 ms vs 1547 ms (BASELINE.md).

        Pass ``enc`` (a previous :meth:`encode` result) to reuse the
        encoder work — e.g. when the caller also needs the raw codes
        (scripts/evaluate.py's codebook-usage report).
        """
        sr = self.model.sample_rate
        hop = self.model.hop_length
        n_q = self.model.n_codebooks
        bits = [int(math.log2(self.model.codebook_size))] * n_q
        if enc is None:
            enc = self.encode(audio)
        out = {}
        if batched:
            recons, masks, bpfs = self._decode_levels_batched(
                self.params, enc["z_q_is"], enc["imp_map"],
                tuple(float(l) for l in levels),
            )
            bpfs = np.asarray(bpfs)  # one host fetch for every level
            for i, level in enumerate(levels):
                bpf = float(bpfs[i])
                out[level] = {
                    "audio": recons[i],
                    "mask": masks[i],
                    "bpf": bpf,
                    "kbps": bpf * math.floor(sr / hop) / 1000,
                }
            return out
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

    # one-shot decode is known-good up to ~batch 24 x 862 latent frames on
    # v5e (BASELINE.md); beyond that the conv stacks OOM and we window.
    # Chunking costs real time at large batch (fori_loop serialization:
    # 1450 ms vs 560 ms decode-only for 12 levels x 10 s), so it is a
    # memory fallback, not a default.
    _ONE_SHOT_FRAME_BATCH = 24 * 862

    @functools.cached_property
    def _decode_levels_batched(self):
        from .chunked import decode_chunked

        model = self.model
        n_q = model.n_codebooks
        limit = self._ONE_SHOT_FRAME_BATCH

        @functools.partial(jax.jit, static_argnames=("levels",))
        def run(params, z_q_is, imp_map, levels):
            lv = jnp.asarray(levels, jnp.float32)  # (L,)
            L = lv.shape[0]
            b, _, d, t = z_q_is.shape
            # (L*B, 1, T) scaled importance, then hard masks (L*B, Nq, T)
            scaled = (imp_map[None] * (lv[:, None, None, None] * n_q))
            mask = generate_mask_hard(scaled.reshape(L * b, 1, t), n_q)
            mask_l = mask.reshape(L, b, n_q, t)
            # masked stage sums for every level at once: (L, B, D, T)
            z_q = jnp.einsum(
                "bndt,lbnt->lbdt", z_q_is, mask_l.astype(z_q_is.dtype)
            ).reshape(L * b, d, t)
            if L * b * t <= limit:
                audio = model.apply(params, z_q, method=type(model).decode)
            else:
                audio = decode_chunked(model, params, z_q)
            # per-level bits-per-frame inside the program: one host fetch
            # for the whole sweep instead of L tunnel round trips
            bits = jnp.asarray(
                [math.log2(model.codebook_size)] * n_q, jnp.float32
            ).reshape(1, n_q, 1)
            bpf = jnp.sum(
                mask_l.astype(jnp.float32) * bits, axis=(1, 2, 3)
            ) / (b * t)
            return audio.reshape(L, b, 1, -1), mask_l, bpf

        return run


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
    # batched=True: all levels in one decoder launch (1.5x on v5e;
    # auto-windows past the one-shot HBM limit)
    results = sweeper.sweep(input_tensor, level_list, batched=True)

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
