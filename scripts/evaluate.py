"""Offline codec evaluation CLI: the full metric menu per VBR level.

The reference wires its metric dispatch (models/utils.py:91-143) into
training validation and reports only SI-SDR + kbps from the inference
sweep (scripts/inference.py:109-122). This CLI evaluates a checkpoint
over a directory of audio with the whole menu — SI-SDR / SDR / SI-SNR /
SNR / L1, mel + multi-scale STFT losses, optional ViSQOL NSIM — plus
bits-per-frame/kbps per level and per-codebook usage entropy
(cal_entropy, models/utils.py:76-88), aggregated mean±std over examples
(NaN-safe mean_std, models/utils.py:146-150).

Usage:
    python scripts/evaluate.py --args.load conf/vrvq/vrvq_a2.yml \
        --ckpt_dir ckpt --tag latest --data_dir /path/wavs \
        --num_examples 30 --out eval.json
Optional flags: --levels "0.5,1,2"   --visqol 1   --duration 10
"""

import json
import os
import sys
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("JAX_PLATFORMS") not in (None, "", "axon"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from vrvq_tpu.config import parse_args
from vrvq_tpu.data.loaders import AudioLoader
from vrvq_tpu.infer.sweep import DEFAULT_LEVELS, LevelSweep
from vrvq_tpu.losses import L1Loss, MelSpectrogramLoss, MultiScaleSTFTLoss
from vrvq_tpu.metrics import (
    cal_entropy, cal_metrics, codebook_usage, mean_std,
)
from vrvq_tpu.models import DAC_VRVQ
from vrvq_tpu.train import checkpoint as ckpt
from vrvq_tpu.utils import enable_compilation_cache

enable_compilation_cache()

METRICS = ("SI-SDR", "SDR", "SI-SNR", "SNR", "L1", "mel", "stft")


def evaluate(cfg):
    model = DAC_VRVQ(**cfg.kwargs("DAC_VRVQ"))
    params = ckpt.load_gen_params(cfg, model)

    if cfg.get("fast", True):
        from vrvq_tpu.infer.fast import make_inference_model

        model, params = make_inference_model(model, params)

    mel_kwargs = cfg.kwargs("MelSpectrogramLoss")
    mel_kwargs.setdefault("sample_rate", model.sample_rate)
    state = SimpleNamespace(
        mel_loss=MelSpectrogramLoss(**mel_kwargs),
        stft_loss=MultiScaleSTFTLoss(**cfg.kwargs("MultiScaleSTFTLoss")),
        waveform_loss=L1Loss(),
    )

    levels = cfg.get("levels", DEFAULT_LEVELS)
    if isinstance(levels, str):
        levels = [float(x) for x in levels.split(",")]
    elif isinstance(levels, bool) or levels is None:
        raise ValueError(
            f"levels must be a number, comma-separated string, or list of "
            f"numbers; got {levels!r}"
        )
    elif isinstance(levels, (int, float)):
        # the CLI parser only tuple-izes comma-separated values, so a lone
        # "--levels 2" arrives as a bare scalar
        levels = [float(levels)]
    elif isinstance(levels, (list, tuple)):
        levels = [float(x) for x in levels]
    else:
        raise ValueError(
            f"levels must be a number, comma-separated string, or list of "
            f"numbers; got {type(levels).__name__}: {levels!r}"
        )
    # --visqol adds BOTH the raw neurogram similarity (NSIM, [0,1]) and
    # its MOS-LQO mapping (calibrated PCHIP anchor table, visqol.py) —
    # computed in one gammatonegram pass per (recon, ref) pair.
    do_visqol = bool(cfg.get("visqol"))
    metrics = list(METRICS) + (["ViSQOL", "ViSQOL-MOS"] if do_visqol else [])

    loader = AudioLoader(sources=[cfg.get("data_dir")], shuffle=False)
    n = min(cfg.get("num_examples", 30), len(loader.audio_indices))
    sweeper = LevelSweep(model, params)
    n_q = model.n_codebooks

    per_level = {lv: {m: [] for m in metrics + ["kbps", "bpf"]}
                 for lv in levels}
    usage = [np.zeros(model.codebook_size, np.int64) for _ in range(n_q)]
    imp_energy_r = []

    clip_classes = []  # per-example class tag (from make_synth_dataset
    #                    multi-class filenames: split_0007_speech+noise.wav)
    for idx in range(n):
        item = loader(
            state=np.random.RandomState(idx),
            sample_rate=model.sample_rate,
            duration=cfg.get("duration", 10),
            num_channels=1,
            global_idx=idx,  # deterministic sweep over the directory
        )
        stem_parts = Path(item["path"]).stem.split("_", 2)
        clip_classes.append(stem_parts[2] if len(stem_parts) > 2 else "")
        audio = model.preprocess(
            jnp.asarray(item["signal"].audio_data), model.sample_rate
        )
        enc = sweeper.encode(audio)
        results = sweeper.sweep(audio, levels, batched=True, enc=enc)
        ref = np.asarray(audio)
        for lv, r in results.items():
            recon = np.asarray(r["audio"])[..., : ref.shape[-1]]
            for m in metrics:
                if m in ("ViSQOL", "ViSQOL-MOS"):
                    continue  # one combined pass below
                per_level[lv][m].append(cal_metrics(recon, ref, state, m))
            if do_visqol:
                from vrvq_tpu.metrics import _visqol_batch

                v, mos = _visqol_batch(recon, ref)
                per_level[lv]["ViSQOL"].append(v)
                per_level[lv]["ViSQOL-MOS"].append(mos)
            per_level[lv]["kbps"].append(r["kbps"])
            per_level[lv]["bpf"].append(r["bpf"])
        # full-depth codebook usage for the entropy report (independent
        # of the VBR mask: which entries the quantizers select at all)
        enc_codes = np.asarray(enc["codes"])
        for q, bc in enumerate(
            codebook_usage(enc_codes, model.codebook_size)
        ):
            usage[q] += bc.astype(np.int64)
        # the paper's saliency signature: does the importance map track
        # per-frame signal energy? (reference scripts/inference.py:95-122
        # plots the imp map; here we quantify it as a Pearson r per clip)
        if "imp_map" in enc and enc["imp_map"] is not None:
            imp = np.asarray(enc["imp_map"])[0, 0]  # (T') frames
            hop = model.hop_length
            t = imp.shape[0]
            frames = ref[0, 0, : t * hop].reshape(t, hop)
            energy_db = 10 * np.log10((frames ** 2).mean(axis=1) + 1e-10)
            if imp.std() > 0 and energy_db.std() > 0:
                imp_energy_r.append(float(np.corrcoef(imp, energy_db)[0, 1]))
        print(f"evaluated {idx + 1}/{n}", file=sys.stderr)

    entropy, pct = cal_entropy(usage)
    report = {
        "num_examples": n,
        "levels": {
            f"level_{lv * n_q:.2f}": {
                **{m: dict(zip(("mean", "std"),
                               mean_std(per_level[lv][m])))
                   for m in metrics},
                "kbps": float(np.mean(per_level[lv]["kbps"])),
                "bpf": float(np.mean(per_level[lv]["bpf"])),
            }
            for lv in levels
        },
        "codebook_entropy_bits": entropy,
        "codebook_usage_pct": pct,
    }
    if imp_energy_r:
        report["imp_map_energy_corr"] = dict(
            zip(("mean", "std"), mean_std(imp_energy_r))
        )

    if any(clip_classes):
        # per-class rate-distortion at the top level: mixed corpora hide
        # class-dependent failure (noise textures vs harmonics) in the mean
        top = max(levels)
        by_class: dict = {}
        for metric in ("SI-SDR", "mel", "kbps") + (
                ("ViSQOL-MOS",) if do_visqol else ()):
            vals = per_level[top][metric]
            for cls, v in zip(clip_classes, vals):
                for c in (cls.split("+") if cls else ["unknown"]):
                    by_class.setdefault(c, {}).setdefault(
                        metric, []).append(float(v))
        report["per_class_top_level"] = {
            c: {m: dict(zip(("mean", "std"), mean_std(vs)))
                for m, vs in ms.items()}
            for c, ms in by_class.items()
        }

    out = cfg.get("out", "eval.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["levels"], indent=2))
    print(f"wrote {out}", file=sys.stderr)
    return report


if __name__ == "__main__":
    evaluate(parse_args())
