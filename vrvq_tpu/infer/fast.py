"""Fast-inference model preparation: fold weight norm, bf16 decode.

``make_inference_model(model, params)`` returns a ``(model', params')``
pair that is a drop-in replacement for every inference entry point
(``LevelSweep``, ``decode_chunked``, ``CodecProcessor``, plain
``model.apply``) with:

  * weight norm folded out of encoder + decoder (nn/fold.py) — no per-call
    ``g * v / ||v||`` recomputation;
  * the decoder optionally in bf16 (``decode_dtype='bfloat16'``): folded
    kernels are stored as real bf16 arrays, so the transposed-conv /
    conv stacks run native-bf16 MXU matmuls. The encoder and quantizer
    stay f32 — codebook indices remain bit-exact vs the torch reference
    (the encode->codes path precision rule, CLAUDE.md).

Decode quality in bf16 is validated in tests/test_fold.py (CPU): the bf16
decode agrees with the f32 decode far above the codec's own reconstruction
error, so end-to-end SI-SDR is unchanged at reporting precision. Speed is
NEUTRAL on v5e (the decoder is HBM/layout-bound, not FLOP-bound); the bf16
benefit is memory — halved decoder activation HBM lifts the batch-32 x 10 s
one-shot decode OOM (BASELINE.md).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Optional, Tuple

from ..nn.fold import fold_weight_norm


def make_inference_model(
    model,
    params,
    decode_dtype: Optional[str] = "bfloat16",
    encode_dtype: Optional[str] = None,
) -> Tuple[object, dict]:
    """Fold weight norm and set inference dtypes.

    Args:
      model: a ``DAC_VRVQ`` / ``DAC_MOE`` instance.
      params: its live (training/converted) param tree ``{'params': ...}``.
      decode_dtype: decoder conv-stack compute dtype; ``None`` keeps the
        model's current decoder dtype. Codes are unaffected.
      encode_dtype: encoder conv-stack dtype. Leave ``None`` (f32) for
        bit-exact codebook indices; ``'bfloat16'`` is a fast approximate
        mode that changes a small fraction of indices.

    Returns ``(model', params')`` where ``model'`` has ``folded=True`` and
    ``params'`` carries pre-folded kernels (quantizer subtree untouched).
    """
    p = params["params"]
    new_p = dict(p)
    new_p["encoder"] = fold_weight_norm(p["encoder"], encode_dtype)
    new_p["decoder"] = fold_weight_norm(p["decoder"], decode_dtype)
    out_params = dict(params)
    out_params["params"] = new_p

    kw = dict(folded=True)
    if decode_dtype is not None:
        kw["decoder_compute_dtype"] = decode_dtype
    if encode_dtype is not None:
        kw["compute_dtype"] = encode_dtype
    return replace(model, **kw), out_params
