"""Fast-inference model preparation: decoder weight-norm fold, bf16 decode,
polynomial snake.

``make_inference_model(model, params)`` returns a ``(model', params')``
pair that is a drop-in replacement for every inference entry point
(``LevelSweep``, ``decode_chunked``, ``CodecProcessor``, plain
``model.apply``) with:

  * weight norm folded out of the DECODER (nn/fold.py). The encoder is left
    live by default: folding it changes how XLA fuses the ``g*v/||v||``
    rescale into the convs, which perturbs latents at the ulp level and
    flips ~1.4% of TPU code indices — for a measured ~0% speed gain.
  * the decoder in bf16 (``decode_dtype='bfloat16'``): folded kernels are
    stored as real bf16 arrays. Speed-neutral on v5e (decode is not
    FLOP-bound) but halves decoder activation HBM, lifting the
    batch-32 x 10 s one-shot decode OOM.
  * polynomial snake in the decoder (``snake_approx=True``): jnp.sin is the
    measured decode bottleneck on v5e (9.6 ms vs 0.8 ms memory floor per
    activation); the degree-4 sin^2 fit (|error| <= 4.5e-6, ops/snake.py)
    gives a measured 2.9x flagship decode / 1.6x end-to-end forward
    (BASELINE.md). Codes are unaffected.

Same-platform codes are bit-identical to the live model (same encoder
subgraph). Cross-platform (TPU vs CPU/torch) exactness is governed by
``encode_precision='highest'`` on the model, independent of this wrapper.
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
    snake_approx: bool = True,
    encode_snake_approx: bool = False,
    fold_encoder: bool = False,
) -> Tuple[object, dict]:
    """Prepare a model+params pair for fast inference.

    Args:
      model: a ``DAC_VRVQ`` / ``DAC_MOE`` instance.
      params: its live (training/converted) param tree ``{'params': ...}``.
      decode_dtype: decoder conv-stack compute dtype; ``None`` keeps the
        model's current decoder dtype. Codes are unaffected.
      encode_dtype: encoder conv-stack dtype. Leave ``None`` (f32) for
        same-platform bit-exact codebook indices; ``'bfloat16'`` is a fast
        approximate mode that changes a small fraction of indices (implies
        folding the encoder).
      snake_approx: polynomial sin^2 in the DECODER's snake activations
        (|error| <= 4.5e-6, far below bf16 rounding; measured 2.9x faster
        flagship decode on v5e where jnp.sin dominates). Codes unaffected.
      encode_snake_approx: opt-in polynomial snake in the ENCODER too —
        maximum-throughput mode; latents shift slightly so a small fraction
        of code indices changes (no longer bit-exact vs the live encoder).
      fold_encoder: also fold the encoder's weight norm. Perturbs TPU codes
        (see module docstring); only worth it together with
        ``encode_dtype='bfloat16'``.

    Returns ``(model', params')``; the quantizer subtree is never touched.
    """
    do_fold_encoder = fold_encoder or encode_dtype is not None
    p = params["params"]
    new_p = dict(p)
    if do_fold_encoder:
        new_p["encoder"] = fold_weight_norm(p["encoder"], encode_dtype)
    new_p["decoder"] = fold_weight_norm(p["decoder"], decode_dtype)
    out_params = dict(params)
    out_params["params"] = new_p

    kw = dict(decoder_folded=True, encoder_folded=do_fold_encoder,
              decoder_snake_approx=snake_approx,
              encoder_snake_approx=encode_snake_approx)
    if decode_dtype is not None:
        kw["decoder_compute_dtype"] = decode_dtype
    if encode_dtype is not None:
        kw["compute_dtype"] = encode_dtype
    return replace(model, **kw), out_params
