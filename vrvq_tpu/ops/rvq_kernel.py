"""Fused residual-VQ Pallas kernel: all Nq stages in one VMEM-resident pass.

The reference's quantizer is a sequential per-stage torch loop
(models/quantize.py:353-365): each stage does in_proj -> L2-normalize ->
distance matmul -> argmin -> embed -> out_proj -> residual update, each op
a separate HBM round trip. Here the whole loop runs inside one Pallas
kernel per (frames x latent) tile:

  * the residual stays in VMEM across all Nq stages (one HBM read of z,
    one HBM write of z_q — instead of ~6*Nq round trips);
  * distances and projections are MXU matmuls in f32 (bit-stable argmax
    index parity with the module path);
  * codebook lookup is an exact one-hot matmul (gather-free, MXU);
  * the VBR mask multiply (masked sum over stages,
    models/quantize.py:420-421) is fused into the accumulation.

Inputs are the *effective* (weight-norm-resolved) projection weights —
see ``stack_quantizer_weights``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def stack_quantizer_weights(quantizer_params: dict, n_codebooks: int):
    """Resolve weight norm and stack per-stage projection weights.

    quantizer_params: the ``params['params']['quantizer']`` subtree.
    Returns (wi (Nq,D,d), bi (Nq,d), wo (Nq,d,D), bo (Nq,D), cb (Nq,K,d)).
    """
    wis, bis, wos, bos, cbs = [], [], [], [], []
    for i in range(n_codebooks):
        q = quantizer_params[f"quantizers_{i}"]
        v, g = q["in_proj"]["v"], q["in_proj"]["g"]
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=0, keepdims=True))
        wis.append(v * (g[None, :] / jnp.maximum(norm, 1e-32)))
        bis.append(q["in_proj"]["bias"])
        v, g = q["out_proj"]["v"], q["out_proj"]["g"]
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=0, keepdims=True))
        wos.append(v * (g[None, :] / jnp.maximum(norm, 1e-32)))
        bos.append(q["out_proj"]["bias"])
        cbs.append(q["codebook"])
    return (jnp.stack(wis), jnp.stack(bis), jnp.stack(wos), jnp.stack(bos),
            jnp.stack(cbs))


def _normalize(x, eps=1e-12):
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


def fused_rvq_reference(z, wi, bi, wo, bo, cb, mask=None):
    """Pure-XLA reference of the fused kernel (used for testing and as the
    CPU fallback). z: (F, D) frames; mask: (F, Nq) or None.
    Returns (z_q (F, D), codes (F, Nq))."""
    n_q = wi.shape[0]
    residual = z.astype(jnp.float32)
    z_q = jnp.zeros_like(residual)
    codes = []
    for i in range(n_q):
        e = jnp.dot(residual, wi[i], precision='highest') + bi[i]
        en = _normalize(e)
        cn = _normalize(cb[i].astype(jnp.float32))
        dist = (
            jnp.sum(en * en, axis=1, keepdims=True)
            - 2.0 * jnp.dot(en, cn.T, precision='highest')
            + jnp.sum(cn * cn, axis=1, keepdims=True).T
        )
        idx = jnp.argmax(-dist, axis=1)
        codes.append(idx)
        zq_e = cb[i].astype(jnp.float32)[idx]
        # match the module path's STE arithmetic bit-for-bit:
        # out_proj(e + (zq - e)) != out_proj(zq) in floating point
        zq_e = e + (zq_e - e)
        out_i = jnp.dot(zq_e, wo[i], precision='highest') + bo[i]
        residual = residual - out_i
        if mask is not None:
            out_i = out_i * mask[:, i:i + 1]
        z_q = z_q + out_i
    return z_q.astype(z.dtype), jnp.stack(codes, axis=1).astype(jnp.int32)


def _rvq_kernel(z_ref, wi_ref, bi_ref, wo_ref, bo_ref, cb_ref, mask_ref,
                zq_ref, codes_ref, *, n_q: int, codebook_size: int):
    z = z_ref[...].astype(jnp.float32)          # (F, D)
    residual = z
    z_q = jnp.zeros_like(z)
    f = z.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (f, codebook_size), 1)

    for i in range(n_q):
        wi = wi_ref[i].astype(jnp.float32)       # (D, d)
        bi = bi_ref[i].astype(jnp.float32)       # (d,)
        e = jnp.dot(residual, wi, preferred_element_type=jnp.float32,
                    precision="highest") + bi
        en = _normalize(e)
        cbi = cb_ref[i].astype(jnp.float32)      # (K, d)
        cn = _normalize(cbi)
        # dist = |e|^2 - 2 e.c + |c|^2 ; argmax(-dist) == reference tie-break
        scores = (
            -jnp.sum(en * en, axis=1, keepdims=True)
            + 2.0 * jnp.dot(en, cn.T, preferred_element_type=jnp.float32,
                            precision="highest")
            - jnp.sum(cn * cn, axis=1, keepdims=True).T
        )                                        # (F, K)
        idx = jnp.argmax(scores, axis=1)         # first max on ties
        codes_ref[:, i] = idx.astype(jnp.int32)
        onehot = (col == idx[:, None]).astype(jnp.float32)
        zq_e = jnp.dot(onehot, cbi, preferred_element_type=jnp.float32,
                       precision="highest")
        # STE arithmetic parity with the module path (see reference impl)
        zq_e = e + (zq_e - e)
        wo = wo_ref[i].astype(jnp.float32)       # (d, D)
        bo = bo_ref[i].astype(jnp.float32)       # (D,)
        out_i = jnp.dot(zq_e, wo, preferred_element_type=jnp.float32,
                        precision="highest") + bo
        residual = residual - out_i
        out_i = out_i * mask_ref[:, i].astype(jnp.float32)[:, None]
        z_q = z_q + out_i

    zq_ref[...] = z_q.astype(zq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_f", "interpret"))
def fused_rvq(
    z: jnp.ndarray,
    wi: jnp.ndarray,
    bi: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    cb: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    block_f: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused RVQ quantization with optional VBR gating.

    z: (F, D) latent frames (flatten (B, T, D) -> (B*T, D) first).
    mask: (F, Nq) stage gate (1 = keep); None = all stages (CBR full).
    Returns (z_q (F, D), codes (F, Nq) int32).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f, d_model = z.shape
    n_q, _, d_code = wi.shape
    k = cb.shape[1]

    if mask is None:
        mask = jnp.ones((f, n_q), z.dtype)

    pad = (-f) % block_f
    if pad:
        z = jnp.pad(z, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, pad), (0, 0)))
    fp = z.shape[0]
    grid = (fp // block_f,)

    kernel = functools.partial(
        _rvq_kernel, n_q=n_q, codebook_size=k
    )
    z_q, codes = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_f, d_model), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, d_model, d_code), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, d_code), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, d_code, d_model), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, d_model), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, k, d_code), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_f, n_q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_f, d_model), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_f, n_q), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((fp, d_model), z.dtype),
            jax.ShapeDtypeStruct((fp, n_q), jnp.int32),
        ],
        interpret=interpret,
    )(z, wi, bi, wo, bo, cb, mask)

    if pad:
        z_q = z_q[:f]
        codes = codes[:f]
    return z_q, codes


def quantize_fused(model, params, z_btd: jnp.ndarray,
                   mask_bnt: Optional[jnp.ndarray] = None,
                   interpret: bool = False):
    """Convenience wrapper: (B, T, D) latents (+(B, Nq, T) mask) through the
    fused kernel. ``params`` may be the full model variables (with a
    ``quantizer`` subtree) or a quantizer-module variables dict.
    Returns (z_q (B,T,D), codes (B,Nq,T))."""
    b, t, d = z_btd.shape
    n_q = model.n_codebooks
    subtree = params["params"]
    if "quantizer" in subtree:
        subtree = subtree["quantizer"]
    wi, bi, wo, bo, cb = stack_quantizer_weights(subtree, n_q)
    z = z_btd.reshape(b * t, d)
    mask = None
    if mask_bnt is not None:
        mask = mask_bnt.transpose(0, 2, 1).reshape(b * t, n_q)
    z_q, codes = fused_rvq(z, wi, bi, wo, bo, cb, mask, interpret=interpret)
    return (
        z_q.reshape(b, t, d),
        codes.reshape(b, t, n_q).transpose(0, 2, 1),
    )
