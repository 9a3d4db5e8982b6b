"""Fused ResidualUnit Pallas kernel + fast decoder path.

The decoder's FLOPs concentrate in ResidualUnits at small channel counts
and high time resolution (C=96 @ 44.1 kHz, C=192 @ 22 kHz — reference
models/layers.py:52-68, models/dac_vrvq.py:51-80). XLA's generic conv
lowering reaches only ~36 TF/s there (channel dim wastes MXU lanes and
each op round-trips HBM). This kernel computes a whole ResidualUnit —
snake -> dilated k=7 conv -> snake -> k=1 conv -> residual add — per
(batch, time-block) tile in VMEM:

  * the k=7 dilated conv is 7 shifted (T_BLK, C) @ (C, C) MXU matmuls over
    a halo-extended block DMA'd from HBM once;
  * both snakes and the residual add fuse in-register;
  * one HBM read + one HBM write per unit instead of ~6.

``fast_decoder_apply`` runs the full decoder with ResidualUnits fused
(up-convs and edge convs stay XLA), numerically equivalent to the module
path to f32 tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _resolve_wn_conv(p: dict, transpose: bool = False):
    """Weight-norm conv params -> effective torch-layout kernel + bias."""
    v, g = p["v"], p["g"]
    if transpose:
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True))
        w = v * (g[:, None, None] / jnp.maximum(norm, 1e-32))
    else:
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
        w = v * (g[None, None, :] / jnp.maximum(norm, 1e-32))
    return w, p.get("bias")


def _ru_kernel(x_hbm, a1_ref, w7_ref, b7_ref, a2_ref, w1_ref, b1_ref,
               out_ref, scratch, sem, *, t_blk: int, pad: int, dilation: int,
               mxu_dtype=jnp.bfloat16):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    # halo-extended block of the pre-padded input — one DMA from HBM per
    # unit. The slice length is rounded up to the 8-sublane tile.
    win = scratch.shape[0]
    dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t_blk, win), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    xh = scratch[...].astype(jnp.float32)        # (t_blk + 2*pad, C)
    a1 = a1_ref[...].astype(jnp.float32)
    s = jnp.sin(a1 * xh)
    s1 = xh + (s * s) / (a1 + 1e-9)

    # mxu_dtype=bf16: single-pass MXU matmuls with f32 accumulation (the
    # audio synthesis path tolerates bf16 mantissa; codes never touch this
    # kernel). mxu_dtype=f32 for tight numerical parity checks.
    acc = jnp.zeros((t_blk, out_ref.shape[-1]), jnp.float32)
    s1b = s1.astype(mxu_dtype)
    for k in range(7):
        off = k * dilation
        acc = acc + jnp.dot(
            s1b[off:off + t_blk, :], w7_ref[k].astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        )
    y = acc + b7_ref[...].astype(jnp.float32)

    a2 = a2_ref[...].astype(jnp.float32)
    s = jnp.sin(a2 * y)
    s2 = y + (s * s) / (a2 + 1e-9)

    z = jnp.dot(s2.astype(mxu_dtype), w1_ref[0].astype(mxu_dtype),
                preferred_element_type=jnp.float32)
    z = z + b1_ref[...].astype(jnp.float32)

    out_ref[0] = (xh[pad:pad + t_blk, :] + z).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("dilation", "t_blk", "interpret",
                                    "mxu_dtype"))
def fused_residual_unit(
    x: jnp.ndarray,
    alpha1: jnp.ndarray,
    w7: jnp.ndarray,       # (7, C, C) WIO
    b7: jnp.ndarray,
    alpha2: jnp.ndarray,
    w1: jnp.ndarray,       # (1, C, C) WIO
    b1: jnp.ndarray,
    dilation: int = 1,
    t_blk: int = 2048,
    interpret: bool = False,
    mxu_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """x: (B, T, C) -> (B, T, C), padding=True ResidualUnit semantics."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, c_in = x.shape
    pad = 3 * dilation
    # Mosaic DMA slices need a 128-aligned lane (channel) dim: zero-pad
    # channels (zeros propagate exactly through snake/convs/residual)
    c = -(-c_in // 128) * 128
    if c != c_in:
        dc = c - c_in
        x = jnp.pad(x, ((0, 0), (0, 0), (0, dc)))
        w7 = jnp.pad(w7, ((0, 0), (0, dc), (0, dc)))
        w1 = jnp.pad(w1, ((0, 0), (0, dc), (0, dc)))
        b7 = jnp.pad(b7, (0, dc))
        b1 = jnp.pad(b1, (0, dc))
        alpha1 = jnp.pad(alpha1, (0, dc), constant_values=1.0)
        alpha2 = jnp.pad(alpha2, (0, dc), constant_values=1.0)

    # scale the block to the channel count: pallas double-buffers every
    # input, so VMEM ~ 2*(w7 + w1 + out) + scratch + live intermediates
    t_blk = min(t_blk, max(512, (2048 * 128) // c))
    t_blk = min(t_blk, max(512, t))
    t_blk = -(-t_blk // 8) * 8  # 8-sublane alignment

    tail = (-t) % t_blk
    # DMA slice lengths must be 8-aligned: round the halo window up and
    # over-pad the input on the right so every windowed read is in-bounds
    win = -(-(t_blk + 2 * pad) // 8) * 8
    extra = win - (t_blk + 2 * pad)
    xp = jnp.pad(x, ((0, 0), (pad, pad + tail + extra), (0, 0)))
    n_blocks = (t + tail) // t_blk

    kernel = functools.partial(_ru_kernel, t_blk=t_blk, pad=pad,
                               dilation=dilation,
                               mxu_dtype=jnp.dtype(mxu_dtype))
    out = pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=[
            # full array stays in HBM/ANY; halo blocks are DMA'd manually
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((7, c, c), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, c), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda bi, ti: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_blk, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t + tail, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((win, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, alpha1, w7, b7, alpha2, w1, b1)
    return out[:, :t, :c_in]


def _snake_xla(v, a):
    s = jnp.sin(a * v)
    return v + (s * s) / (a + 1e-9)


def _ru_params(p: dict):
    """Extract a ResidualUnit's effective weights from its param subtree."""
    w7, b7 = _resolve_wn_conv(p["conv1"])
    w1, b1 = _resolve_wn_conv(p["conv2"])
    return (p["snake1"]["alpha"], w7, b7, p["snake2"]["alpha"], w1, b1)


def fast_decoder_apply(
    decoder_params: dict,
    z: jnp.ndarray,
    rates=(8, 8, 4, 2),
    channels: int = 1536,
    t_blk: int = 2048,
    interpret: bool = False,
    min_fused_t: int = 8192,
    max_fused_c: int = 192,
    mxu_dtype: str = "bfloat16",
) -> jnp.ndarray:
    """Run the full decoder with ResidualUnits fused in Pallas.

    decoder_params: ``params['params']['decoder']`` subtree; z: (B, T', D).
    Up-convs / edge convs stay XLA (they are large-channel and already fast);
    ResidualUnits at blocks whose time length >= ``min_fused_t`` take the
    fused kernel (short blocks aren't worth the DMA setup).
    Returns audio (B, T, 1). Numerically equivalent to the module decoder
    to f32 tolerance.
    """
    p = decoder_params
    w, bias = _resolve_wn_conv(p["in_conv"])
    x = jax.lax.conv_general_dilated(
        z, w, (1,), [(3, 3)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ) + bias

    for i, stride in enumerate(rates):
        bp = p[f"block_{i}"]
        input_dim = channels // (2 ** i)
        # snake + transposed conv
        x = _snake_xla(x, bp["snake"]["alpha"])
        wt, bt = _resolve_wn_conv(bp["up"], transpose=True)
        k = wt.shape[2]
        pad_t = int(np.ceil(stride / 2))
        wt = jnp.flip(wt, axis=2).transpose(2, 0, 1)
        x = jax.lax.conv_general_dilated(
            x, wt, (1,), [(k - 1 - pad_t, k - 1 - pad_t)],
            lhs_dilation=(stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        ) + bt
        for j, dilation in enumerate((1, 3, 9)):
            a1, w7, b7, a2, w1, b1 = _ru_params(bp[f"res{j}"])
            # fuse only where it wins AND the stage weights fit VMEM
            # (w7 is 7*C*C*4B: C=768 alone exceeds the 16MB budget);
            # compiled pallas is TPU-only — CPU takes the XLA path
            fusable = x.shape[-1] <= max_fused_c and (
                interpret or jax.default_backend() != "cpu"
            )
            if fusable and (x.shape[1] >= min_fused_t or interpret):
                x = fused_residual_unit(
                    x, a1, w7, b7, a2, w1, b1, dilation=dilation,
                    t_blk=t_blk, interpret=interpret, mxu_dtype=mxu_dtype,
                )
            else:
                x = fused_residual_unit_reference(
                    x, a1, w7, b7, a2, w1, b1, dilation=dilation
                )

    x = _snake_xla(x, p["snake"]["alpha"])
    w, bias = _resolve_wn_conv(p["out_conv"])
    x = jax.lax.conv_general_dilated(
        x, w, (1,), [(3, 3)], dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ) + bias
    return jnp.tanh(x)


def fused_residual_unit_reference(x, alpha1, w7, b7, alpha2, w1, b1,
                                  dilation: int = 1):
    """Pure-XLA reference of the fused unit (tests / CPU fallback)."""
    def snake(v, a):
        s = jnp.sin(a * v)
        return v + (s * s) / (a + 1e-9)

    pad = 3 * dilation
    s1 = snake(x, alpha1)
    y = jax.lax.conv_general_dilated(
        s1, w7, (1,), [(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ) + b7
    s2 = snake(y, alpha2)
    z = jax.lax.conv_general_dilated(
        s2, w1, (1,), [(0, 0)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ) + b1
    return x + z
