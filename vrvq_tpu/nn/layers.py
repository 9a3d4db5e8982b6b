"""NN primitives for the codec: weight-normed convs, Snake, residual blocks.

TPU-native rebuild of the reference primitives (reference:
models/layers.py:17-135). Key design differences from the torch original:

  * channels-last layout: every module here takes/returns ``(B, T, C)`` so
    the channel axis maps onto the TPU's 128-wide lane dimension and XLA can
    tile convs onto the MXU without transposes.
  * weight normalization is an explicit reparameterization
    ``w = g * v / ||v||`` (torch ``weight_norm`` keeps ``dim=0``; we norm
    over the matching axes so converted torch checkpoints are bit-equivalent
    in f32).
  * ``padding`` is a static module flag (not a runtime mutation like the
    reference's ``CodecMixin.padding`` setter, models/dac_base.py:68-84) so
    each streaming/non-streaming variant compiles to its own XLA program.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.snake import snake, snake_approx


def _kaiming_uniform_bound(fan_in: int) -> float:
    # torch Conv default: kaiming_uniform(a=sqrt(5)) => bound = 1/sqrt(fan_in)
    return 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0


def pack_conv_kernel(w: jnp.ndarray, *, dilation: int, stride: int,
                     padding: int, pack_in: int, pack_out: int):
    """Re-express a 1-D conv as a dense conv over a time-packed layout.

    Time-packing (space-to-depth) maps ``x (B, T, C)`` to
    ``X (B, T/P, P*C)`` with ``X[u, phi*C + i] = x[P*u + phi, i]`` — the
    layout trick that fills the TPU's 128-wide lane dimension when C is
    small (the flagship encoder's first stage runs at C=64, half-empty
    lanes: measured 4.9% MXU / 177 ms of the 295 ms turbo encode, the
    single largest stage in the model; see BASELINE.md roofline).

    Given the effective WIO kernel ``w (k, cin, cout)`` of a conv with
    ``dilation/stride/padding`` on the UNPACKED sequence, returns
    ``(Kp, lo, hi)`` such that

      ``conv(X, Kp, stride=1, padding=[(lo, hi + U' - U)])``

    (with ``U = T/pack_in`` input and ``U' = T_out/pack_out`` output
    columns) computes exactly the same sums as the original conv, with the
    outputs packed by ``pack_out``. Requires ``pack_in == pack_out*stride``
    (each packed output column consumes a whole packed input column).
    The packed kernel is dense with structured zeros — 1.4-8.3x the MACs
    of the original at the flagship's dilations, traded for ~an order of
    magnitude better MXU occupancy at C<=64.
    """
    k, cin, cout = w.shape
    P, Q = pack_in, pack_out
    if P != Q * stride:
        raise ValueError(f"pack_in ({P}) must equal pack_out*stride "
                         f"({Q}*{stride})")
    taus = [(psi * stride + j * dilation - padding) // P
            for psi in range(Q) for j in range(k)]
    tau_min, tau_max = min(taus), max(taus)
    n_taps = tau_max - tau_min + 1
    Kp = jnp.zeros((n_taps, P * cin, Q * cout), w.dtype)
    for psi in range(Q):
        for j in range(k):
            m = psi * stride + j * dilation - padding
            tau, phi = m // P, m % P
            Kp = Kp.at[tau - tau_min,
                       phi * cin:(phi + 1) * cin,
                       psi * cout:(psi + 1) * cout].set(w[j])
    return Kp, -tau_min, tau_max


def pack_convtranspose_kernel(w: jnp.ndarray, *, stride: int, padding: int,
                              pack_in: int, pack_out: int):
    """Re-express a transposed 1-D conv as a dense conv over time-packed
    layouts (the decoder-side analog of :func:`pack_conv_kernel`).

    A transposed conv UPsamples, so packing grows through it:
    ``pack_out == pack_in * stride`` (each packed input column fans out to a
    whole packed output column). This is the sub-pixel / depth-to-space
    trick: the flagship decoder's tail runs at C=96 over the full audio rate
    (441k samples at b16 x 10 s) — under-filled 128-wide lanes, the same
    geometry as the encoder's measured block_0 bottleneck — and packing the
    tail computes at C=pack*96 over T/pack instead, same parameters.

    Given the torch-layout kernel ``w (cin, cout, k)`` of a
    ``ConvTranspose1d(stride, padding)``, returns ``(Kp, lo, tau_min)``
    such that with ``U`` packed input columns and
    ``U' = T_out/pack_out`` packed output columns (``T_out =
    (U*pack_in - 1)*stride - 2*padding + k``),

      ``conv(X, Kp, stride=1, padding=[(lo, U' - U - tau_min)])``

    computes exactly the transposed conv's sums with outputs packed by
    ``pack_out``.

    Derivation: y[t, o] = sum_{j,c} x[u, c] w[c, o, j] over t = u*stride -
    padding + j. With X[v, pi*cin+c] = x[v*P+pi, c] and Y[u', psi*cout+o] =
    y[u'*Q+psi, o], substituting u = v*P + pi gives t = v*Q + m with
    m = pi*stride + j - padding, so the (pi, j) tap lands at column offset
    tau = m // Q, output phase psi = m % Q.
    """
    cin, cout, k = w.shape
    P, Q = pack_in, pack_out
    if Q != P * stride:
        raise ValueError(f"pack_out ({Q}) must equal pack_in*stride "
                         f"({P}*{stride})")
    taus = [(pi * stride + j - padding) // Q
            for pi in range(P) for j in range(k)]
    tau_min, tau_max = min(taus), max(taus)
    n_taps = tau_max - tau_min + 1
    Kp = jnp.zeros((n_taps, P * cin, Q * cout), w.dtype)
    for pi in range(P):
        for j in range(k):
            m = pi * stride + j - padding
            tau, psi = m // Q, m % Q
            # conv computes y[u'] = sum_d X[u' + d - lo] K[d]; the term
            # X[u' - tau] needs d = lo - tau with lo = tau_max.
            Kp = Kp.at[tau_max - tau,
                       pi * cin:(pi + 1) * cin,
                       psi * cout:(psi + 1) * cout].set(w[:, :, j])
    return Kp, tau_max, tau_min


class WNConv1d(nn.Module):
    """Weight-normalized 1-D convolution, channels-last.

    Parity notes (reference: models/layers.py:17-18): torch stores
    ``weight_v`` as ``(out, in/groups, k)`` with the norm taken per *out*
    channel (``dim=0``). We store ``v`` in WIO layout ``(k, in/groups, out)``
    and norm over axes (0, 1), which is the same grouping.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    pad_mode: str = "zeros"  # 'zeros' | 'none' (streaming: padding disabled)
    folded: bool = False  # inference: params carry the effective kernel 'w'
    # None -> JAX default (bf16 multiplies on the TPU MXU, fastest).
    # 'highest' -> true-f32 multiplies: on TPU this makes encode codes match
    # the CPU/torch-exact path bit-for-bit (default TPU precision flips
    # ~2.5% of flagship code indices; see models.DAC_VRVQ.encode_precision).
    precision: Optional[str] = None
    # Time-packed (space-to-depth) apply: input arrives as (B, T/P, P*cin),
    # output leaves as (B, T_out/Q, Q*cout), with pack_in == pack_out*stride
    # (see pack_conv_kernel). Param shapes are UNCHANGED — the same
    # checkpoint drives both layouts. Summation order differs at the ulp
    # level, so packed encoders belong to the gated turbo profile, not the
    # bit-exact path. pack_in == pack_out == 1 is the normal layout.
    time_pack_in: int = 1
    time_pack_out: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, cin, cout, g = (
            self.kernel_size,
            self.in_channels,
            self.out_channels,
            self.groups,
        )
        fan_in = (cin // g) * k
        bound = _kaiming_uniform_bound(fan_in)

        if self.folded:
            # Effective kernel precomputed by nn.fold.fold_weight_norm:
            # no per-call norm, and the stored dtype (e.g. bf16) is what the
            # MXU actually sees — nothing for XLA's excess-precision pass to
            # elide back to f32.
            w = self.param(
                "w",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (k, cin // g, cout),
            )
        else:
            v = self.param(
                "v",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (k, cin // g, cout),
            )
            # g initialized to ||v|| so the initial effective weight equals v
            # (matching torch weight_norm wrapping at construction).
            g_param = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(
                    v.reshape(-1, cout), axis=0
                ).reshape(shape),
                (cout,),
            )
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
            w = v * (g_param[None, None, :] / jnp.maximum(norm, 1e-32))

        P, Q = self.time_pack_in, self.time_pack_out
        if P != 1 or Q != 1:
            if self.pad_mode != "zeros" or g != 1:
                raise ValueError("time-packed conv requires zero padding "
                                 "and groups == 1")
            Kp, lo, tau_max = pack_conv_kernel(
                w, dilation=self.dilation, stride=self.stride,
                padding=self.padding, pack_in=P, pack_out=Q)
            T = x.shape[1] * P
            t_out = (T + 2 * self.padding
                     - (k - 1) * self.dilation - 1) // self.stride + 1
            if t_out % Q:
                raise ValueError(f"packed output length {t_out} not a "
                                 f"multiple of pack_out {Q}")
            hi = tau_max + (t_out // Q - x.shape[1])
            y = jax.lax.conv_general_dilated(
                x, Kp.astype(x.dtype), window_strides=(1,),
                padding=[(lo, hi)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
                precision=self.precision,
            )
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (cout,))
                y = y + jnp.tile(b, Q).astype(y.dtype)
            return y.astype(x.dtype)

        pad = [(self.padding, self.padding)] if self.pad_mode == "zeros" else [(0, 0)]
        # NB: do NOT lower 1x1 convs to dot_general. Standalone the dot is
        # ~2x faster than XLA's convolution at the decoder's hot shapes
        # (v5e: 11.8 ms dot vs 20.8 ms conv at (16, 441344, 96)), but
        # end-to-end it is a measured 13% REGRESSION (952 -> 1077 ms fwd,
        # b16 x 10 s flagship): in context XLA fuses the k=1 conv with the
        # neighboring snake/residual elementwise ops, and the dot breaks
        # that fusion. Keep the conv.
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(self.stride,),
            padding=pad,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g,
            preferred_element_type=jnp.float32,
            precision=self.precision,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (cout,))
            y = y + b.astype(y.dtype)
        return y.astype(x.dtype)


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed 1-D convolution, channels-last.

    Implemented as a fractionally-strided conv: ``lhs_dilation = stride``
    with padding ``k - 1 - p`` and a spatially-flipped kernel, which XLA
    lowers to the same MXU matmuls as a forward conv. Output length is
    ``(L-1)*stride - 2*padding + kernel`` — identical to torch's
    ``ConvTranspose1d``.

    Parity notes: torch stores ``weight_v`` as ``(in, out/groups, k)`` and
    ``weight_norm(dim=0)`` norms per *in* channel over ``(out, k)``. We keep
    ``v`` in that torch layout so checkpoint conversion is a pure reshape,
    and build the flipped WIO kernel at call time.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    pad_mode: str = "zeros"  # 'zeros' | 'none' (streaming: padding=0)
    folded: bool = False  # inference: params carry the effective kernel 'w'
    precision: Optional[str] = None  # see WNConv1d.precision
    # Time-packed apply (see pack_convtranspose_kernel): input arrives as
    # (B, T/P, P*cin), output leaves as (B, T_out/Q, Q*cout) with
    # pack_out == pack_in*stride (upsampling GROWS the packing). Param
    # shapes unchanged; ulp-level summation reorder -> gated profiles only.
    time_pack_in: int = 1
    time_pack_out: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, cin, cout = self.kernel_size, self.in_channels, self.out_channels
        fan_in = cin * k  # torch fan_in for ConvTranspose1d init
        bound = _kaiming_uniform_bound(fan_in)

        if self.folded:
            # Effective kernel in the torch (in, out, k) layout, precomputed
            # by nn.fold.fold_weight_norm (see WNConv1d.folded).
            w = self.param(
                "w",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound
                ),
                (cin, cout, k),
            )
        else:
            v = self.param(
                "v",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (cin, cout, k),
            )
            g_param = self.param(
                "g",
                lambda key, shape: jnp.linalg.norm(
                    v.reshape(cin, -1), axis=1
                ).reshape(shape),
                (cin,),
            )
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True))
            w = v * (g_param[:, None, None] / jnp.maximum(norm, 1e-32))

        P, Q = self.time_pack_in, self.time_pack_out
        if P != 1 or Q != 1:
            if self.pad_mode != "zeros":
                raise ValueError(
                    "time-packed transposed conv requires zero padding")
            Kp, lo, tau_min = pack_convtranspose_kernel(
                w, stride=self.stride, padding=self.padding,
                pack_in=P, pack_out=Q)
            t_out = (x.shape[1] * P - 1) * self.stride - 2 * self.padding + k
            if t_out % Q:
                raise ValueError(f"packed output length {t_out} not a "
                                 f"multiple of pack_out {Q}")
            hi = t_out // Q - x.shape[1] - tau_min
            y = jax.lax.conv_general_dilated(
                x, Kp.astype(x.dtype), window_strides=(1,),
                padding=[(lo, hi)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=jnp.float32,
                precision=self.precision,
            )
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (cout,))
                y = y + jnp.tile(b, Q).astype(y.dtype)
            return y.astype(x.dtype)

        # (in, out, k) -> flipped WIO (k, in, out)
        w = jnp.flip(w, axis=2).transpose(2, 0, 1)

        p = self.padding if self.pad_mode == "zeros" else 0
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(1,),
            padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
            precision=self.precision,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (cout,))
            y = y + b.astype(y.dtype)
        return y.astype(x.dtype)


class Snake1d(nn.Module):
    """Snake activation ``x + sin^2(alpha*x)/alpha`` with per-channel alpha.

    Reference: models/layers.py:26-41 (torch.jit.script'd for a claimed
    1.4x; here XLA fuses it into neighboring convs, with an optional Pallas
    fused path in ops/snake.py).
    """

    channels: int
    # Polynomial sin^2 (ops/snake.snake_approx): ~6x faster on v5e (snake is
    # sin()-bound), |error| <= 2.6e-7 (within ~2x of f32 sin's own
    # rounding). Decoder default in the fast path; encoder opt-in only,
    # since it is not structurally bit-identical to the exact snake.
    approx: bool = False
    # Time-packed layout (see WNConv1d.time_pack_in): x is (B, T/P, P*C);
    # packed channel phi*C + i carries channel i, so alpha is tiled P times.
    # The alpha param shape stays (channels,) — checkpoint-compatible.
    time_pack: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,))
        if self.time_pack != 1:
            alpha = jnp.tile(alpha, self.time_pack)
        if self.approx:
            return snake_approx(x, alpha)
        return snake(x, alpha.astype(x.dtype))


class ResidualUnit(nn.Module):
    """Snake -> dilated k=7 conv -> Snake -> k=1 conv, with residual add.

    Reference: models/layers.py:52-68. With padding enabled the dilated conv
    is length-preserving so the residual crop is a no-op; with padding
    disabled (streaming) the input is center-cropped to match the shrunken
    output, exactly as the reference's crop.
    """

    dim: int = 16
    dilation: int = 1
    padding: bool = True
    folded: bool = False
    precision: Optional[str] = None
    snake_approx: bool = False  # decoder-side fast snake (see Snake1d.approx)
    time_pack: int = 1  # time-packed layout (padding=True only); params unchanged

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = ((7 - 1) * self.dilation) // 2
        pad_mode = "zeros" if self.padding else "none"
        tp = self.time_pack
        if tp != 1 and not self.padding:
            raise ValueError("time-packed ResidualUnit requires padding=True")
        y = Snake1d(self.dim, approx=self.snake_approx, time_pack=tp,
                    name="snake1")(x)
        y = WNConv1d(
            self.dim, self.dim, kernel_size=7, dilation=self.dilation,
            padding=pad, pad_mode=pad_mode, folded=self.folded,
            precision=self.precision, time_pack_in=tp, time_pack_out=tp,
            name="conv1",
        )(y)
        y = Snake1d(self.dim, approx=self.snake_approx, time_pack=tp,
                    name="snake2")(y)
        y = WNConv1d(self.dim, self.dim, kernel_size=1, folded=self.folded,
                     precision=self.precision, time_pack_in=tp,
                     time_pack_out=tp, name="conv2")(y)
        crop = (x.shape[1] - y.shape[1]) // 2
        if crop > 0:
            x = x[:, crop:-crop, :]
        return x + y


class EncoderBlock(nn.Module):
    """3 ResidualUnits (dilations 1/3/9 at dim/2) + Snake + strided conv.

    Reference: models/layers.py:71-89 (kernel = 2*stride,
    padding = ceil(stride/2)).
    """

    dim: int = 16
    stride: int = 1
    padding: bool = True
    folded: bool = False
    precision: Optional[str] = None
    snake_approx: bool = False  # opt-in fast snake (changes codes slightly)
    # Time-packed layout: input (B, T/tp, tp*half); the strided 'down' conv
    # consumes the packing (requires tp == stride) and emits the normal
    # (B, T/stride, dim) layout, so downstream blocks are untouched.
    time_pack: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        pad_mode = "zeros" if self.padding else "none"
        tp = self.time_pack
        if tp != 1 and tp != self.stride:
            raise ValueError("time-packed EncoderBlock requires "
                             "time_pack == stride (packed output would "
                             "otherwise leak into the next block)")
        for i, dilation in enumerate((1, 3, 9)):
            x = ResidualUnit(
                half, dilation=dilation, padding=self.padding,
                folded=self.folded, precision=self.precision,
                snake_approx=self.snake_approx, time_pack=tp, name=f"res{i}",
            )(x)
        x = Snake1d(half, approx=self.snake_approx, time_pack=tp,
                    name="snake")(x)
        x = WNConv1d(
            half, self.dim,
            kernel_size=2 * self.stride,
            stride=self.stride,
            padding=math.ceil(self.stride / 2),
            pad_mode=pad_mode,
            folded=self.folded,
            precision=self.precision,
            time_pack_in=tp,
            time_pack_out=1,
            name="down",
        )(x)
        return x


class DecoderBlock(nn.Module):
    """Snake + transposed conv (kernel=2*stride) + 3 ResidualUnits.

    Reference: models/layers.py:92-110.
    """

    input_dim: int = 16
    output_dim: int = 8
    stride: int = 1
    padding: bool = True
    folded: bool = False
    snake_approx: bool = False  # decoder-side fast snake (see Snake1d.approx)
    # Time-packed layout (``packed=True``): input (B, T/P, P*input_dim)
    # with P = time_pack_in (P=1 accepts the normal layout); the 'up'
    # transposed conv GROWS the packing to Q = P*stride (upsampling packs
    # more phases per column) and the ResidualUnits run packed at Q. Output
    # is (B, T_out/Q, Q*output_dim) — unpack with a reshape, or chain into
    # another packed block / the packed decoder tail. Params unchanged.
    packed: bool = False
    time_pack_in: int = 1
    # ``packed_up_only``: run ONLY the 'up' transposed conv in the packed
    # layout (dense matmul at stride*output_dim lanes instead of a strided
    # scatter), then unpack before the ResidualUnits — the round-5 retry of
    # the round-4 packed-tail negative, which localized the dp=1 blow-up to
    # the PACKED dilated ResidualUnit convs (kernel-FLOPs x Q of structured
    # zeros), not the up conv itself (BASELINE.md round-4 table).
    packed_up_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad_mode = "zeros" if self.padding else "none"
        tp_in = self.time_pack_in
        tp_out = tp_in * self.stride if (self.packed
                                         or self.packed_up_only) else 1
        if tp_in != 1 and not (self.packed or self.packed_up_only):
            raise ValueError("time_pack_in != 1 requires packed=True")
        if self.packed and self.packed_up_only:
            raise ValueError("packed and packed_up_only are exclusive")
        if (self.packed or self.packed_up_only) and not self.padding:
            raise ValueError("time-packed DecoderBlock requires padding=True")
        x = Snake1d(self.input_dim, approx=self.snake_approx,
                    time_pack=tp_in, name="snake")(x)
        x = WNConvTranspose1d(
            self.input_dim, self.output_dim,
            kernel_size=2 * self.stride,
            stride=self.stride,
            padding=math.ceil(self.stride / 2),
            pad_mode=pad_mode,
            folded=self.folded,
            time_pack_in=tp_in,
            time_pack_out=tp_out,
            name="up",
        )(x)
        if self.packed_up_only and tp_out != 1:
            # unpack (B, U, tp_out*C) -> (B, U*tp_out, C): ResidualUnits
            # run in the native layout
            x = x.reshape(x.shape[0], x.shape[1] * tp_out, self.output_dim)
            tp_out = 1
        for i, dilation in enumerate((1, 3, 9)):
            x = ResidualUnit(
                self.output_dim, dilation=dilation, padding=self.padding,
                folded=self.folded, snake_approx=self.snake_approx,
                time_pack=tp_out, name=f"res{i}",
            )(x)
        return x


class DenoisingBlock(nn.Module):
    """3 ResidualUnits + Snake + k=3 conv (reference: models/layers.py:113-135;
    defined upstream but unused by any model — kept for inventory parity)."""

    dim: int = 16
    padding: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad_mode = "zeros" if self.padding else "none"
        for i, dilation in enumerate((1, 3, 9)):
            x = ResidualUnit(
                self.dim, dilation=dilation, padding=self.padding, name=f"res{i}"
            )(x)
        x = Snake1d(self.dim, name="snake")(x)
        x = WNConv1d(
            self.dim, self.dim, kernel_size=3, stride=1,
            padding=1, pad_mode=pad_mode, name="conv",
        )(x)
        return x
