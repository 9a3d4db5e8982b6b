"""DAC_VRVQ: the flagship variable-bitrate neural audio codec.

Reference: models/dac_vrvq.py:19-253. Wires Encoder -> (VBR)RVQ -> Decoder.
Public API keeps the reference's conventions — audio ``(B, 1, T)``, codes
``(B, Nq, T)``, latent dict entries in ``(B, D, T)`` orientation — while all
internal compute is channels-last for the TPU's lane layout. One jit program
per op: ``encode``, ``decode``, ``__call__`` (forward).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import DecoderBlock, EncoderBlock, Snake1d, WNConv1d
from . import codec
from .quantize import ResidualVectorQuantize, VBRResidualVectorQuantize


class Encoder(nn.Module):
    """Conv stack: in-conv k=7 -> EncoderBlocks (dim doubles per stride) ->
    Snake -> k=3 conv to latent_dim (reference: models/dac_vrvq.py:19-48).

    ``return_feat=True`` also returns the activation after the last
    EncoderBlock — the importance subnet's input.
    Channels-last: (B, T, 1) -> (B, T_frames, latent_dim).
    """

    d_model: int = 64
    strides: Sequence[int] = (2, 4, 8, 8)
    latent_dim: int = 512
    padding: bool = True
    compute_dtype: str = "float32"  # 'bfloat16' halves HBM traffic on MXU
    folded: bool = False  # params hold pre-folded kernels (nn/fold.py)
    # None: JAX-default conv precision (bf16 MXU multiplies on TPU, fastest).
    # 'highest': true-f32 convs -> TPU codes match the CPU/torch-exact path
    # bit-for-bit (default precision flips ~2.5% of flagship indices).
    precision: Optional[str] = None
    # Opt-in polynomial snake in the ENCODER: throughput mode that slightly
    # perturbs latents (and hence a small fraction of code indices).
    snake_approx: bool = False
    # Run in_conv + block_0 in a time-packed (space-to-depth x2) layout:
    # the first stage computes at C=d_model (64), half-filling the TPU's
    # 128 lanes — measured 4.9% MXU / 177 ms of the 295 ms flagship turbo
    # encode (the single biggest stage). Packing trades 1.4-8.3x MACs on
    # the dilated convs for full lanes; in_conv emits the packed layout
    # directly and block_0's strided 'down' conv consumes it, so no
    # relayout pass and no other stage changes. Same params; summation
    # order differs at the ulp level -> gated turbo profile only.
    packed: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_feat: bool = False):
        pad_mode = "zeros" if self.padding else "none"
        x = x.astype(jnp.dtype(self.compute_dtype))
        d = self.d_model
        use_pack = self.packed
        if use_pack and (not self.padding or not self.strides
                         or self.strides[0] != 2 or x.shape[1] % 2):
            raise ValueError(
                "packed encoder requires padding=True, strides[0] == 2 and "
                f"an even input length (got strides={self.strides}, "
                f"T={x.shape[1]})")
        if use_pack:
            x = x.reshape(x.shape[0], x.shape[1] // 2, 2 * x.shape[2])
            x = WNConv1d(1, d, kernel_size=7, padding=3, pad_mode=pad_mode,
                         folded=self.folded, precision=self.precision,
                         time_pack_in=2, time_pack_out=2, name="in_conv")(x)
        else:
            x = WNConv1d(1, d, kernel_size=7, padding=3, pad_mode=pad_mode,
                         folded=self.folded, precision=self.precision,
                         name="in_conv")(x)
        for i, stride in enumerate(self.strides):
            d *= 2
            x = EncoderBlock(d, stride=stride, padding=self.padding,
                             folded=self.folded, precision=self.precision,
                             snake_approx=self.snake_approx,
                             time_pack=2 if (use_pack and i == 0) else 1,
                             name=f"block_{i}")(x)
        feat = x
        x = Snake1d(d, approx=self.snake_approx, name="snake")(x)
        x = WNConv1d(d, self.latent_dim, kernel_size=3, padding=1,
                     pad_mode=pad_mode, folded=self.folded,
                     precision=self.precision,
                     name="out_conv")(x)
        # latents always hand off to the quantizer in f32 (index parity)
        x = x.astype(jnp.float32)
        if return_feat:
            return x, feat.astype(jnp.float32)
        return x


class Decoder(nn.Module):
    """Conv stack: in-conv k=7 -> DecoderBlocks (dim halves per rate) ->
    Snake -> k=7 conv -> tanh (reference: models/dac_vrvq.py:51-80).
    Channels-last: (B, T_frames, latent) -> (B, T, 1)."""

    input_channel: int
    channels: int
    rates: Sequence[int]
    d_out: int = 1
    padding: bool = True
    compute_dtype: str = "float32"
    folded: bool = False  # params hold pre-folded kernels (nn/fold.py)
    snake_approx: bool = False  # fast polynomial snake (see Snake1d.approx)
    # Run the last ``packed_blocks`` DecoderBlocks + the tail in the
    # time-packed layout (nn/layers.pack_convtranspose_kernel): the tail
    # stages compute at C<=128 over the FULL audio rate — under-filled
    # lanes, the decoder-side analog of the encoder's measured block_0
    # bottleneck. Packing grows through each upsampling block (x stride),
    # so packed_blocks=1 runs the C=96 region at 2x96 lanes over T/2.
    # Same params; ulp-level summation reorder -> gated profiles only.
    packed_blocks: int = 0
    # Pack ONLY the last ``packed_up_blocks`` blocks' 'up' transposed convs
    # (dense sub-pixel matmul), unpacking before each block's ResidualUnits
    # — the cheap half of the packed-tail layout, without the dilated-conv
    # kernel blow-up that made packed_blocks a measured negative (r4).
    packed_up_blocks: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad_mode = "zeros" if self.padding else "none"
        if self.packed_blocks and self.packed_up_blocks:
            raise ValueError("packed_blocks and packed_up_blocks are "
                             "exclusive")
        if ((self.packed_blocks or self.packed_up_blocks)
                and not self.padding):
            raise ValueError("packed decoder requires padding=True")
        x = x.astype(jnp.dtype(self.compute_dtype))
        x = WNConv1d(self.input_channel, self.channels, kernel_size=7,
                     padding=3, pad_mode=pad_mode, folded=self.folded,
                     name="in_conv")(x)
        output_dim = self.channels
        n_blocks = len(self.rates)
        pack = 1
        for i, stride in enumerate(self.rates):
            input_dim = self.channels // (2 ** i)
            output_dim = self.channels // (2 ** (i + 1))
            packed = i >= n_blocks - self.packed_blocks
            packed_up = i >= n_blocks - self.packed_up_blocks
            x = DecoderBlock(input_dim, output_dim, stride,
                             padding=self.padding, folded=self.folded,
                             snake_approx=self.snake_approx,
                             packed=packed, time_pack_in=pack,
                             packed_up_only=packed_up,
                             name=f"block_{i}")(x)
            if packed:
                pack *= stride
        x = Snake1d(output_dim, approx=self.snake_approx, time_pack=pack,
                    name="snake")(x)
        x = WNConv1d(output_dim, self.d_out, kernel_size=7, padding=3,
                     pad_mode=pad_mode, folded=self.folded,
                     time_pack_in=pack, time_pack_out=pack,
                     name="out_conv")(x)
        if pack != 1:  # unpack (B, T/pack, pack*d_out) -> (B, T, d_out)
            x = x.reshape(x.shape[0], x.shape[1] * pack, self.d_out)
        return jnp.tanh(x).astype(jnp.float32)


class DAC_VRVQ(nn.Module):
    """Reference: models/dac_vrvq.py:83-253.

    model_type selects the CBR ``ResidualVectorQuantize`` or the VBR
    ``VBRResidualVectorQuantize`` (paper core). ``padding=False`` compiles
    the streaming (pad-free) variant used by chunked compress/decompress.
    """

    encoder_dim: int = 64
    encoder_rates: Sequence[int] = (2, 4, 8, 8)
    latent_dim: Optional[int] = None
    decoder_dim: int = 1536
    decoder_rates: Sequence[int] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0
    sample_rate: int = 44100
    model_type: str = "VBR"  # "VBR" | "CBR"
    full_codebook_rate: float = 0.0
    level_min: Optional[float] = None
    level_max: Optional[float] = None
    level_dist: str = "uniform"
    detach_imp_map_input: bool = False
    imp2mask_alpha: float = 1.0
    padding: bool = True
    compute_dtype: str = "float32"  # conv stacks; quantizer stays f32
    # Inference overrides (see infer/fast.py): ``decoder_compute_dtype``
    # lets the decoder run bf16 while the encoder stays f32 (bit-exact
    # codes); ``folded`` switches encoder+decoder to pre-folded kernels
    # from nn/fold.fold_weight_norm (quantizer params are never folded).
    decoder_compute_dtype: Optional[str] = None
    # ``folded`` folds BOTH conv stacks; the per-stack flags let inference
    # fold only the decoder — folding the encoder changes XLA's fusion of
    # the weight-norm rescale and flips ~1.4% of TPU code indices, while
    # buying ~nothing (measured), so make_inference_model leaves the
    # encoder live by default.
    folded: bool = False
    encoder_folded: bool = False
    decoder_folded: bool = False
    # Decoder-only polynomial snake (|sin^2 err| <= 4.5e-6, ~6x faster on
    # v5e where snake is sin()-bound). Never affects encode/codes.
    decoder_snake_approx: bool = False
    # Encoder-side fast snake: opt-in throughput mode; perturbs latents so a
    # small fraction of code indices change (NOT bit-exact vs CPU/torch).
    encoder_snake_approx: bool = False
    # Time-packed first encoder stage (see Encoder.packed): serving-profile
    # layout optimization, same params, ulp-level latent perturbation ->
    # gate with infer.fast.turbo_gate before defaulting.
    encoder_packed: bool = False
    # Time-packed decoder tail (see Decoder.packed_blocks): number of
    # trailing DecoderBlocks (+ the snake/out-conv tail) run in the packed
    # layout. Same params; only the decode waveform shifts at the ulp
    # level (codes are untouched) -> gated serving profiles.
    decoder_packed: int = 0
    # Pack only the trailing blocks' 'up' transposed convs (see
    # Decoder.packed_up_blocks) — the r5 retry after the full packed tail
    # measured negative (the dilated ResidualUnits were the blow-up).
    decoder_packed_up: int = 0
    # ``encode_precision='highest'`` forces true-f32 convs in the encoder and
    # importance subnet so TPU codes match the CPU/torch-exact path
    # bit-for-bit (JAX's default TPU conv precision uses bf16 MXU multiplies,
    # which flips ~2.5% of flagship code indices vs CPU; quantizer
    # projections are always 'highest' regardless). Costs encode speed.
    encode_precision: Optional[str] = None

    @property
    def resolved_latent_dim(self) -> int:
        if self.latent_dim is None:
            return self.encoder_dim * (2 ** len(self.encoder_rates))
        return self.latent_dim

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @property
    def conv_specs(self) -> List[codec.ConvSpec]:
        return codec.model_conv_specs(
            self.encoder_rates,
            self.decoder_rates,
            self.n_codebooks,
            vbr=self.model_type == "VBR",
        )

    @property
    def delay(self) -> int:
        """Receptive delay for padding-free streaming
        (reference: models/dac_vrvq.py:162 via dac_base.get_delay)."""
        return codec.delay(self.conv_specs)

    def get_output_length(self, input_length: int) -> int:
        return codec.output_length(self.conv_specs, input_length)

    def setup(self):
        latent_dim = self.resolved_latent_dim
        self.encoder = Encoder(
            d_model=self.encoder_dim,
            strides=tuple(self.encoder_rates),
            latent_dim=latent_dim,
            padding=self.padding,
            compute_dtype=self.compute_dtype,
            folded=self.folded or self.encoder_folded,
            precision=self.encode_precision,
            snake_approx=self.encoder_snake_approx,
            packed=self.encoder_packed,
            name="encoder",
        )
        if self.model_type == "CBR":
            self.quantizer = ResidualVectorQuantize(
                input_dim=latent_dim,
                n_codebooks=self.n_codebooks,
                codebook_size=self.codebook_size,
                codebook_dim=self.codebook_dim,
                quantizer_dropout=self.quantizer_dropout,
                name="quantizer",
            )
        elif self.model_type == "VBR":
            self.quantizer = VBRResidualVectorQuantize(
                input_dim=latent_dim,
                n_codebooks=self.n_codebooks,
                codebook_size=self.codebook_size,
                codebook_dim=self.codebook_dim,
                quantizer_dropout=self.quantizer_dropout,
                full_codebook_rate=self.full_codebook_rate,
                level_min=self.level_min,
                level_max=self.level_max,
                level_dist=self.level_dist,
                detach_imp_map_input=self.detach_imp_map_input,
                imp2mask_alpha=self.imp2mask_alpha,
                imp_precision=self.encode_precision,
                name="quantizer",
            )
        else:
            raise ValueError(f"Invalid RVQ model_type: {self.model_type}")
        self.decoder = Decoder(
            input_channel=latent_dim,
            channels=self.decoder_dim,
            rates=tuple(self.decoder_rates),
            padding=self.padding,
            compute_dtype=self.decoder_compute_dtype or self.compute_dtype,
            folded=self.folded or self.decoder_folded,
            snake_approx=self.decoder_snake_approx,
            packed_blocks=self.decoder_packed,
            packed_up_blocks=self.decoder_packed_up,
            name="decoder",
        )

    # ----------------------------------------------------------- public API
    def preprocess(self, audio_data: jnp.ndarray,
                   sample_rate: Optional[int] = None) -> jnp.ndarray:
        """Right-pad (B, 1, T) audio to a hop multiple
        (reference: models/dac_vrvq.py:164-173). Static under jit."""
        if sample_rate is None:
            sample_rate = self.sample_rate
        assert sample_rate == self.sample_rate
        length = audio_data.shape[-1]
        right_pad = math.ceil(length / self.hop_length) * self.hop_length - length
        if right_pad:
            audio_data = jnp.pad(audio_data, ((0, 0), (0, 0), (0, right_pad)))
        return audio_data

    def _quantize(self, z, feat, n_quantizers, level, train):
        if self.model_type == "CBR":
            return self.quantizer(z, n_quantizers=n_quantizers, train=train)
        return self.quantizer(
            z, n_quantizers=n_quantizers, feat_enc=feat, level=level,
            train=train,
        )

    def _encode_internal(self, audio_data, n_quantizers, level, train):
        """audio (B, 1, T) -> quantizer dict, channels-last internals."""
        x = audio_data.transpose(0, 2, 1)  # (B, T, 1)
        z, feat = self.encoder(x, return_feat=True)
        return self._quantize(z, feat, n_quantizers, level, train)

    def encode(
        self,
        audio_data: jnp.ndarray,
        n_quantizers: Optional[int] = None,
        level: Optional[float] = 1.0,
        train: bool = False,
    ):
        """audio (B, 1, T) -> reference-shaped dict
        (reference: models/dac_vrvq.py:176-213):
        z_q (B, D, T'), z_q_is (B, Nq, D, T'), codes (B, Nq, T'),
        latents (B, Nq*d, T'), imp_map (B, 1, T'), mask_imp (B, Nq, T')."""
        q = self._encode_internal(audio_data, n_quantizers, level, train)
        out = dict(q)
        out["z_q"] = q["z_q"].transpose(0, 2, 1)
        out["latents"] = q["latents"].transpose(0, 2, 1)
        if "z_q_is" in q:
            out["z_q_is"] = q["z_q_is"].transpose(0, 1, 3, 2)
        return out

    def decode(self, z_q: jnp.ndarray) -> jnp.ndarray:
        """z_q (B, D, T') -> audio (B, 1, T)
        (reference: models/dac_vrvq.py:215-220)."""
        x = self.decoder(z_q.transpose(0, 2, 1))
        return x.transpose(0, 2, 1)

    def decode_from_codes(
        self,
        codes: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """codes (B, Nq, T') [+ VBR mask (B, Nq, T')] -> audio (B, 1, T).
        Completes the codes->audio path the reference stubs out
        (models/dac_base.py:280-281 + models/quantize.py:445-446)."""
        if self.model_type == "VBR":
            z_q = self.quantizer.from_codes(codes, mask=mask)[0]
        else:
            z_q = self.quantizer.from_codes(codes)[0]
        x = self.decoder(z_q)
        return x.transpose(0, 2, 1)

    def __call__(
        self,
        audio_data: jnp.ndarray,
        sample_rate: Optional[int] = None,
        n_quantizers: Optional[int] = None,
        level: Optional[float] = 1.0,
        train: bool = False,
    ):
        """Full forward: preprocess -> encode -> decode, trimmed to the
        input length (reference: models/dac_vrvq.py:222-253)."""
        length = audio_data.shape[-1]
        audio_data = self.preprocess(audio_data, sample_rate)
        q = self._encode_internal(audio_data, n_quantizers, level, train)
        x = self.decoder(q["z_q"])  # (B, T, 1)
        audio = x.transpose(0, 2, 1)[..., :length]
        return {
            "audio": audio,
            "z": q["z_q"].transpose(0, 2, 1),
            "codes": q["codes"],
            "latents": q["latents"].transpose(0, 2, 1),
            "vq/commitment_loss": q["commitment_loss"],
            "vq/codebook_loss": q["codebook_loss"],
            "imp_map": q.get("imp_map", None),
            "mask_imp": q.get("mask_imp", None),
        }
