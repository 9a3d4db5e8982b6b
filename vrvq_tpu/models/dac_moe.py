"""DAC_MOE: the router-gated ("MOE") variant of the VBR codec.

Reference: models/dac_moe.py. Identical skeleton to DAC_VRVQ but the
importance scores come from a per-frame linear router
``Linear(input_dim, n_codebooks)`` over the encoder feature instead of the
conv ImportanceSubnet, masked via the 0.5-thresholded STE with the first
Ns=2 stages forced on (models/utils.py:34-43). (The reference also leaks a
debug ``print(mask_imp)`` at models/dac_moe.py:122 — not reproduced.)
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.masks import generate_mask_hard, generate_mask_ste_moe
from . import codec
from .dac_vrvq import Decoder, Encoder
from .quantize import ResidualVectorQuantize, VectorQuantize


class MOEResidualVectorQuantize(nn.Module):
    """Reference: models/dac_moe.py:18-176."""

    input_dim: int = 512
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0
    full_codebook_rate: float = 0.5
    level_min: float = 1.0
    level_max: float = 1.0
    level_dist: str = "uniform"
    detach_imp_map_input: bool = False
    imp2mask_alpha: float = 1.0

    @property
    def codebook_dims(self) -> List[int]:
        if isinstance(self.codebook_dim, int):
            return [self.codebook_dim] * self.n_codebooks
        return list(self.codebook_dim)

    def setup(self):
        self.quantizers = [
            VectorQuantize(
                self.input_dim, self.codebook_size, self.codebook_dims[i],
                name=f"quantizers_{i}",
            )
            for i in range(self.n_codebooks)
        ]
        self.router = nn.Dense(self.n_codebooks, name="router")

    def __call__(
        self,
        z: jnp.ndarray,
        n_quantizers: Optional[int] = None,
        feat_enc: Optional[jnp.ndarray] = None,
        level: Optional[float] = 1.0,
        train: bool = False,
    ):
        bs, frames, ch = z.shape
        mode = "VBR" if n_quantizers is None else "CBR"
        n_stages = self.n_codebooks if mode == "VBR" else int(n_quantizers)

        residual = z
        z_q_is, commit_rows, cb_rows, codebook_indices, latents = [], [], [], [], []
        for i in range(n_stages):
            z_q_i, commit_i, cb_i, indices_i, z_e_i = self.quantizers[i](
                residual, loss_per_frame=True
            )
            z_q_is.append(z_q_i)
            residual = residual - z_q_i
            commit_rows.append(commit_i)
            cb_rows.append(cb_i)
            codebook_indices.append(indices_i)
            latents.append(z_e_i)

        commitment_loss = jnp.stack(commit_rows, axis=1)
        codebook_loss = jnp.stack(cb_rows, axis=1)

        if mode == "VBR":
            # feat_enc (B, T, D) -> per-frame scores (B, Nq, T)
            # (reference: models/dac_moe.py:96-99)
            imp_map = self.router(feat_enc).transpose(0, 2, 1)
            extra = imp_map.shape[-1] - frames
            if extra > 0:  # padless encoder: align feat frames to z frames
                lo = extra // 2
                imp_map = imp_map[..., lo:lo + frames]
            if train:
                assert self.level_min <= self.level_max
                rng = self.make_rng("vbr")
                u = jax.random.uniform(rng, (bs, 1, 1), dtype=z.dtype)
                if self.level_dist == "uniform":
                    random_levels = u * (self.level_max - self.level_min) + self.level_min
                elif self.level_dist == "log_uniform":
                    random_levels = jnp.exp(
                        u * (math.log(self.level_max) - math.log(self.level_min))
                        + math.log(self.level_min)
                    )
                else:
                    raise ValueError("Invalid level_dist")
                imp_map_scaled = imp_map * random_levels * self.n_codebooks
            else:
                imp_map_scaled = imp_map * level * self.n_codebooks
            mask_imp = generate_mask_ste_moe(
                imp_map_scaled, self.n_codebooks, alpha=self.imp2mask_alpha
            )
        else:
            imp_map = None
            mask_imp = jnp.ones((bs, n_stages, frames), dtype=z.dtype)

        if train:
            rng_d = self.make_rng("vbr_dropout")
            n_full = int(bs * self.full_codebook_rate)
            n_dropout = int(bs * self.quantizer_dropout)
            n_imps = bs - n_full - n_dropout
            parts = [mask_imp[:n_imps]]
            if n_dropout > 0:
                depths = jax.random.randint(
                    rng_d, (n_dropout, 1, 1), 1, self.n_codebooks + 1
                ).astype(z.dtype)
                depths = jnp.broadcast_to(depths, (n_dropout, 1, frames))
                parts.append(
                    jax.lax.stop_gradient(
                        generate_mask_hard(depths, mask_imp.shape[1])
                    )
                )
            if n_full > 0:
                parts.append(
                    jnp.ones((n_full, mask_imp.shape[1], frames), dtype=z.dtype)
                )
            mask_imp = jnp.concatenate(parts, axis=0)
        else:
            n_imps = bs

        z_q_is_stack = jnp.stack(z_q_is, axis=1)
        z_q = jnp.sum(z_q_is_stack * mask_imp[:, :, :, None], axis=1)
        mask_sg = jax.lax.stop_gradient(mask_imp)
        commitment_loss = jnp.mean(jnp.sum(commitment_loss * mask_sg, axis=1))
        codebook_loss = jnp.mean(jnp.sum(codebook_loss * mask_sg, axis=1))

        codes = jnp.stack(codebook_indices, axis=1)
        latents = jnp.concatenate(latents, axis=2)
        imp_map_out = imp_map[:n_imps] if imp_map is not None else None

        return {
            "z_q": z_q,
            "z_q_is": z_q_is_stack,
            "codes": codes,
            "latents": latents,
            "commitment_loss": commitment_loss,
            "codebook_loss": codebook_loss,
            "imp_map": imp_map_out,
            "mask_imp": mask_imp,
        }

    def from_latents(self, latents: jnp.ndarray):
        """latents (B, T, sum d) -> (z_q, z_p, codes); same capability
        extension as the VBR quantizer (reference raises NotImplementedError,
        models/dac_moe.py:175-176)."""
        from .quantize import _rvq_from_latents

        return _rvq_from_latents(self.quantizers, self.codebook_dims, latents)

    def from_codes(self, codes, mask=None, return_z_q_is=False):
        """codes(+mask) -> continuous rep (reference stubs this out)."""
        from .quantize import _rvq_from_codes

        return _rvq_from_codes(self.quantizers, codes, mask=mask,
                               return_z_q_is=return_z_q_is)


class DAC_MOE(nn.Module):
    """Reference: models/dac_moe.py:178-347."""

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
    model_type: str = "VBR"
    full_codebook_rate: float = 0.0
    level_min: float = 1.0
    level_max: float = 1.0
    level_dist: str = "uniform"
    detach_imp_map_input: bool = False
    imp2mask_alpha: float = 1.0
    padding: bool = True
    compute_dtype: str = "float32"
    decoder_compute_dtype: Optional[str] = None  # see DAC_VRVQ / infer/fast.py
    folded: bool = False
    encoder_folded: bool = False  # see DAC_VRVQ.encoder_folded
    decoder_folded: bool = False  # see DAC_VRVQ.decoder_folded
    encode_precision: Optional[str] = None  # see DAC_VRVQ.encode_precision
    decoder_snake_approx: bool = False  # see DAC_VRVQ.decoder_snake_approx
    encoder_snake_approx: bool = False  # see DAC_VRVQ.encoder_snake_approx
    encoder_packed: bool = False  # see DAC_VRVQ.encoder_packed
    decoder_packed: int = 0  # see DAC_VRVQ.decoder_packed
    decoder_packed_up: int = 0  # see DAC_VRVQ.decoder_packed_up

    @property
    def resolved_latent_dim(self) -> int:
        if self.latent_dim is None:
            return self.encoder_dim * (2 ** len(self.encoder_rates))
        return self.latent_dim

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))

    @property
    def conv_specs(self):
        # MOE router is a Linear, not a conv, so the delay walk only sees
        # the encoder/decoder/projection convs.
        return codec.model_conv_specs(
            self.encoder_rates, self.decoder_rates, self.n_codebooks, vbr=False
        )

    @property
    def delay(self) -> int:
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
            self.quantizer = MOEResidualVectorQuantize(
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

    def preprocess(self, audio_data, sample_rate=None):
        if sample_rate is None:
            sample_rate = self.sample_rate
        assert sample_rate == self.sample_rate
        length = audio_data.shape[-1]
        right_pad = math.ceil(length / self.hop_length) * self.hop_length - length
        if right_pad:
            audio_data = jnp.pad(audio_data, ((0, 0), (0, 0), (0, right_pad)))
        return audio_data

    def _encode_internal(self, audio_data, n_quantizers, level, train):
        x = audio_data.transpose(0, 2, 1)
        z, feat = self.encoder(x, return_feat=True)
        if self.model_type == "CBR":
            return self.quantizer(z, n_quantizers=n_quantizers, train=train)
        return self.quantizer(
            z, n_quantizers=n_quantizers, feat_enc=feat, level=level,
            train=train,
        )

    def encode(self, audio_data, n_quantizers=None, level=1.0, train=False):
        q = self._encode_internal(audio_data, n_quantizers, level, train)
        out = dict(q)
        out["z_q"] = q["z_q"].transpose(0, 2, 1)
        out["latents"] = q["latents"].transpose(0, 2, 1)
        if "z_q_is" in q:
            out["z_q_is"] = q["z_q_is"].transpose(0, 1, 3, 2)
        return out

    def decode(self, z_q):
        x = self.decoder(z_q.transpose(0, 2, 1))
        return x.transpose(0, 2, 1)

    def decode_from_codes(self, codes, mask=None):
        """codes (B, Nq, T') [+ mask] -> audio (B, 1, T); same capability
        extension as DAC_VRVQ.decode_from_codes."""
        if self.model_type == "VBR":
            z_q = self.quantizer.from_codes(codes, mask=mask)[0]
        else:
            z_q = self.quantizer.from_codes(codes)[0]
        x = self.decoder(z_q)
        return x.transpose(0, 2, 1)

    def __call__(self, audio_data, sample_rate=None, n_quantizers=None,
                 level=1.0, train=False):
        length = audio_data.shape[-1]
        audio_data = self.preprocess(audio_data, sample_rate)
        q = self._encode_internal(audio_data, n_quantizers, level, train)
        x = self.decoder(q["z_q"])
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
