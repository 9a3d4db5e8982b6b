"""Residual vector quantization: CBR and variable-bitrate (VBR) variants.

Reference: models/quantize.py. TPU-native notes:

  * internal layout is channels-last ``(B, T, D)``; the codebook
    nearest-neighbor search is one ``(B*T, d) @ (d, K)`` matmul on the MXU
    followed by an argmin — no gather-heavy loops.
  * the distance/argmin path runs in float32 regardless of activation dtype
    so codebook indices are bit-stable vs the reference.
  * training-mode batch partitioning (importance/dropout/full-codebook
    samples, reference models/quantize.py:405-414) uses static slice
    boundaries — batch size is static under jit.
  * PRNG keys are threaded explicitly (flax rng collection ``vbr``) instead
    of the reference's global torch RNG.

A fused Pallas kernel for the full Nq-stage loop lives in
``vrvq_tpu.ops.rvq_kernel`` and is numerically validated against this module.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masks import generate_mask_hard, generate_mask_ste
from .importance import ImportanceSubnet
from .wn_dense import WNDense1x1


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize semantics: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _rvq_from_codes(quantizers, codes, mask=None, return_z_q_is=False):
    """Shared codes -> continuous-rep reconstruction for every RVQ variant
    (reference: models/quantize.py:217-249; mask gating is our VBR
    extension — the reference stubs VBR from_codes)."""
    n_codebooks = codes.shape[1]
    z_q = 0.0
    z_p = []
    z_q_is = []
    for i in range(n_codebooks):
        z_p_i = quantizers[i].decode_code(codes[:, i, :])
        z_p.append(z_p_i)
        z_q_i = quantizers[i].out_proj(z_p_i)
        if mask is not None:
            z_q_i = z_q_i * mask[:, i, :, None]
        z_q = z_q + z_q_i
        if return_z_q_is:
            z_q_is.append(z_q_i)
    z_p = jnp.concatenate(z_p, axis=2)
    if return_z_q_is:
        return z_q, z_p, codes, jnp.stack(z_q_is, axis=1)
    return z_q, z_p, codes


def _rvq_from_latents(quantizers, codebook_dims, latents):
    """Shared latents -> (z_q, z_p, codes) for every RVQ variant
    (reference: models/quantize.py:251-285)."""
    dims = [0]
    for d in codebook_dims:
        dims.append(dims[-1] + d)
    n_codebooks = 0
    for i in range(len(dims)):
        if dims[i] <= latents.shape[2]:
            n_codebooks = i
    z_q = 0.0
    z_p = []
    codes = []
    for i in range(n_codebooks):
        j, k = dims[i], dims[i + 1]
        z_p_i, codes_i = quantizers[i].decode_latents(latents[:, :, j:k])
        z_p.append(z_p_i)
        codes.append(codes_i)
        z_q = z_q + quantizers[i].out_proj(z_p_i)
    return z_q, jnp.concatenate(z_p, axis=2), jnp.stack(codes, axis=1)


class VectorQuantize(nn.Module):
    """Single factorized-VQ stage (reference: models/quantize.py:21-103).

    1x1-conv in/out projections (weight-normed), L2-normalized encodings and
    codebook for the distance computation (ViT-VQGAN tricks), lookup of the
    *unnormalized* codebook vector, straight-through estimator.
    """

    input_dim: int
    codebook_size: int
    codebook_dim: int

    def setup(self):
        self.in_proj = WNDense1x1(self.input_dim, self.codebook_dim, name="in_proj")
        self.out_proj = WNDense1x1(self.codebook_dim, self.input_dim, name="out_proj")
        # torch nn.Embedding default init: N(0, 1)
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(stddev=1.0),
            (self.codebook_size, self.codebook_dim),
        )

    def __call__(self, z: jnp.ndarray, loss_per_frame: bool = False):
        """z: (B, T, D_in). Returns (z_q, commitment, codebook_loss, indices, z_e)
        with z_q (B, T, D_in), z_e (B, T, d), indices (B, T)."""
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e)

        diff2 = jnp.square(z_e - jax.lax.stop_gradient(z_q))
        diff2_cb = jnp.square(z_q - jax.lax.stop_gradient(z_e))
        if loss_per_frame:
            commitment = jnp.mean(diff2, axis=2)          # (B, T)
            codebook_loss = jnp.mean(diff2_cb, axis=2)    # (B, T)
        else:
            commitment = jnp.mean(diff2, axis=(1, 2))      # (B,)
            codebook_loss = jnp.mean(diff2_cb, axis=(1, 2))

        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)  # STE
        z_q = self.out_proj(z_q)
        return z_q, commitment, codebook_loss, indices, z_e

    def embed_code(self, embed_id: jnp.ndarray) -> jnp.ndarray:
        """Codebook lookup; embed_id (..., ) -> (..., d)."""
        return jnp.take(self.codebook, embed_id, axis=0)

    def decode_code(self, embed_id: jnp.ndarray) -> jnp.ndarray:
        """(B, T) indices -> (B, T, d) codebook vectors (channels-last)."""
        return self.embed_code(embed_id)

    def decode_latents(self, latents: jnp.ndarray):
        """Nearest-codebook search. latents: (B, T, d).

        The distance matmul + argmin runs in float32 for exact index parity
        (reference: models/quantize.py:87-103). Ties resolve to the first
        index, matching torch ``max``.
        """
        b, t, d = latents.shape
        enc = _l2_normalize(latents.astype(jnp.float32).reshape(b * t, d))
        cb = _l2_normalize(self.codebook.astype(jnp.float32))
        # precision='highest' forces true-f32 MXU passes: the default 3-pass
        # bf16 f32 emulation flips ~1.4% of argmax indices vs exact
        dist = (
            jnp.sum(enc * enc, axis=1, keepdims=True)
            - 2.0 * jnp.dot(enc, cb.T, preferred_element_type=jnp.float32,
                            precision="highest")
            + jnp.sum(cb * cb, axis=1, keepdims=True).T
        )
        indices = jnp.argmax(-dist, axis=1).reshape(b, t)
        z_q = self.decode_code(indices).astype(latents.dtype)
        return z_q, indices


class ResidualVectorQuantize(nn.Module):
    """N sequential VQ stages on the residual (CBR path).

    Reference: models/quantize.py:106-285. Training applies per-sample
    quantizer dropout; eval with ``n_quantizers=k`` runs only k stages
    (static under jit — each k compiles its own tiny program, matching the
    reference's eager break at models/quantize.py:183-184).
    """

    input_dim: int = 512
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0

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

    def __call__(
        self,
        z: jnp.ndarray,
        n_quantizers: Optional[int] = None,
        train: bool = False,
    ):
        """z: (B, T, D). Returns the reference's dict (channels-last inside;
        the top model converts shapes at its public boundary)."""
        bs = z.shape[0]
        z_q = jnp.zeros_like(z)
        residual = z
        commitment_loss = 0.0
        codebook_loss = 0.0
        codebook_indices = []
        latents = []

        if n_quantizers is None:
            n_quantizers = self.n_codebooks

        if train:
            # Per-sample quantizer count with dropout
            # (reference: models/quantize.py:175-180).
            rng = self.make_rng("vbr")
            nq_vec = jnp.full((bs,), self.n_codebooks + 1, dtype=jnp.float32)
            dropout = jax.random.randint(
                rng, (bs,), 1, self.n_codebooks + 1
            ).astype(jnp.float32)
            n_dropout = int(bs * self.quantizer_dropout)
            if n_dropout > 0:
                nq_vec = jnp.concatenate([dropout[:n_dropout], nq_vec[n_dropout:]])
        else:
            nq_vec = None

        n_stages = self.n_codebooks if train else int(n_quantizers)
        for i in range(n_stages):
            quantizer = self.quantizers[i]
            z_q_i, commit_i, cb_i, indices_i, z_e_i = quantizer(residual)
            if train:
                mask = (jnp.full((bs,), float(i)) < nq_vec).astype(z.dtype)
            else:
                mask = jnp.ones((bs,), dtype=z.dtype)
            z_q = z_q + z_q_i * mask[:, None, None]
            residual = residual - z_q_i
            commitment_loss = commitment_loss + jnp.mean(commit_i * mask)
            codebook_loss = codebook_loss + jnp.mean(cb_i * mask)
            codebook_indices.append(indices_i)
            latents.append(z_e_i)

        codes = jnp.stack(codebook_indices, axis=1)       # (B, n, T)
        latents = jnp.concatenate(latents, axis=2)        # (B, T, sum d)
        return {
            "z_q": z_q,
            "codes": codes,
            "latents": latents,
            "commitment_loss": commitment_loss,
            "codebook_loss": codebook_loss,
        }

    def from_codes(self, codes: jnp.ndarray, return_z_q_is: bool = False):
        """codes (B, n, T) -> (z_q (B,T,D), z_p (B,T,sum d), codes[, z_q_is]).

        Reference: models/quantize.py:217-249.
        """
        return _rvq_from_codes(self.quantizers, codes,
                               return_z_q_is=return_z_q_is)

    def from_latents(self, latents: jnp.ndarray):
        """latents (B, T, sum d) -> (z_q, z_p, codes)
        (reference: models/quantize.py:251-285)."""
        return _rvq_from_latents(self.quantizers, self.codebook_dims, latents)


class VBRResidualVectorQuantize(nn.Module):
    """Variable-bitrate RVQ: all Nq stages always run; a per-frame
    importance map gates how many stages each frame keeps.

    Reference: models/quantize.py:288-449. The paper's core contribution.
    """

    input_dim: int = 512
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: Union[int, Sequence[int]] = 8
    quantizer_dropout: float = 0.0
    full_codebook_rate: float = 0.5
    level_min: Optional[float] = None
    level_max: Optional[float] = None
    level_dist: str = "uniform"  # "uniform" | "log_uniform"
    detach_imp_map_input: bool = False
    imp2mask_alpha: float = 1.0
    imp_precision: Union[str, None] = None  # imp-subnet conv precision

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
        self.imp_subnet = ImportanceSubnet(
            d_input=self.input_dim,
            d_feat=self.input_dim,
            intermediate_channels=(512, 128, 32, 8),
            out_channels=1,
            detach_input=self.detach_imp_map_input,
            precision=self.imp_precision,
            name="imp_subnet",
        )

    def __call__(
        self,
        z: jnp.ndarray,
        n_quantizers: Optional[int] = None,
        feat_enc: Optional[jnp.ndarray] = None,
        level: Optional[float] = None,
        train: bool = False,
    ):
        """z, feat_enc: (B, T, D) channels-last.

        VBR mode (n_quantizers None): requires ``level`` (inference) or
        train=True (random levels). CBR mode: ``n_quantizers`` static int.
        Returns the reference dict with channels-last arrays; mask/codes in
        reference orientation (B, Nq, T).
        """
        bs, frames, ch = z.shape
        mode = "VBR" if n_quantizers is None else "CBR"
        if mode == "VBR" and not train and level is None:
            raise ValueError("level must be specified in VBR inference")
        if mode == "CBR" and not (1 <= int(n_quantizers) <= self.n_codebooks):
            raise ValueError(
                f"n_quantizers must be in [1, {self.n_codebooks}], got {n_quantizers}"
            )

        n_stages = self.n_codebooks if mode == "VBR" else int(n_quantizers)

        residual = z
        z_q_is = []
        commit_rows = []
        cb_rows = []
        codebook_indices = []
        latents = []
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

        commitment_loss = jnp.stack(commit_rows, axis=1)  # (B, n, T)
        codebook_loss = jnp.stack(cb_rows, axis=1)

        if mode == "VBR":
            imp_map = self.imp_subnet(feat_enc)  # (B, T_feat, 1)
            imp_map = imp_map.transpose(0, 2, 1)  # (B, 1, T) reference shape
            # Padding-free (streaming) encoders emit a feat 2 frames longer
            # than z (the final k=3 out_conv shrinks unpadded); center-crop
            # so the per-frame map aligns with the latent frames. (The
            # reference never ran VBR in padless mode — compress is a stub.)
            extra = imp_map.shape[-1] - frames
            if extra > 0:
                lo = extra // 2
                imp_map = imp_map[..., lo:lo + frames]
            if train:
                assert self.level_min is not None and self.level_max is not None
                assert self.level_min < self.level_max
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
            mask_imp = generate_mask_ste(
                imp_map_scaled, self.n_codebooks, alpha=self.imp2mask_alpha
            )  # (B, Nq, T)
        else:
            # CBR fallback inside the VBR model: all-ones mask over the
            # n_quantizers stages actually run. (The reference builds a
            # full-Nq ones mask that shape-errors when n_quantizers <
            # n_codebooks, models/quantize.py:397-400+420; we fix that.)
            imp_map = None
            mask_imp = jnp.ones((bs, n_stages, frames), dtype=z.dtype)

        if train:
            # Batch partition: [0:n_imps] importance-masked,
            # [n_imps:n_imps+n_dropout] random-depth, rest full codebooks
            # (reference: models/quantize.py:405-414).
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

        z_q_is_stack = jnp.stack(z_q_is, axis=1)  # (B, n, T, D)
        z_q = jnp.sum(z_q_is_stack * mask_imp[:, :, :, None], axis=1)
        mask_sg = jax.lax.stop_gradient(mask_imp)
        commitment_loss = jnp.mean(jnp.sum(commitment_loss * mask_sg, axis=1))
        codebook_loss = jnp.mean(jnp.sum(codebook_loss * mask_sg, axis=1))

        codes = jnp.stack(codebook_indices, axis=1)  # (B, n, T)
        latents = jnp.concatenate(latents, axis=2)   # (B, T, sum d)
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

    def from_codes(
        self,
        codes: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        return_z_q_is: bool = False,
    ):
        """VBR codes -> continuous representation.

        The reference leaves this NotImplementedError
        (models/quantize.py:445-449); capability parity requires
        codes(+mask) -> audio, so we implement it: ``mask`` (B, Nq, T)
        gates each stage's contribution (1 = keep). With mask=None this is
        the plain CBR reconstruction.
        """
        n_codebooks = codes.shape[1]
        z_q = 0.0
        z_p = []
        z_q_is = []
        for i in range(n_codebooks):
            z_p_i = self.quantizers[i].decode_code(codes[:, i, :])
            z_p.append(z_p_i)
            z_q_i = self.quantizers[i].out_proj(z_p_i)
            if mask is not None:
                z_q_i = z_q_i * mask[:, i, :, None]
            z_q = z_q + z_q_i
            if return_z_q_is:
                z_q_is.append(z_q_i)
        z_p = jnp.concatenate(z_p, axis=2)
        if return_z_q_is:
            return z_q, z_p, codes, jnp.stack(z_q_is, axis=1)
        return z_q, z_p, codes

    def from_latents(self, latents: jnp.ndarray):
        """Same semantics as the CBR ``from_latents`` (the reference raises
        NotImplementedError for VBR, models/quantize.py:448-449)."""
        return _rvq_from_latents(self.quantizers, self.codebook_dims, latents)
