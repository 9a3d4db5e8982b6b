"""Memory-bounded chunked decoding under jit.

The one-shot decoder materializes activations for the whole clip — at
batch 32 x 10 s the flagship decoder's transient buffers exceed v5e HBM
(round-1 measured ceiling). ``decode_chunked`` runs the same padded
decoder over fixed-size latent windows inside ``lax.fori_loop``, so peak
activation memory scales with the window, not the clip.

Exactness: each window carries a halo of ``decoder_halo_frames`` latent
frames on both sides (the decoder's receptive radius), and edge windows
are shifted flush to the clip boundary instead of zero-padded, so the
window-internal conv padding coincides with the one-shot decode's own
edge padding. Every kept output sample therefore sees bit-identical
input windows and conv arithmetic, including the first/last samples;
the only deviation from ``model.decode`` is XLA scheduling noise between
the two compiled programs (<1e-6, asserted in tests/test_chunked.py).

Match point: the streaming spec in reference models/dac_base.py:196-284
(chunked windowed codec inference) — here as a statically-shaped XLA
program rather than torch's runtime conv-padding toggles.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models import codec
from ..models.dac_vrvq import Decoder, Encoder


def _decoder_module(model) -> Decoder:
    return Decoder(
        input_channel=model.resolved_latent_dim,
        channels=model.decoder_dim,
        rates=tuple(model.decoder_rates),
        padding=True,
        compute_dtype=(getattr(model, "decoder_compute_dtype", None)
                       or model.compute_dtype),
        folded=(getattr(model, "folded", False)
                or getattr(model, "decoder_folded", False)),
        snake_approx=getattr(model, "decoder_snake_approx", False),
    )


def _encoder_module(model) -> Encoder:
    return Encoder(
        d_model=model.encoder_dim,
        strides=tuple(model.encoder_rates),
        latent_dim=model.resolved_latent_dim,
        padding=True,
        compute_dtype=model.compute_dtype,
        folded=(getattr(model, "folded", False)
                or getattr(model, "encoder_folded", False)),
        snake_approx=getattr(model, "encoder_snake_approx", False),
    )


def _quantizer_module(model):
    from ..models.quantize import (
        ResidualVectorQuantize, VBRResidualVectorQuantize,
    )

    latent_dim = model.resolved_latent_dim
    if model.model_type == "CBR":
        return ResidualVectorQuantize(
            input_dim=latent_dim,
            n_codebooks=model.n_codebooks,
            codebook_size=model.codebook_size,
            codebook_dim=model.codebook_dim,
            quantizer_dropout=model.quantizer_dropout,
        )
    return VBRResidualVectorQuantize(
        input_dim=latent_dim,
        n_codebooks=model.n_codebooks,
        codebook_size=model.codebook_size,
        codebook_dim=model.codebook_dim,
        quantizer_dropout=model.quantizer_dropout,
        full_codebook_rate=model.full_codebook_rate,
        level_min=model.level_min,
        level_max=model.level_max,
        level_dist=model.level_dist,
        detach_imp_map_input=model.detach_imp_map_input,
        imp2mask_alpha=model.imp2mask_alpha,
    )


def _auto_chunk_frames(t: int, cap: int = 512) -> int:
    """Even split of ``t`` frames into the fewest chunks with chunk <= cap.

    An even split minimizes wasted window work: ceil(t/W) windows each pay
    2*halo overhead plus the slack of the last window, so e.g. t=862 is
    ~20% cheaper at W=431 (2 snug windows) than at W=512 (2 windows
    covering 1024 frames). Measured on v5e: 141x -> 166x RTF at b=32x10s.
    """
    n = -(-t // cap)
    return -(-t // n)


def decode_chunked(
    model,
    params,
    z_q: jnp.ndarray,
    chunk_frames: Optional[int] = None,
    halo_frames: Optional[int] = None,
) -> jnp.ndarray:
    """Decode ``z_q (B, D, T')`` -> audio ``(B, 1, T'*hop)`` in windows.

    Jit-safe (static shapes throughout). Falls back to one window when the
    clip is shorter than ``chunk_frames + 2*halo``. ``chunk_frames=None``
    picks an even split with windows capped near 512 frames.
    """
    hop = model.hop_length
    if chunk_frames is None:
        chunk_frames = _auto_chunk_frames(z_q.shape[-1])
    if halo_frames is None:
        halo_frames = codec.decoder_halo_frames(model.decoder_rates)
    decoder = _decoder_module(model)
    dec_params = {"params": params["params"]["decoder"]}

    z = z_q.transpose(0, 2, 1)  # (B, T, D)
    b, t, d = z.shape
    win = chunk_frames + 2 * halo_frames
    if t <= win:
        audio = decoder.apply(dec_params, z)  # (B, T*hop, 1)
        return audio.transpose(0, 2, 1)

    n_chunks = -(-t // chunk_frames)
    out = jnp.zeros((b, t * hop, 1), jnp.float32)

    def body(i, out):
        # window start, shifted flush at the clip edges so edge chunks use
        # the decoder's own zero padding exactly like the one-shot decode
        keep_start = jnp.minimum(i * chunk_frames, t - chunk_frames)
        s = jnp.clip(keep_start - halo_frames, 0, t - win)
        window = jax.lax.dynamic_slice(z, (0, s, 0), (b, win, d))
        y = decoder.apply(dec_params, window)  # (B, win*hop, 1)
        k = (keep_start - s) * hop
        piece = jax.lax.dynamic_slice(y, (0, k, 0), (b, chunk_frames * hop, 1))
        return jax.lax.dynamic_update_slice(out, piece, (0, keep_start * hop, 0))

    out = jax.lax.fori_loop(0, n_chunks, body, out)
    return out.transpose(0, 2, 1)


def encode_chunked(
    model,
    params,
    audio_data: jnp.ndarray,
    n_quantizers: Optional[int] = None,
    level: Optional[float] = 1.0,
    chunk_frames: Optional[int] = None,
    halo_frames: Optional[int] = None,
):
    """Memory-bounded encode: run the ENCODER over latent-aligned audio
    windows (the encoder's early full-rate activations are the other HBM
    ceiling at large batch), then the quantizer/importance subnet on the
    assembled full-length latents (cheap: latent-rate tensors only).

    Same exactness construction as ``decode_chunked``: halo =
    ``encoder_halo_frames`` (receptive radius), edge windows flush with
    the clip boundary. Returns the same dict as ``model.encode`` in eval
    mode. ``audio_data`` (B, 1, T) with T a hop multiple.
    """
    hop = model.hop_length
    if chunk_frames is None:
        chunk_frames = _auto_chunk_frames(audio_data.shape[-1] // hop)
    if halo_frames is None:
        halo_frames = codec.encoder_halo_frames(model.encoder_rates)
    encoder = _encoder_module(model)
    enc_params = {"params": params["params"]["encoder"]}

    x = audio_data.transpose(0, 2, 1)  # (B, T, 1)
    b, t_samples, _ = x.shape
    assert t_samples % hop == 0, "preprocess() to a hop multiple first"
    t = t_samples // hop
    d = model.resolved_latent_dim
    win = chunk_frames + 2 * halo_frames

    if t <= win:
        z, feat = encoder.apply(enc_params, x, return_feat=True)
    else:
        n_chunks = -(-t // chunk_frames)
        z = jnp.zeros((b, t, d), jnp.float32)
        feat = jnp.zeros((b, t, d), jnp.float32)

        def body(i, carry):
            z, feat = carry
            keep = jnp.minimum(i * chunk_frames, t - chunk_frames)
            s = jnp.clip(keep - halo_frames, 0, t - win)
            window = jax.lax.dynamic_slice(
                x, (0, s * hop, 0), (b, win * hop, 1)
            )
            zw, fw = encoder.apply(enc_params, window, return_feat=True)
            k = keep - s
            zp = jax.lax.dynamic_slice(zw, (0, k, 0), (b, chunk_frames, d))
            fp = jax.lax.dynamic_slice(fw, (0, k, 0), (b, chunk_frames, d))
            z = jax.lax.dynamic_update_slice(z, zp, (0, keep, 0))
            feat = jax.lax.dynamic_update_slice(feat, fp, (0, keep, 0))
            return z, feat

        z, feat = jax.lax.fori_loop(0, n_chunks, body, (z, feat))

    quantizer = _quantizer_module(model)
    q_params = {"params": params["params"]["quantizer"]}
    if model.model_type == "CBR":
        q = quantizer.apply(q_params, z, n_quantizers=n_quantizers, train=False)
    else:
        q = quantizer.apply(
            q_params, z, n_quantizers=n_quantizers, feat_enc=feat,
            level=level, train=False,
        )
    out = dict(q)
    out["z_q"] = q["z_q"].transpose(0, 2, 1)
    out["latents"] = q["latents"].transpose(0, 2, 1)
    if "z_q_is" in q:
        out["z_q_is"] = q["z_q_is"].transpose(0, 1, 3, 2)
    return out


def forward_chunked(
    model,
    params,
    audio_data: jnp.ndarray,
    n_quantizers: Optional[int] = None,
    level: Optional[float] = 1.0,
    chunk_frames: Optional[int] = None,
):
    """Memory-bounded encode+decode (eval): the large-batch path for clips
    whose one-shot program exceeds HBM. Returns (audio (B,1,T), codes)."""
    length = audio_data.shape[-1]
    # replicate preprocess()'s static right-pad to a hop multiple
    hop = model.hop_length
    right = (-length) % hop
    if right:
        audio_data = jnp.pad(audio_data, ((0, 0), (0, 0), (0, right)))
    enc = encode_chunked(model, params, audio_data, n_quantizers,
                         level, chunk_frames)
    audio = decode_chunked(model, params, enc["z_q"], chunk_frames)
    return audio[..., :length], enc["codes"]
