"""Full torch oracle model for end-to-end code-index parity testing.

A fresh torch expression of the reference's architecture semantics
(models/layers.py, models/dac_vrvq.py:19-80, models/quantize.py,
models/importance_subnet.py) used as the parity oracle: random-init this,
export its ``state_dict``, convert with
``vrvq_tpu.train.checkpoint.convert_torch_state_dict``, and the JAX model
must produce bit-identical codebook indices (BASELINE.json north-star).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm


def WNConv1d(*args, **kwargs):
    return weight_norm(nn.Conv1d(*args, **kwargs))


def WNConvTranspose1d(*args, **kwargs):
    return weight_norm(nn.ConvTranspose1d(*args, **kwargs))


class Snake1d(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, channels, 1))

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() * torch.sin(self.alpha * x).pow(2)


class ResidualUnit(nn.Module):
    def __init__(self, dim=16, dilation=1):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.block = nn.Sequential(
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=7, dilation=dilation, padding=pad),
            Snake1d(dim),
            WNConv1d(dim, dim, kernel_size=1),
        )

    def forward(self, x):
        y = self.block(x)
        pad = (x.shape[-1] - y.shape[-1]) // 2
        if pad > 0:
            x = x[..., pad:-pad]
        return x + y


class EncoderBlock(nn.Module):
    def __init__(self, dim=16, stride=1):
        super().__init__()
        self.block = nn.Sequential(
            ResidualUnit(dim // 2, 1),
            ResidualUnit(dim // 2, 3),
            ResidualUnit(dim // 2, 9),
            Snake1d(dim // 2),
            WNConv1d(dim // 2, dim, kernel_size=2 * stride, stride=stride,
                     padding=math.ceil(stride / 2)),
        )

    def forward(self, x):
        return self.block(x)


class DecoderBlock(nn.Module):
    def __init__(self, input_dim=16, output_dim=8, stride=1):
        super().__init__()
        self.block = nn.Sequential(
            Snake1d(input_dim),
            WNConvTranspose1d(input_dim, output_dim, kernel_size=2 * stride,
                              stride=stride, padding=math.ceil(stride / 2)),
            ResidualUnit(output_dim, 1),
            ResidualUnit(output_dim, 3),
            ResidualUnit(output_dim, 9),
        )

    def forward(self, x):
        return self.block(x)


class Encoder(nn.Module):
    def __init__(self, d_model=64, strides=(2, 4, 8, 8), latent_dim=512):
        super().__init__()
        blocks = [WNConv1d(1, d_model, kernel_size=7, padding=3)]
        for stride in strides:
            d_model *= 2
            blocks += [EncoderBlock(d_model, stride)]
        blocks += [Snake1d(d_model),
                   WNConv1d(d_model, latent_dim, kernel_size=3, padding=1)]
        self.block = nn.Sequential(*blocks)

    def forward(self, x, return_feat=False):
        n = len(self.block)
        feat = None
        for i, layer in enumerate(self.block):
            x = layer(x)
            if i == n - 3 and return_feat:
                feat = x
        if return_feat:
            return x, feat
        return x


class Decoder(nn.Module):
    def __init__(self, input_channel, channels, rates, d_out=1):
        super().__init__()
        layers = [WNConv1d(input_channel, channels, kernel_size=7, padding=3)]
        for i, stride in enumerate(rates):
            layers += [DecoderBlock(channels // 2 ** i,
                                    channels // 2 ** (i + 1), stride)]
        layers += [Snake1d(channels // 2 ** len(rates)),
                   WNConv1d(channels // 2 ** len(rates), d_out,
                            kernel_size=7, padding=3),
                   nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class VectorQuantize(nn.Module):
    def __init__(self, input_dim, codebook_size, codebook_dim):
        super().__init__()
        self.in_proj = WNConv1d(input_dim, codebook_dim, kernel_size=1)
        self.out_proj = WNConv1d(codebook_dim, input_dim, kernel_size=1)
        self.codebook = nn.Embedding(codebook_size, codebook_dim)

    def decode_latents(self, latents):
        b, d, t = latents.shape
        enc = latents.permute(0, 2, 1).reshape(b * t, d)
        enc = F.normalize(enc)
        cb = F.normalize(self.codebook.weight)
        dist = (enc.pow(2).sum(1, keepdim=True) - 2 * enc @ cb.t()
                + cb.pow(2).sum(1, keepdim=True).t())
        indices = (-dist).max(1)[1].reshape(b, t)
        z_q = F.embedding(indices, self.codebook.weight).transpose(1, 2)
        return z_q, indices

    def forward(self, z):
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e)
        z_q = z_e + (z_q - z_e).detach()
        z_q = self.out_proj(z_q)
        return z_q, indices, z_e


class ImportanceSubnet(nn.Module):
    def __init__(self, d_input, d_feat, intermediate=(512, 128, 32, 8)):
        super().__init__()
        self.in_block = nn.Sequential(
            Snake1d(d_input),
            WNConv1d(d_input, d_feat, kernel_size=3, padding=1),
        )
        ins = [d_feat] + list(intermediate)
        outs = list(intermediate) + [1]
        self.blocks = nn.ModuleList([
            nn.Sequential(Snake1d(i), WNConv1d(i, o, kernel_size=3, padding=1))
            for i, o in zip(ins, outs)
        ])

    def forward(self, x):
        x = self.in_block(x)
        for b in self.blocks:
            x = b(x)
        return torch.sigmoid(x)


class TorchRefModel(nn.Module):
    """Encoder + RVQ (+ imp subnet) + Decoder, eval-mode semantics."""

    def __init__(self, encoder_dim=16, strides=(2, 4, 8, 8), latent_dim=None,
                 decoder_dim=128, rates=(8, 8, 4, 2),
                 n_codebooks=4, codebook_size=64, codebook_dim=4, vbr=True,
                 moe=False):
        super().__init__()
        latent_dim = latent_dim or encoder_dim * 2 ** len(strides)
        self.encoder = Encoder(encoder_dim, strides, latent_dim)
        self.quantizers = nn.ModuleList([
            VectorQuantize(latent_dim, codebook_size, codebook_dim)
            for _ in range(n_codebooks)
        ])
        self.imp_subnet = (
            ImportanceSubnet(latent_dim, latent_dim) if (vbr and not moe)
            else None
        )
        # DAC_MOE's per-frame router over (B, T, D) feat
        # (reference models/dac_moe.py:50,96-99)
        self.router = nn.Linear(latent_dim, n_codebooks) if moe else None
        self.decoder = Decoder(latent_dim, decoder_dim, rates)
        self.n_codebooks = n_codebooks

    @torch.no_grad()
    def encode(self, audio):
        z, feat = self.encoder(audio, return_feat=True)
        residual = z
        z_q = 0
        codes, z_q_is = [], []
        for q in self.quantizers:
            z_q_i, idx, _ = q(residual)
            residual = residual - z_q_i
            z_q = z_q + z_q_i
            codes.append(idx)
            z_q_is.append(z_q_i)
        if self.router is not None:
            imp = self.router(feat.transpose(1, 2)).transpose(1, 2)
        elif self.imp_subnet is not None:
            imp = self.imp_subnet(feat)
        else:
            imp = None
        return {
            "z_q": z_q,
            "codes": torch.stack(codes, 1),
            "z_q_is": torch.stack(z_q_is, 1),
            "imp_map": imp,
        }

    def state_dict_reference_layout(self):
        """Rename keys to the reference checkpoint layout
        (quantizer.quantizers.{i}.*, quantizer.imp_subnet.*)."""
        sd = {}
        for k, v in self.state_dict().items():
            if k.startswith(("quantizers.", "imp_subnet.", "router.")):
                k = "quantizer." + k
            sd[k] = v.detach().numpy()
        return sd
