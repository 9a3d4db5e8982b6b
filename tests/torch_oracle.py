"""Minimal PyTorch oracles for numerical-parity tests.

These are *test fixtures* re-expressing the reference semantics
(weight-normed convs, snake, factorized VQ: reference models/layers.py,
models/quantize.py) directly with torch ops, so the JAX implementation can
be checked bit-for-bit / to float tolerance on CPU without installing the
reference's audiotools dependency stack.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def wn_conv1d(x, v, g, bias, stride=1, padding=0, dilation=1, groups=1):
    """x: (B, C, T); v: (out, in/groups, k); g: (out,). torch weight_norm dim=0."""
    norm = v.reshape(v.shape[0], -1).norm(dim=1).reshape(-1, 1, 1)
    w = v * (g.reshape(-1, 1, 1) / norm)
    return F.conv1d(x, w, bias, stride=stride, padding=padding,
                    dilation=dilation, groups=groups)


def wn_conv_transpose1d(x, v, g, bias, stride=1, padding=0):
    """v: (in, out, k); g: (in,). torch weight_norm dim=0 for ConvTranspose1d."""
    norm = v.reshape(v.shape[0], -1).norm(dim=1).reshape(-1, 1, 1)
    w = v * (g.reshape(-1, 1, 1) / norm)
    return F.conv_transpose1d(x, w, bias, stride=stride, padding=padding)


def wn_conv2d(x, v, g, bias, stride=(1, 1), padding=(0, 0)):
    """v: (out, in, kh, kw); g: (out,)."""
    norm = v.reshape(v.shape[0], -1).norm(dim=1).reshape(-1, 1, 1, 1)
    w = v * (g.reshape(-1, 1, 1, 1) / norm)
    return F.conv2d(x, w, bias, stride=stride, padding=padding)


def snake(x, alpha):
    """alpha: (1, C, 1); x: (B, C, T) (reference models/layers.py:26-32)."""
    return x + (alpha + 1e-9).reciprocal() * torch.sin(alpha * x).pow(2)


def vq_decode_latents(latents, codebook):
    """latents: (B, d, T); codebook: (K, d). Returns (z_q (B,d,T), indices (B,T)).
    Reference models/quantize.py:87-103."""
    b, d, t = latents.shape
    enc = latents.permute(0, 2, 1).reshape(b * t, d)
    enc = F.normalize(enc)
    cb = F.normalize(codebook)
    dist = (
        enc.pow(2).sum(1, keepdim=True)
        - 2 * enc @ cb.t()
        + cb.pow(2).sum(1, keepdim=True).t()
    )
    indices = (-dist).max(1)[1].reshape(b, t)
    z_q = F.embedding(indices, codebook).transpose(1, 2)
    return z_q, indices


def rand_f32(*shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)
