"""Weight-norm folding for inference.

Every conv in the codec is weight-normalized (``w = g * v / ||v||``,
reference models/layers.py:17-22). During training the reparameterization
must stay live, but at inference it is pure overhead: each ``apply``
recomputes every norm and rescale under jit.

``fold_weight_norm`` computes each effective kernel ONCE in f32 and stores
it as a single ``w`` param (optionally cast to bf16, so the MXU sees a
genuine bf16 array in HBM rather than an in-graph cast). The folded param
tree drives the same modules with ``folded=True`` (nn/layers.py), which
skip the norm entirely.

The fold is pure jnp and traceable: ``infer/fast.py`` runs it under ONE
``jax.jit`` so folded params are produced device-side with zero
host<->device traffic. (The original host-numpy fold fetched every conv
kernel to the host and pushed the result back — ~330 MB of decoder params
per ``make_serving_model`` call, which over this container's remote TPU
tunnel dominated serving-model setup and made bench.py's headline phase
hang whenever the tunnel degraded.)

Measured (v5e, flagship, b16 x 10 s): folding alone is ~1% end-to-end (the
norms are tiny next to the convs), and a genuinely-bf16 folded decoder is
speed-NEUTRAL vs f32 — the decode path is HBM/layout-bound, not
MXU-FLOP-bound, confirming round-1's diagnosis. The practical wins are
(a) halved decoder param+activation HBM (lifts the batch-32 x 10 s one-shot
decode OOM) and (b) a single clean inference param tree.

Layout notes: WNConv1d stores ``v`` as WIO ``(k, cin/groups, cout)`` with
``g`` per out-channel; WNConvTranspose1d keeps torch's ``(cin, cout, k)``
with ``g`` per in-channel. The fold preserves each layout, so a folded tree
is structurally identical to the live one except ``{v, g} -> {w}``.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

# Module names whose conv is a WNConvTranspose1d. In this codebase the only
# transposed convs are the DecoderBlock upsamplers (nn/layers.py).
_TRANSPOSED_NAMES = frozenset({"up"})


def _fold_conv(leaf: dict, name: str, dtype) -> dict:
    v = jnp.asarray(leaf["v"], jnp.float32)
    g = jnp.asarray(leaf["g"], jnp.float32)
    if name in _TRANSPOSED_NAMES:
        # (cin, cout, k), g per in-channel
        assert g.shape == (v.shape[0],), (name, v.shape, g.shape)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(1, 2), keepdims=True))
        w = v * (g[:, None, None] / jnp.maximum(norm, 1e-32))
    else:
        # (k, cin/groups, cout), g per out-channel
        assert g.shape == (v.shape[2],), (name, v.shape, g.shape)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
        w = v * (g[None, None, :] / jnp.maximum(norm, 1e-32))
    out = {"w": w.astype(dtype) if dtype is not None else w}
    for k, val in leaf.items():
        if k not in ("v", "g"):
            out[k] = _cast(val, dtype)
    return out


def _cast(x, dtype):
    x = jnp.asarray(x)
    if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(dtype)
    return x


def fold_weight_norm(tree, dtype: Optional[str] = None, _name: str = ""):
    """Fold every ``{v, g}`` weight-norm pair in ``tree`` into an effective
    kernel ``w`` (computed in f32), casting all floating leaves to ``dtype``
    when given (e.g. ``'bfloat16'``). Pass a module subtree — e.g.
    ``params['params']['decoder']`` — or a whole param tree."""
    dt = jnp.dtype(dtype) if dtype is not None else None
    if isinstance(tree, dict):
        if "v" in tree and "g" in tree:
            return _fold_conv(tree, _name, dt)
        return {k: fold_weight_norm(v, dtype, k) for k, v in tree.items()}
    return _cast(tree, dt)
