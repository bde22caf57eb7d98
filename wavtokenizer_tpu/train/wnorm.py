"""Weight-norm parametrization for training.

The reference trains SEANet convs and every discriminator conv under torch
weight_norm (w = g * v / ||v||).  To preserve those optimization dynamics we
keep (v, g) as the trainable leaves and fold on the fly inside the loss —
gradients flow through the fold exactly like torch's reparametrization.

Convention: a conv param dict in *training* form is
    {"v": kernel-shaped array, "g": broadcast-shaped array, "bias": ...}
where g's shape encodes the norm axes: norm is taken over every axis where
g has extent 1.  (Conv1d: g=(1,1,O) -> norm over (K,I) per output channel,
matching torch dim=0 on (O,I,K).  ConvTranspose1d: g=(1,I,1) -> norm over
(K,O) per input channel.  Conv2d: g=(1,1,1,O).)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def fold_wn(v: jnp.ndarray, g: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    axes = tuple(i for i, s in enumerate(g.shape) if s == 1)
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return v * (g / (norm + eps))


def fold_tree(tree):
    """Recursively convert {v, g, bias} conv dicts into {kernel, bias}."""
    if isinstance(tree, dict):
        if "v" in tree and "g" in tree:
            out = {"kernel": fold_wn(tree["v"], tree["g"])}
            if "bias" in tree:
                out["bias"] = tree["bias"]
            return out
        return {k: fold_tree(x) for k, x in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(fold_tree(x) for x in tree)
    return tree


def _wn_from_kernel(kernel: np.ndarray, dim_axis: int) -> dict:
    """kernel -> {v, g} with g = ||kernel|| along the non-dim axes (torch's
    weight_norm init makes the folded weight equal the original)."""
    axes = tuple(i for i in range(kernel.ndim) if i != dim_axis)
    g = np.sqrt((kernel.astype(np.float64) ** 2).sum(axis=axes, keepdims=True))
    return {"v": kernel, "g": g.astype(np.float32)}


def weight_norm_conv(params: dict, transposed: bool = False) -> dict:
    """{kernel,(bias)} -> {v,g,(bias)} for our (K, I, O) conv layout."""
    dim_axis = 1 if transposed else 2  # torch dim=0: O for conv, I for convtr
    out = _wn_from_kernel(params["kernel"], dim_axis)
    if params.get("bias") is not None:
        out["bias"] = params["bias"]
    return out


def weight_norm_conv2d(params: dict) -> dict:
    """{kernel (Kh,Kw,I,O)} -> {v,g,(bias)}; torch dim=0 == our O axis 3."""
    out = _wn_from_kernel(params["kernel"], 3)
    if params.get("bias") is not None:
        out["bias"] = params["bias"]
    return out


def seanet_to_weight_norm(params: list, specs) -> list:
    """Convert a folded SEANet param list into training (v,g) form."""
    out = []
    for p, spec in zip(params, specs):
        if spec.kind == "conv":
            out.append(weight_norm_conv(p))
        elif spec.kind == "convtr":
            out.append(weight_norm_conv(p, transposed=True))
        elif spec.kind == "resblock":
            q = {"block": [weight_norm_conv(c) for c in p["block"]]}
            if "shortcut" in p:
                q["shortcut"] = weight_norm_conv(p["shortcut"])
            out.append(q)
        else:
            out.append(p)
    return out
