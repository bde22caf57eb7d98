"""Vector-quantization primitives: fused nearest-neighbor search.

The production encode path is ONE distance matmul + argmax over a
(B*T, 512) x (512, 4096) problem (ref: encoder/quantization/core_vq.py:175-183).
On TPU this is MXU-bound; we keep the exact reference distance formula
    dist = -(||x||^2 - 2 x E^T + ||E||^2)
with f32 accumulation so discrete codes match the torch reference bit-exactly
(argmax tie-break = lowest index, same as torch .max(dim=-1)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_codebook_indices(x: jnp.ndarray, embed: jnp.ndarray,
                             fused: bool | None = None) -> jnp.ndarray:
    """x: (N, D) flattened vectors; embed: (C, D) codebook.  Returns (N,) int32.

    Mirrors EuclideanCodebook.quantize (core_vq.py:175-183).  On TPU the
    fused Pallas kernel (ops.kernels.vq_nearest_fused) keeps the (N, C)
    distance matrix in VMEM; indices carry no gradients either way, so the
    fused path wraps its inputs in stop_gradient.
    """
    if fused is None:
        from .kernels import use_pallas
        fused = use_pallas()
    if fused:
        from .kernels import vq_nearest_fused
        return vq_nearest_fused(jax.lax.stop_gradient(x),
                                jax.lax.stop_gradient(embed))
    x32 = x.astype(jnp.float32)
    e32 = embed.astype(jnp.float32)
    x_sq = jnp.sum(x32 * x32, axis=1, keepdims=True)              # (N, 1)
    e_sq = jnp.sum(e32 * e32, axis=1)[None, :]                    # (1, C)
    xe = jax.lax.dot_general(
        x32, e32,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )                                                             # (N, C)
    dist = -(x_sq - 2.0 * xe + e_sq)
    return jnp.argmax(dist, axis=-1).astype(jnp.int32)


def codebook_lookup(indices: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """Embedding lookup: indices (...,) int -> (..., D)."""
    return jnp.take(embed, indices, axis=0)
