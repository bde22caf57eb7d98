"""VQ training-time state machine: k-means init, EMA codebook, dead-code expiry.

Behavioral contract: reference encoder/quantization/core_vq.py training path
(:206-231 EuclideanCodebook.forward, :74-96 kmeans, :159-169 expiry) and the
LanguageVectorQuantization overwrite semantics (:378-401).

The torch version mutates registered buffers and syncs them across DDP
ranks with explicit broadcasts (core_vq.py:151,169).  Here the state
(embed / embed_avg / cluster_size / inited) is threaded explicitly through
the train step; under pjit data sharding the batch statistics are computed
on the logically-global batch, so every replica derives identical state —
the mathematically-consistent upgrade of the reference's broadcast dance.

Faithfully-preserved quirk: in the reference, `expire_codes_` rewrites
`embed`, but `embed` is then unconditionally overwritten by the EMA
normalization at the end of the same forward (core_vq.py:229), so expiry
never actually sticks (the upstream EnCodec reproducibility bug, see
core_vq.py:306-308's commented warning).  We reproduce that exact sequence
by default; set ``effective_expiry=True`` for the fixed behavior (expired
codes' embed_avg/cluster_size are reset so replacements survive).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.quantize import VQConfig
from ..ops.vq import codebook_lookup, nearest_codebook_indices


def sample_vectors(key, samples: jnp.ndarray, num: int) -> jnp.ndarray:
    """Random sample (with permutation when enough samples)
    (ref: core_vq.py:63-71)."""
    n = samples.shape[0]
    if n >= num:
        idx = jax.random.permutation(key, n)[:num]
    else:
        idx = jax.random.randint(key, (num,), 0, n)
    return samples[idx]


def kmeans(key, samples: jnp.ndarray, num_clusters: int, num_iters: int = 10):
    """K-means (ref: core_vq.py:74-96): random-sample init, hard assignment
    by L2, empty clusters keep their previous mean.  Distances use the
    matmul form (same argmin up to fp association).

    Returns (means (C, D), bins (C,))."""
    means = sample_vectors(key, samples, num_clusters)

    def body(_, means):
        buckets = nearest_codebook_indices(samples, means)
        bins = jnp.bincount(buckets, length=num_clusters)
        sums = jax.ops.segment_sum(samples, buckets, num_segments=num_clusters)
        new_means = sums / jnp.maximum(bins, 1)[:, None]
        return jnp.where((bins == 0)[:, None], means, new_means)

    means = jax.lax.fori_loop(0, num_iters, body, means)
    buckets = nearest_codebook_indices(samples, means)
    bins = jnp.bincount(buckets, length=num_clusters)
    return means, bins


def laplace_smoothing(x: jnp.ndarray, n_categories: int,
                      epsilon: float = 1e-5) -> jnp.ndarray:
    return (x + epsilon) / (jnp.sum(x) + n_categories * epsilon)


def _codebook_train_forward(state: dict, cfg: VQConfig, x_flat: jnp.ndarray,
                            key, effective_expiry: bool = False):
    """One EuclideanCodebook training forward (ref: core_vq.py:206-231).

    state: {embed (C,D), embed_avg, cluster_size (C,), inited (1,)} for ONE
    codebook layer.  x_flat: (N, D) global-batch vectors.
    Returns (quantized (N, D), indices (N,), new_state).
    """
    C = cfg.bins
    k_init, k_expire = jax.random.split(key)

    # --- k-means init on the first batch (ref: core_vq.py:140-151) -------
    def do_init(_):
        embed, cluster_size = kmeans(k_init, x_flat, C, cfg.kmeans_iters)
        return embed, embed, cluster_size.astype(jnp.float32)

    def no_init(_):
        return state["embed"], state["embed_avg"], state["cluster_size"]

    inited = state["inited"].reshape(())
    embed, embed_avg, cluster_size = jax.lax.cond(inited > 0, no_init, do_init,
                                                  operand=None)

    # --- quantize ---------------------------------------------------------
    idx = nearest_codebook_indices(x_flat, embed)
    quantized = codebook_lookup(idx, embed)

    # --- expiry (ref: core_vq.py:159-169) --------------------------------
    # NOTE: in the reference this write is clobbered by the EMA
    # normalization below — preserved unless effective_expiry.
    expired = cluster_size < cfg.threshold_ema_dead_code
    replacements = sample_vectors(k_expire, x_flat, C)
    embed = jnp.where(expired[:, None], replacements, embed)
    if effective_expiry:
        embed_avg = jnp.where(expired[:, None], replacements, embed_avg)
        cluster_size = jnp.where(expired,
                                 jnp.full_like(cluster_size,
                                               float(cfg.threshold_ema_dead_code)),
                                 cluster_size)

    # --- EMA updates (ref: core_vq.py:221-229) ---------------------------
    onehot_counts = jnp.bincount(idx, length=C).astype(x_flat.dtype)
    embed_sum = jax.ops.segment_sum(x_flat, idx, num_segments=C)
    decay = cfg.decay
    cluster_size = cluster_size * decay + onehot_counts * (1 - decay)
    embed_avg = embed_avg * decay + embed_sum * (1 - decay)
    smoothed = laplace_smoothing(cluster_size, C) * jnp.sum(cluster_size)
    embed = embed_avg / smoothed[:, None]

    new_state = {"embed": embed, "embed_avg": embed_avg,
                 "cluster_size": cluster_size,
                 "inited": jnp.ones_like(state["inited"])}
    return quantized, idx, new_state


def vq_train_forward(params: dict, cfg: VQConfig, x: jnp.ndarray, key,
                     n_q: int | None = None, effective_expiry: bool = False):
    """LanguageVectorQuantization training forward
    (ref: core_vq.py:378-401 + VectorQuantization.forward :294-315).

    x: (B, T, D).  Every layer quantizes the SAME input (no residual
    chaining); the LAST layer's straight-through output is returned.
    Returns (quantized_st (B,T,D), codes (n_q,B,T), commit_loss scalar,
    new_params).

    The straight-through estimator and commitment loss match
    core_vq.py:301-311: q_st = x + sg(q - x); commit = mse(sg(q_st), x).
    """
    n_q = n_q or cfg.n_q
    n_q = min(n_q, cfg.n_q)
    B, T, D = x.shape
    x_flat = x.reshape(B * T, D)

    keys = jax.random.split(key, n_q)
    new_layers = []
    codes = []
    losses = []
    quantized_out = None
    for q in range(n_q):
        layer_state = {k: v[q] for k, v in params.items()}
        quantized, idx, new_state = _codebook_train_forward(
            layer_state, cfg, x_flat, keys[q], effective_expiry)
        q_st = x_flat + jax.lax.stop_gradient(quantized - x_flat)
        commit = jnp.mean((jax.lax.stop_gradient(q_st) - x_flat) ** 2)
        losses.append(commit * cfg.commitment_weight)
        codes.append(idx.reshape(B, T))
        quantized_out = q_st.reshape(B, T, D)
        new_layers.append(new_state)

    # Stack layer states back; untouched layers (q >= n_q) keep old state.
    new_params = {}
    for k in params:
        rows = [new_layers[q][k] for q in range(n_q)]
        rows += [params[k][q] for q in range(n_q, cfg.n_q)]
        new_params[k] = jnp.stack(rows)

    commit_loss = jnp.mean(jnp.stack(losses))
    return quantized_out, jnp.stack(codes), commit_loss, new_params
