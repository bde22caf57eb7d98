"""Vector quantization: codebook state + pure encode/decode/forward fns.

Behavioral contract: reference encoder/quantization/core_vq.py + vq.py.
Key quirks preserved (they define what the shipped checkpoints mean):

* The production path is ``infer`` with n_q hard-coded to 1
  (ref: vq.py:115-140).
* ``LanguageVectorQuantization.forward`` does NOT chain residuals — each
  layer quantizes the raw input and the last layer's output wins
  (ref: core_vq.py:378-401) — while ``encode``/``decode`` DO the RVQ loop
  (ref: core_vq.py:403-421).
* Codebook EMA state (cluster_size / embed_avg / inited) is carried
  explicitly; the training update lives in wavtokenizer_tpu.train.

Codebooks for all layers are stored stacked as (n_q, bins, dim) so the
multi-layer loops become batched ops.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.vq import codebook_lookup, nearest_codebook_indices


@dataclass(frozen=True)
class VQConfig:
    """Mirror of ResidualVectorQuantizer args (ref: vq.py:41-58)."""
    dimension: int = 512
    n_q: int = 1
    bins: int = 4096
    decay: float = 0.99
    kmeans_init: bool = True
    kmeans_iters: int = 50
    threshold_ema_dead_code: int = 2
    commitment_weight: float = 1.0

    def bw_per_q(self, frame_rate: int) -> float:
        return math.log2(self.bins) * frame_rate

    def n_q_for_bandwidth(self, frame_rate: int,
                          bandwidth: float | None = None) -> int:
        """Target-bandwidth -> number of quantizers (ref: vq.py:142-152;
        bandwidth is in kbps, e.g. 6.0 = 6 kbps)."""
        if not bandwidth or bandwidth <= 0.0:
            return self.n_q
        return int(max(1, math.floor(bandwidth * 1000 / self.bw_per_q(frame_rate))))


def vq_encode(params: dict, cfg: VQConfig, x: jnp.ndarray,
              n_q: int | None = None) -> jnp.ndarray:
    """RVQ-style encode with residual chaining (ref: core_vq.py:403-413).

    x: (B, T, D).  Returns codes (n_q, B, T) int32.
    """
    n_q = n_q or cfg.n_q
    embed = params["embed"]  # (n_q, bins, dim)
    B, T, D = x.shape
    residual = x
    all_indices = []
    for q in range(n_q):
        flat = residual.reshape(B * T, D)
        idx = nearest_codebook_indices(flat, embed[q]).reshape(B, T)
        all_indices.append(idx)
        quantized = codebook_lookup(idx, embed[q])
        residual = residual - quantized
    return jnp.stack(all_indices)


def vq_decode(params: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """codes: (n_q, B, T) -> (B, T, D), summing layer contributions
    (ref: core_vq.py:415-421)."""
    embed = params["embed"]
    out = 0.0
    for q in range(codes.shape[0]):
        out = out + codebook_lookup(codes[q], embed[q])
    return out


def vq_infer(params: dict, cfg: VQConfig, x: jnp.ndarray,
             frame_rate: int = 25):
    """Production inference: n_q=1 (ref: vq.py:115-140 hard-codes n_q=1).

    x: (B, T, D).  Returns (quantized (B, T, D), codes (1, B, T), penalty 0).

    With n_q=1 the language-VQ forward degenerates to plain single-codebook
    VQ: quantize layer 0, no straight-through (eval), zero commit loss.
    """
    embed = params["embed"]
    B, T, D = x.shape
    flat = x.reshape(B * T, D)
    idx = nearest_codebook_indices(flat, embed[0]).reshape(B, T)
    quantized = codebook_lookup(idx, embed[0])
    penalty = jnp.zeros((), dtype=x.dtype)
    return quantized, idx[None], penalty


def vq_forward_language(params: dict, cfg: VQConfig, x: jnp.ndarray,
                        n_q: int | None = None):
    """Eval-mode LanguageVectorQuantization.forward semantics
    (ref: core_vq.py:378-401): every layer quantizes the SAME input; the
    returned features are the LAST layer's quantization.

    Returns (quantized (B, T, D), codes (n_q, B, T), losses (n_q,)).
    Training (EMA updates, straight-through, commit loss) lives in
    wavtokenizer_tpu.train.vq_state.
    """
    n_q = n_q or cfg.n_q
    embed = params["embed"]
    B, T, D = x.shape
    flat = x.reshape(B * T, D)
    all_idx = []
    quantized_out = None
    for q in range(n_q):
        idx = nearest_codebook_indices(flat, embed[q]).reshape(B, T)
        all_idx.append(idx)
        quantized_out = codebook_lookup(idx, embed[q])
    codes = jnp.stack(all_idx)
    losses = jnp.zeros((n_q,), dtype=x.dtype)
    return quantized_out, codes, losses


def codes_to_features(params: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """Token ids -> summed codebook embeddings (ref: decoder/pretrained.py:209-239).

    codes: (K, B, T) (or (K, T) treated as B=1).  Returns (B, T, D).
    The reference concatenates per-layer codebooks and offsets indices by
    K*bins; that is exactly a per-layer lookup + sum, which is what we do.
    """
    if codes.ndim == 2:
        codes = codes[:, None, :]
    embed = params["embed"]
    K = codes.shape[0]
    assert K <= embed.shape[0], (K, embed.shape)
    out = 0.0
    for q in range(K):
        out = out + codebook_lookup(codes[q], embed[q])
    return out
