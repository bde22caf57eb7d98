"""Streaming transformer + token LM for entropy coding.

Behavioral contract: reference encoder/modules/transformer.py:16-120
(StreamingTransformerEncoder: sinusoidal positions with offset, per-layer
KV state carried across calls, causal mask limited to `past_context`) and
encoder/model.py:27-65 (LMModel: per-codebook embeddings summed, shared
trunk, per-codebook linear heads, softmax over the cardinality).

Present-but-unused in shipped WavTokenizer configs (SURVEY.md §2.1); kept
for EnCodec-compression parity.  The torch version streams by growing
python-side state lists; here the state is a fixed-size (past_context) ring
carried as an explicit array, which keeps shapes static under jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class StreamingTransformerConfig:
    dim: int = 200
    hidden_scale: float = 4.0
    num_heads: int = 8
    num_layers: int = 5
    max_period: float = 10000.0
    past_context: int = 1000
    gelu: bool = True
    norm_in: bool = True


@dataclass(frozen=True)
class LMConfig:
    n_q: int = 32
    card: int = 1024
    transformer: StreamingTransformerConfig = StreamingTransformerConfig()


def create_sin_embedding(positions: jnp.ndarray, dim: int,
                         max_period: float = 10000.0) -> jnp.ndarray:
    """(1, T, 1) positions -> (1, T, dim) (ref: transformer.py:16-27)."""
    half_dim = dim // 2
    adim = jnp.arange(half_dim).reshape(1, 1, -1)
    phase = positions / (max_period ** (adim / (half_dim - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


def _linear(rng, cin, cout):
    bound = 1.0 / np.sqrt(cin)
    return {"weight": rng.uniform(-bound, bound, (cin, cout)).astype(np.float32),
            "bias": rng.uniform(-bound, bound, (cout,)).astype(np.float32)}


def _ln(c):
    return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}


def init_streaming_transformer(cfg: StreamingTransformerConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    d, h = cfg.dim, int(cfg.dim * cfg.hidden_scale)
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "in_proj": _linear(rng, d, 3 * d),
            "out_proj": _linear(rng, d, d),
            "ln1": _ln(d), "ln2": _ln(d),
            "ff1": _linear(rng, d, h), "ff2": _linear(rng, h, d),
        })
    p = {"layers": layers}
    if cfg.norm_in:
        p["norm_in"] = _ln(d)
    return p


def init_lm(cfg: LMConfig, seed: int = 0):
    rng = np.random.default_rng(seed)
    d = cfg.transformer.dim
    return {
        "transformer": init_streaming_transformer(cfg.transformer, seed),
        "emb": [rng.normal(0, 1, (cfg.card + 1, d)).astype(np.float32)
                for _ in range(cfg.n_q)],
        "linears": [_linear(rng, d, cfg.card) for _ in range(cfg.n_q)],
    }


def _layer_norm(x, p, eps=1e-5):
    """torch nn.LayerNorm semantics (default eps 1e-5 — the transformer
    layers' value; the ConvNeXt stack uses 1e-6 via models.vocos)."""
    from .vocos import layer_norm
    return layer_norm(x, p["weight"], p["bias"], eps=eps)


def _streaming_attention(p, x, x_past, past_context, num_heads, offset):
    """Self-attention over [past, current] with the reference's validity mask
    (ref: transformer.py:44-59): key position within `past_context` behind the
    query and not in the future.

    ``x_past`` is a FIXED-length (B, past_context, D) rolling buffer; slots
    holding pre-history padding are masked out via their absolute position
    (offset - past_context + j < 0), so shapes stay static under jit from
    the first streamed frame (the torch reference instead grows a python
    list per call, transformer.py:103-120)."""
    B, T, D = x.shape
    H_len = x_past.shape[1]
    qkv_w = p["in_proj"]["weight"]
    qkv_b = p["in_proj"]["bias"]
    wq, wk, wv = jnp.split(qkv_w, 3, axis=1)
    bq, bk, bv = jnp.split(qkv_b, 3)
    keys_in = jnp.concatenate([x_past, x], axis=1)
    q = x @ wq + bq
    k = keys_in @ wk + bk
    v = keys_in @ wv + bv
    H = num_heads
    q = q.reshape(B, T, H, D // H)
    k = k.reshape(B, T + H_len, H, D // H)
    v = v.reshape(B, T + H_len, H, D // H)

    # Absolute positions: past slot j = offset - H_len + j, current t =
    # offset + t.  The reference's initial state is ONE zero timestep that
    # its relative mask treats as a real (attended) token
    # (transformer.py:105 zeros_like(x[:, :1]) + :52-59) — it behaves as a
    # token at absolute position -1 until `past_context` tokens age it out.
    # Slots below -1 are our pre-history padding and must stay masked.
    q_pos = offset + jnp.arange(T).reshape(-1, 1)
    k_pos = (offset - H_len) + jnp.arange(T + H_len).reshape(1, -1)
    delta = q_pos - k_pos
    valid = (delta >= 0) & (delta <= past_context) & (k_pos >= -1)

    w = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(D // H)
    w = jnp.where(valid[None, None], w, -jnp.inf)
    w = jax.nn.softmax(w, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", w, v).reshape(B, T, D)
    return o @ p["out_proj"]["weight"] + p["out_proj"]["bias"]


def streaming_transformer(params: dict, cfg: StreamingTransformerConfig,
                          x: jnp.ndarray, states: list | None = None,
                          offset: int = 0):
    """x: (B, T, D).  Returns (y, new_states, new_offset)
    (ref: transformer.py:103-120).  Post-LN layer (torch default
    norm_first=False): LN(x + attn), LN(x + ff)."""
    B, T, C = x.shape
    if states is None and isinstance(offset, (int, np.integer)) and offset != 0:
        # Fresh-state buffers are masked by ABSOLUTE position (slots below
        # -1 are pre-history padding); starting a fresh stream at offset>0
        # would expose up to past_context zero slots as real tokens where
        # the reference attends exactly one zero token.  No valid caller
        # does this — reject instead of silently diverging.
        raise ValueError(
            f"states=None implies a fresh stream: offset must be 0, got "
            f"{offset} (resume mid-stream by passing the states returned "
            "from the previous call)")
    if states is None:
        # fixed-size rolling buffers (pre-history = zeros, masked out by
        # absolute position in _streaming_attention) — shapes are static
        # across every streamed call, so the per-frame entropy-coding loop
        # compiles exactly once
        states = [jnp.zeros((B, cfg.past_context, C), x.dtype)
                  for _ in params["layers"]]
    positions = (jnp.arange(T).reshape(1, -1, 1) + offset).astype(x.dtype)
    pos_emb = create_sin_embedding(positions, C, cfg.max_period)
    if "norm_in" in params:
        x = _layer_norm(x, params["norm_in"])
    x = x + pos_emb

    # F.gelu in the reference (transformer.py:86) is the exact erf form —
    # jax.nn.gelu defaults to the tanh approximation, which would skew the
    # entropy coder's quantized CDFs off the reference's
    act = ((lambda v: jax.nn.gelu(v, approximate=False)) if cfg.gelu
           else jax.nn.relu)
    new_states = []
    for lp, st in zip(params["layers"], states):
        sa_in = x
        x = _layer_norm(x + _streaming_attention(lp, x, st, cfg.past_context,
                                                 cfg.num_heads, offset),
                        lp["ln1"])
        ff = act(x @ lp["ff1"]["weight"] + lp["ff1"]["bias"])
        ff = ff @ lp["ff2"]["weight"] + lp["ff2"]["bias"]
        x = _layer_norm(x + ff, lp["ln2"])
        new_st = jnp.concatenate([st, sa_in], axis=1)[:, -cfg.past_context:, :]
        new_states.append(new_st)
    return x, new_states, offset + T


def lm_forward(params: dict, cfg: LMConfig, indices: jnp.ndarray,
               states: list | None = None, offset: int = 0):
    """indices: (B, K, T) shifted token ids (0 = missing).  Returns
    (probabilities (B, card, K, T), states, offset)
    (ref: encoder/model.py:46-65)."""
    B, K, T = indices.shape
    x = sum(jnp.take(params["emb"][k], indices[:, k], axis=0) for k in range(K))
    out, states, offset = streaming_transformer(params["transformer"],
                                                cfg.transformer, x, states,
                                                offset)
    logits = jnp.stack([out @ params["linears"][k]["weight"]
                        + params["linears"][k]["bias"] for k in range(K)],
                       axis=1)                       # (B, K, T, card)
    probs = jax.nn.softmax(jnp.transpose(logits, (0, 3, 1, 2)), axis=1)
    return probs, states, offset
