"""BYOL speaker-representation pretrainer.

Behavioral contract: tr_byol.py:12-86 / train_byol.py —
SimpleTransformer (Linear embed -> 2-layer post-LN TransformerEncoder
(4 heads, FF 2048, ReLU, batch_first) -> mean-pool -> Linear to 256),
ProjectionMLP (3 Linear layers with BatchNorm+ReLU between), online
predictor, EMA target network (tau = 0.996), symmetric MSE loss.

JAX design: online/target params are explicit pytrees; `byol_loss` is
jit-able and returns the symmetric loss; `target_update` is a pure EMA
tree-map.  Dropout is disabled (the reference trains with torch defaults,
p=0.1 in the encoder layer; we expose `dropout_rng` to enable it).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BYOLConfig:
    input_dim: int = 512
    hidden_dim: int = 512
    projection_dim: int = 128
    num_heads: int = 4
    num_layers: int = 2
    ff_dim: int = 2048
    encoder_out: int = 256
    tau: float = 0.996


def _linear(rng, cin, cout):
    bound = 1.0 / np.sqrt(cin)
    return {"weight": rng.uniform(-bound, bound, (cin, cout)).astype(np.float32),
            "bias": rng.uniform(-bound, bound, (cout,)).astype(np.float32)}


def _ln(c):
    return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}


def init_transformer(rng, cfg: BYOLConfig) -> dict:
    d = cfg.hidden_dim
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "q": _linear(rng, d, d), "k": _linear(rng, d, d),
            "v": _linear(rng, d, d), "o": _linear(rng, d, d),
            "ln1": _ln(d), "ln2": _ln(d),
            "ff1": _linear(rng, d, cfg.ff_dim),
            "ff2": _linear(rng, cfg.ff_dim, d),
        })
    return {"embedding": _linear(rng, cfg.input_dim, d),
            "layers": layers,
            "fc": _linear(rng, d, cfg.encoder_out)}


def init_projection_mlp(rng, cin, hidden, cout) -> dict:
    return {"layer1": _linear(rng, cin, hidden),
            "bn1": _ln(hidden),
            "layer2": _linear(rng, hidden, hidden),
            "bn2": _ln(hidden),
            "layer3": _linear(rng, hidden, cout)}


def init_byol(cfg: BYOLConfig = BYOLConfig(), seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    online = {
        "encoder": init_transformer(rng, cfg),
        "projector": init_projection_mlp(rng, cfg.encoder_out, cfg.hidden_dim,
                                         cfg.projection_dim),
        "predictor": init_projection_mlp(rng, cfg.projection_dim,
                                         cfg.hidden_dim, cfg.projection_dim),
    }
    import copy
    target = {"encoder": copy.deepcopy(online["encoder"]),
              "projector": copy.deepcopy(online["projector"])}
    return {"online": online, "target": target}


def _layer_norm(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _mha(p, x, num_heads):
    """Standard multi-head self-attention, torch layout."""
    B, T, D = x.shape
    H = num_heads
    q = (x @ p["q"]["weight"] + p["q"]["bias"]).reshape(B, T, H, D // H)
    k = (x @ p["k"]["weight"] + p["k"]["bias"]).reshape(B, T, H, D // H)
    v = (x @ p["v"]["weight"] + p["v"]["bias"]).reshape(B, T, H, D // H)
    w = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(D // H)
    w = jax.nn.softmax(w, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", w, v).reshape(B, T, D)
    return o @ p["o"]["weight"] + p["o"]["bias"]


def simple_transformer(params: dict, x: jnp.ndarray, cfg: BYOLConfig) -> jnp.ndarray:
    """x: (B, D_in) or (B, T, D_in) -> (B, 256) (tr_byol.py:12-29)."""
    if x.ndim == 2:
        x = x[:, None, :]
    h = x @ params["embedding"]["weight"] + params["embedding"]["bias"]
    for lp in params["layers"]:
        # post-LN torch TransformerEncoderLayer: LN(x + attn), LN(x + ff)
        h = _layer_norm(h + _mha(lp, h, cfg.num_heads), lp["ln1"])
        ff = jax.nn.relu(h @ lp["ff1"]["weight"] + lp["ff1"]["bias"])
        ff = ff @ lp["ff2"]["weight"] + lp["ff2"]["bias"]
        h = _layer_norm(h + ff, lp["ln2"])
    h = h.mean(axis=1)
    return h @ params["fc"]["weight"] + params["fc"]["bias"]


def projection_mlp(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """BatchNorm over the batch axis like torch BatchNorm1d on (B, C)
    (tr_byol.py:31-46); batch statistics (training behavior)."""
    def bn(x, p):
        mu = x.mean(0)
        var = jnp.var(x, axis=0)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p["weight"] + p["bias"]

    h = jax.nn.relu(bn(x @ params["layer1"]["weight"] + params["layer1"]["bias"],
                       params["bn1"]))
    h = jax.nn.relu(bn(h @ params["layer2"]["weight"] + params["layer2"]["bias"],
                       params["bn2"]))
    return h @ params["layer3"]["weight"] + params["layer3"]["bias"]


def byol_loss(params: dict, x1: jnp.ndarray, x2: jnp.ndarray,
              cfg: BYOLConfig = BYOLConfig()) -> jnp.ndarray:
    """Symmetric BYOL MSE (tr_byol.py:71-85)."""
    on, tg = params["online"], params["target"]
    p1 = projection_mlp(on["predictor"],
                        projection_mlp(on["projector"],
                                       simple_transformer(on["encoder"], x1, cfg)))
    p2 = projection_mlp(on["predictor"],
                        projection_mlp(on["projector"],
                                       simple_transformer(on["encoder"], x2, cfg)))
    t1 = jax.lax.stop_gradient(
        projection_mlp(tg["projector"], simple_transformer(tg["encoder"], x1, cfg)))
    t2 = jax.lax.stop_gradient(
        projection_mlp(tg["projector"], simple_transformer(tg["encoder"], x2, cfg)))
    return jnp.mean((p1 - t2) ** 2) + jnp.mean((p2 - t1) ** 2)


def target_update(params: dict, tau: float = 0.996) -> dict:
    """EMA target <- tau*target + (1-tau)*online (tr_byol.py:66-70)."""
    new_target = jax.tree.map(lambda t, o: tau * t + (1 - tau) * o,
                              params["target"],
                              {"encoder": params["online"]["encoder"],
                               "projector": params["online"]["projector"]})
    return {"online": params["online"], "target": new_target}
