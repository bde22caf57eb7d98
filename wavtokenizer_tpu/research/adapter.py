"""Feature-enhancement adapter (the fork's noisy->clean restoration layer).

Behavioral contract: try3.py:19-90 / tsne.py:89-150 —
frozen SEANet encoder -> trainable adapter (1x1 conv 512->256, BatchNorm,
ReLU, 2x ResidualBlock(256) [conv3-BN-ReLU-conv3-BN + res + ReLU], 1x1 conv
256->512, ReLU) -> SEANet decoder (bypassing VQ and the Vocos stack).
try3 fine-tunes the decoder too; tsne freezes it and trains the adapter
against clean-audio target features.

BatchNorm running statistics are explicit state threaded through the apply
function (JAX style); ``train=True`` uses batch statistics and returns the
updated running stats, ``train=False`` uses the stored ones.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv1d


@dataclass(frozen=True)
class AdapterConfig:
    encoder_dim: int = 512
    hidden: int = 256
    num_residual_blocks: int = 2
    bn_momentum: float = 0.1  # torch BatchNorm1d default
    bn_eps: float = 1e-5


def _bn_init(c):
    return {"weight": np.ones(c, np.float32), "bias": np.zeros(c, np.float32)}


def _bn_state_init(c):
    return {"mean": np.zeros(c, np.float32), "var": np.ones(c, np.float32)}


def _conv_default(rng, k, cin, cout):
    bound = 1.0 / np.sqrt(cin * k)
    return {"kernel": rng.uniform(-bound, bound, (k, cin, cout)).astype(np.float32),
            "bias": rng.uniform(-bound, bound, (cout,)).astype(np.float32)}


def init_adapter(cfg: AdapterConfig = AdapterConfig(), seed: int = 0):
    """Returns (params, bn_state)."""
    rng = np.random.default_rng(seed)
    h = cfg.hidden
    params = {
        "adapter_conv": _conv_default(rng, 1, cfg.encoder_dim, h),
        "adapter_bn": _bn_init(h),
        "blocks": [],
        "out_conv": _conv_default(rng, 1, h, cfg.encoder_dim),
    }
    state = {"adapter_bn": _bn_state_init(h), "blocks": []}
    for _ in range(cfg.num_residual_blocks):
        params["blocks"].append({
            "conv1": _conv_default(rng, 3, h, h), "bn1": _bn_init(h),
            "conv2": _conv_default(rng, 3, h, h), "bn2": _bn_init(h),
        })
        state["blocks"].append({"bn1": _bn_state_init(h),
                                "bn2": _bn_state_init(h)})
    return params, state


def _batch_norm(x, p, s, train: bool, momentum: float, eps: float):
    """BatchNorm1d over (B, T, C): stats over (B, T) per channel."""
    if train:
        mean = jnp.mean(x, axis=(0, 1))
        var = jnp.var(x, axis=(0, 1))
        n = x.shape[0] * x.shape[1]
        unbiased = var * n / max(n - 1, 1)
        new_s = {"mean": (1 - momentum) * s["mean"] + momentum * mean,
                 "var": (1 - momentum) * s["var"] + momentum * unbiased}
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    y = (x - mean) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]
    return y, new_s


def apply_adapter(params: dict, state: dict, x: jnp.ndarray, train: bool = False,
                  cfg: AdapterConfig = AdapterConfig()):
    """x: (B, T', 512) encoder features -> (enhanced (B, T', 512), new_state).

    Mirrors EnhancedFeatureExtractor.forward (try3.py:64-80): conv -> BN ->
    ReLU -> residual blocks -> conv -> ReLU.
    """
    m, eps = cfg.bn_momentum, cfg.bn_eps
    new_state = {"blocks": []}
    h = conv1d(x, params["adapter_conv"]["kernel"], params["adapter_conv"]["bias"])
    h, new_state["adapter_bn"] = _batch_norm(h, params["adapter_bn"],
                                             state["adapter_bn"], train, m, eps)
    h = jax.nn.relu(h)
    for bp, bs in zip(params["blocks"], state["blocks"]):
        res = h
        o = conv1d(h, bp["conv1"]["kernel"], bp["conv1"]["bias"], padding=(1, 1))
        o, s1 = _batch_norm(o, bp["bn1"], bs["bn1"], train, m, eps)
        o = jax.nn.relu(o)
        o = conv1d(o, bp["conv2"]["kernel"], bp["conv2"]["bias"], padding=(1, 1))
        o, s2 = _batch_norm(o, bp["bn2"], bs["bn2"], train, m, eps)
        h = jax.nn.relu(o + res)
        new_state["blocks"].append({"bn1": s1, "bn2": s2})
    h = conv1d(h, params["out_conv"]["kernel"], params["out_conv"]["bias"])
    h = jax.nn.relu(h)
    return h, new_state


def enhanced_forward(base_params: dict, seanet_cfg, adapter_params: dict,
                     adapter_state: dict, audio: jnp.ndarray,
                     train: bool = False, feature_scale: float | None = None):
    """Full enhancement path (try3.py:1038-1041 applies features*scale ->
    tanh before decoding when feature_scale is set).

    audio: (B, T) -> (audio_hat (B, T~), enhanced (B,T',512),
    input_features (B,T',512), new_adapter_state).
    """
    from ..models.seanet import seanet_decode, seanet_encode

    feats = seanet_encode(base_params["encoder"], seanet_cfg, audio[:, :, None])
    feats = jax.lax.stop_gradient(feats)  # frozen encoder
    enhanced, new_state = apply_adapter(adapter_params, adapter_state, feats,
                                        train=train)
    dec_in = enhanced
    if feature_scale is not None:
        dec_in = jnp.tanh(enhanced * feature_scale)
    out = seanet_decode(base_params["decoder"], seanet_cfg, dec_in)
    return out[:, :, 0], enhanced, feats, new_state
