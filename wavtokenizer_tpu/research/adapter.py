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


# ---------------------------------------------------------------------------
# try.py variant: BYOL SimpleTransformer inserted between the frozen encoder
# and the adapter (ref: try.py:36-134)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class InPathTransformerConfig:
    """try.py:76 SimpleTransformer(512, 128, 128, 4, 2): d_model is the
    ENCODER dim (hidden/projection args are unused by that class), torch
    TransformerEncoderLayer defaults (ffn 2048, relu, post-LN), plus a
    final per-frame Linear(512, 512)."""
    dim: int = 512
    num_heads: int = 4
    num_layers: int = 2
    ffn: int = 2048
    ln_eps: float = 1e-5


def _linear_default(rng, cin, cout):
    bound = 1.0 / np.sqrt(cin)
    return {"weight": rng.uniform(-bound, bound, (cin, cout)).astype(np.float32),
            "bias": rng.uniform(-bound, bound, (cout,)).astype(np.float32)}


def init_inpath_transformer(cfg: InPathTransformerConfig = InPathTransformerConfig(),
                            seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    d = cfg.dim

    def xavier(cin, cout):
        bound = np.sqrt(6.0 / (cin + cout))
        return rng.uniform(-bound, bound, (cin, cout)).astype(np.float32)

    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            # torch MultiheadAttention xavier-inits the packed in_proj
            "q": {"weight": xavier(d, d), "bias": np.zeros(d, np.float32)},
            "k": {"weight": xavier(d, d), "bias": np.zeros(d, np.float32)},
            "v": {"weight": xavier(d, d), "bias": np.zeros(d, np.float32)},
            "o": _linear_default(rng, d, d),
            "ln1": {"weight": np.ones(d, np.float32),
                    "bias": np.zeros(d, np.float32)},
            "ff1": _linear_default(rng, d, cfg.ffn),
            "ff2": _linear_default(rng, cfg.ffn, d),
            "ln2": {"weight": np.ones(d, np.float32),
                    "bias": np.zeros(d, np.float32)},
        })
    return {"layers": layers, "fc": _linear_default(rng, d, d)}


def inpath_transformer(params: dict, x: jnp.ndarray,
                       cfg: InPathTransformerConfig = InPathTransformerConfig()):
    """Per-frame (B, T, 512) -> (B, T, 512) (try.py:45-53: transformer over
    the time axis, then fc, keeping the time dimension)."""
    from .byol import _layer_norm, _mha

    h = x
    for lp in params["layers"]:
        h = _layer_norm(h + _mha(lp, h, cfg.num_heads), lp["ln1"], cfg.ln_eps)
        ff = jax.nn.relu(h @ lp["ff1"]["weight"] + lp["ff1"]["bias"])
        ff = ff @ lp["ff2"]["weight"] + lp["ff2"]["bias"]
        h = _layer_norm(h + ff, lp["ln2"], cfg.ln_eps)
    return h @ params["fc"]["weight"] + params["fc"]["bias"]


def load_byol_transformer(params: dict, ckpt_tree: dict) -> tuple[dict, int]:
    """try.py:101-104 semantics: ``load_state_dict(ckpt, strict=False)`` —
    copy exactly the leaves whose path+shape match, silently keep the rest.
    (With the fork's actual BYOL checkpoints NOTHING matches — tr_byol's
    SimpleTransformer has d_model 128 vs 512 here — so the in-path
    transformer stays at init; the quirk is preserved deliberately.)
    Returns (params, number_of_leaves_loaded)."""
    loaded = [0]

    def merge(dst, src):
        if isinstance(dst, dict) and isinstance(src, dict):
            return {k: merge(v, src[k]) if k in src else v
                    for k, v in dst.items()}
        if isinstance(dst, list) and isinstance(src, (list, tuple)):
            return [merge(d, s) for d, s in zip(dst, src)] + dst[len(src):]
        if hasattr(dst, "shape") and hasattr(src, "shape") \
                and tuple(dst.shape) == tuple(src.shape):
            loaded[0] += 1
            return np.asarray(src, np.float32)
        return dst

    return merge(params, ckpt_tree), loaded[0]


def inpath_transformer_from_torch(sd: dict,
                                  cfg: InPathTransformerConfig = InPathTransformerConfig()) -> dict:
    """try.py SimpleTransformer state dict -> our pytree (packed
    in_proj_weight split into q/k/v, weights transposed to (in, out))."""
    def a(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    d = cfg.dim
    layers = []
    for i in range(cfg.num_layers):
        pre = f"transformer.layers.{i}."
        in_w, in_b = a(pre + "self_attn.in_proj_weight"), \
            a(pre + "self_attn.in_proj_bias")
        qw, kw, vw = in_w[:d], in_w[d:2 * d], in_w[2 * d:]
        qb, kb, vb = in_b[:d], in_b[d:2 * d], in_b[2 * d:]
        layers.append({
            "q": {"weight": qw.T, "bias": qb},
            "k": {"weight": kw.T, "bias": kb},
            "v": {"weight": vw.T, "bias": vb},
            "o": {"weight": a(pre + "self_attn.out_proj.weight").T,
                  "bias": a(pre + "self_attn.out_proj.bias")},
            "ln1": {"weight": a(pre + "norm1.weight"),
                    "bias": a(pre + "norm1.bias")},
            "ff1": {"weight": a(pre + "linear1.weight").T,
                    "bias": a(pre + "linear1.bias")},
            "ff2": {"weight": a(pre + "linear2.weight").T,
                    "bias": a(pre + "linear2.bias")},
            "ln2": {"weight": a(pre + "norm2.weight"),
                    "bias": a(pre + "norm2.bias")},
        })
    return {"layers": layers,
            "fc": {"weight": a("fc.weight").T, "bias": a("fc.bias")}}


def _ln_noaffine(x, eps=1e-5):
    """torch F.layer_norm(x, [C]) over the channel axis, no affine."""
    mu = x.mean(-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def try_enhancement_stack(transformer_params: dict, adapter_params: dict,
                          adapter_state: dict, feats: jnp.ndarray,
                          train: bool = False,
                          transformer_cfg: InPathTransformerConfig = InPathTransformerConfig()):
    """try.py:108-133 between encoder and decoder: amplitude boost +
    no-affine channel LayerNorm -> SimpleTransformer -> adapter stack ->
    relu*2.5 -> no-affine LayerNorm*3.  feats: (B, T', 512) channel-last.
    Returns (enhanced, new_adapter_state)."""
    x = jax.lax.stop_gradient(_ln_noaffine(feats * 3.0))
    x = inpath_transformer(transformer_params, x, transformer_cfg)
    enhanced, new_state = apply_adapter(adapter_params, adapter_state, x,
                                        train=train)
    # relu is already the adapter tail; *2.5 is then absorbed by the
    # scale-invariant LayerNorm — kept for 1:1 readability with the ref
    enhanced = _ln_noaffine(enhanced * 2.5) * 3.0
    return enhanced, new_state


def enhanced_forward(base_params: dict, seanet_cfg, adapter_params: dict,
                     adapter_state: dict, audio: jnp.ndarray,
                     train: bool = False, feature_scale: float | None = None,
                     transformer_params: dict | None = None,
                     transformer_cfg: InPathTransformerConfig = InPathTransformerConfig()):
    """Full enhancement path.

    Without ``transformer_params`` (try3.py:1038-1041): frozen encoder ->
    adapter -> optional features*scale -> tanh -> decoder.

    With ``transformer_params`` (try.py:108-134): frozen encoder ->
    amplitude hacks (features*3, no-affine channel LayerNorm) -> BYOL
    SimpleTransformer -> adapter -> relu*2.5 -> no-affine LayerNorm*3 ->
    decoder (no tanh squash; try.py's EnhancedModel decodes raw).

    audio: (B, T) -> (audio_hat (B, T~), enhanced (B,T',512),
    input_features (B,T',512), new_adapter_state).
    """
    from ..models.seanet import seanet_decode, seanet_encode

    feats = seanet_encode(base_params["encoder"], seanet_cfg, audio[:, :, None])
    feats = jax.lax.stop_gradient(feats)  # frozen encoder
    if transformer_params is not None:
        enhanced, new_state = try_enhancement_stack(
            transformer_params, adapter_params, adapter_state, feats,
            train=train, transformer_cfg=transformer_cfg)
        dec_in = enhanced  # try.py's EnhancedModel decodes raw (no tanh)
    else:
        enhanced, new_state = apply_adapter(adapter_params, adapter_state,
                                            feats, train=train)
        dec_in = enhanced
        if feature_scale is not None:
            dec_in = jnp.tanh(enhanced * feature_scale)
    out = seanet_decode(base_params["decoder"], seanet_cfg, dec_in)
    return out[:, :, 0], enhanced, feats, new_state
