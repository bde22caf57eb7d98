"""Native UTMOS MOS predictor.

Behavioral contract: reference metrics/UTMOS.py:19-117 — a wav2vec2-small
("base") SSL encoder, a domain embedding (3x128, domain 0), a judge
embedding (3000x128, judge 288), a 1-layer bidirectional LSTM (hidden 512)
over the concatenated 1024-dim features, and a 2048-hidden MLP projection to
one score per frame; the clip score is ``frame_scores.mean() * 2 + 3``.

The reference downloads fairseq's ``wav2vec_small.pt`` + the UTMOS
lightning checkpoint at runtime; this image has zero egress, so the model
GRAPH is implemented natively here (jit-compiled, channel-last) together
with a torch-state-dict converter (fairseq naming, the layout the UTMOS
checkpoint uses).  Scoring is available whenever a local checkpoint is
supplied (``WT_UTMOS_CKPT`` or an explicit path); graph parity is pinned by
``tests/test_utmos.py`` against a randomly-initialized torch oracle
(transformers ``Wav2Vec2Model`` + the UTMOS head modules).

wav2vec2-base architecture constants (fairseq wav2vec2.py, model cfg of
``wav2vec_small``): 7 conv layers (512 ch, kernels 10/3/3/3/3/2/2, strides
5/2/2/2/2/2/2, no bias, GroupNorm(512, 512) after the first), feature
LayerNorm + 512->768 projection, grouped positional conv (kernel 128,
16 groups, weight-normed, SamePad trim + GELU), post-LN transformer
(12 layers, 12 heads, FFN 3072, GELU).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.lstm import lstm_layer

CONV_SPECS = ((10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2))


@dataclass(frozen=True)
class UTMOSConfig:
    conv_channels: int = 512
    ssl_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    ffn_dim: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    num_domains: int = 3
    domain_dim: int = 128
    num_judges: int = 3000
    judge_dim: int = 128
    lstm_hidden: int = 512
    proj_hidden: int = 2048
    ln_eps: float = 1e-5


def _ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["weight"] + p["bias"]


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)  # torch/fairseq erf GELU


def _conv1d_nwc(x, w, stride=1, padding="VALID", groups=1):
    """x: (B, T, Cin); w: (K, Cin/groups, Cout)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,),
        padding=padding if isinstance(padding, str) else [padding],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)


def _feature_extractor(params, wav, cfg: UTMOSConfig):
    """(B, T) -> (B, T', 512): the 7-layer strided conv stack.

    GroupNorm(512, 512) after layer 0 is per-channel instance norm over
    time (fairseq mode="default").
    """
    x = wav[:, :, None]
    for i, ((k, s), w) in enumerate(zip(CONV_SPECS, params["conv_layers"])):
        x = _conv1d_nwc(x, w["weight"], stride=s)
        if i == 0:
            gn = params["group_norm"]
            mu = x.mean(axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + cfg.ln_eps)
            x = x * gn["weight"] + gn["bias"]
        x = _gelu(x)
    return x


def _attention(p, x, num_heads):
    B, T, D = x.shape
    H = num_heads
    hd = D // H
    q = (x @ p["q"]["weight"] + p["q"]["bias"]).reshape(B, T, H, hd)
    k = (x @ p["k"]["weight"] + p["k"]["bias"]).reshape(B, T, H, hd)
    v = (x @ p["v"]["weight"] + p["v"]["bias"]).reshape(B, T, H, hd)
    w = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(hd)
    w = jax.nn.softmax(w, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", w, v).reshape(B, T, D)
    return o @ p["o"]["weight"] + p["o"]["bias"]


def ssl_encode(params, wav, cfg: UTMOSConfig = UTMOSConfig()):
    """wav (B, T) @16 kHz -> wav2vec2 features (B, T', 768)
    (fairseq ``ssl_model(wav, mask=False, features_only=True)["x"]``)."""
    x = _feature_extractor(params, wav, cfg)
    x = _ln(x, params["feat_ln"], cfg.ln_eps)
    x = x @ params["proj"]["weight"] + params["proj"]["bias"]

    # Grouped positional conv, SAME padding 64/64 then trim the extra
    # rightmost step (fairseq SamePad for even kernels), GELU, residual.
    pc = _conv1d_nwc(x, params["pos_conv"]["weight"],
                     padding=(cfg.pos_conv_kernel // 2,
                              cfg.pos_conv_kernel // 2),
                     groups=cfg.pos_conv_groups)
    pc = pc + params["pos_conv"]["bias"]
    pc = _gelu(pc[:, :-1])
    x = x + pc
    x = _ln(x, params["enc_ln"], cfg.ln_eps)

    for lp in params["layers"]:
        # post-LN (layer_norm_first=False): LN(x + attn), LN(x + ff)
        x = _ln(x + _attention(lp, x, cfg.num_heads), lp["ln1"], cfg.ln_eps)
        ff = _gelu(x @ lp["fc1"]["weight"] + lp["fc1"]["bias"])
        ff = ff @ lp["fc2"]["weight"] + lp["fc2"]["bias"]
        x = _ln(x + ff, lp["ln2"], cfg.ln_eps)
    return x


def utmos_frame_scores(params, wav, domain_id: int = 0, judge_id: int = 288,
                       cfg: UTMOSConfig = UTMOSConfig()):
    """(B, T) -> per-frame scores (B, T', 1) (ref UTMOS.py:119-223:
    SSL features ++ domain emb ++ judge emb -> BiLSTM -> MLP)."""
    x = ssl_encode(params, wav, cfg)
    B, T, _ = x.shape
    d = params["domain_emb"][domain_id][None, None, :]
    j = params["judge_emb"][judge_id][None, None, :]
    feats = jnp.concatenate(
        [x, jnp.broadcast_to(d, (B, T, cfg.domain_dim)),
         jnp.broadcast_to(j, (B, T, cfg.judge_dim))], axis=-1)
    fw = lstm_layer(feats, **params["lstm_fw"])
    bw = lstm_layer(feats[:, ::-1], **params["lstm_bw"])[:, ::-1]
    h = jnp.concatenate([fw, bw], axis=-1)
    h = jax.nn.relu(h @ params["proj1"]["weight"] + params["proj1"]["bias"])
    return h @ params["proj2"]["weight"] + params["proj2"]["bias"]


@partial(jax.jit, static_argnums=())
def _score_jit(params, wav):
    return utmos_frame_scores(params, wav).mean(axis=1)[:, 0] * 2.0 + 3.0


def utmos_score_from_params(params, wav_16k) -> np.ndarray:
    """Clip MOS scores (B,) for (B, T) or (T,) audio at 16 kHz
    (ref UTMOS.py:30-55: ``model(batch).mean(dim=1).squeeze(1) * 2 + 3``)."""
    wav = jnp.asarray(wav_16k, jnp.float32)
    if wav.ndim == 1:
        wav = wav[None]
    return np.asarray(_score_jit(params, wav))


# ---------------------------------------------------------------------------
# torch checkpoint conversion (fairseq naming, as stored in the UTMOS ckpt)
# ---------------------------------------------------------------------------

def _strip_prefixes(sd: dict) -> dict:
    """Normalize lightning/module prefixes so keys start at the component
    roots (feature_extractors.* / output_layers.*)."""
    out = {}
    for k, v in sd.items():
        for pre in ("model.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def utmos_params_from_torch(sd: dict, cfg: UTMOSConfig = UTMOSConfig()) -> dict:
    """UTMOS lightning state dict (fairseq wav2vec2 naming) -> params pytree.

    Accepts torch tensors or numpy arrays.  Handles both weight-norm
    layouts of the positional conv (classic ``weight_g``/``weight_v`` and
    torch>=2.1 ``parametrizations.weight.original{0,1}``).
    """
    sd = _strip_prefixes(sd)

    def a(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    ssl = "feature_extractors.0.ssl_model."

    def lin(key):
        return {"weight": a(key + ".weight").T, "bias": a(key + ".bias")}

    def ln(key):
        return {"weight": a(key + ".weight"), "bias": a(key + ".bias")}

    conv_layers = [
        {"weight": a(f"{ssl}feature_extractor.conv_layers.{i}.0.weight")
         .transpose(2, 1, 0)}
        for i in range(len(CONV_SPECS))]

    # weight-normed positional conv: weight = g * v / ||v||_(per-out-channel)
    pc = f"{ssl}encoder.pos_conv.0"
    if f"{pc}.weight_g" in sd:
        g, v = a(f"{pc}.weight_g"), a(f"{pc}.weight_v")
    else:
        g = a(f"{pc}.parametrizations.weight.original0")
        v = a(f"{pc}.parametrizations.weight.original1")
    # torch conv layout (Cout, Cin/groups, K); fairseq applies
    # weight_norm(dim=2), i.e. g has shape (1, 1, K) and the norm is taken
    # over (Cout, Cin/groups) per kernel position.
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    pos_w = (g * v / np.maximum(norm, 1e-12)).transpose(2, 1, 0)

    # Infer depth from the checkpoint (12 for the real wav2vec2-base UTMOS
    # ckpt; test oracles use fewer layers for speed).
    n_layers = 1 + max(int(k.split("encoder.layers.")[1].split(".")[0])
                       for k in sd if "encoder.layers." in k)
    layers = []
    for i in range(n_layers):
        lp = f"{ssl}encoder.layers.{i}."
        layers.append({
            "q": lin(lp + "self_attn.q_proj"),
            "k": lin(lp + "self_attn.k_proj"),
            "v": lin(lp + "self_attn.v_proj"),
            "o": lin(lp + "self_attn.out_proj"),
            "ln1": ln(lp + "self_attn_layer_norm"),
            "fc1": lin(lp + "fc1"),
            "fc2": lin(lp + "fc2"),
            "ln2": ln(lp + "final_layer_norm"),
        })

    rnn = "output_layers.0.decoder_rnn."

    def lstm_dir(suffix):
        return {"w_ih": a(rnn + "weight_ih_l0" + suffix),
                "w_hh": a(rnn + "weight_hh_l0" + suffix),
                "b_ih": a(rnn + "bias_ih_l0" + suffix),
                "b_hh": a(rnn + "bias_hh_l0" + suffix)}

    return {
        "conv_layers": conv_layers,
        "group_norm": ln(f"{ssl}feature_extractor.conv_layers.0.2"),
        "feat_ln": ln(f"{ssl}layer_norm"),
        "proj": lin(f"{ssl}post_extract_proj"),
        "pos_conv": {"weight": pos_w, "bias": a(f"{pc}.bias")},
        "enc_ln": ln(f"{ssl}encoder.layer_norm"),
        "layers": layers,
        "domain_emb": a("feature_extractors.1.embedding.weight"),
        "judge_emb": a("output_layers.0.judge_embedding.weight"),
        "lstm_fw": lstm_dir(""),
        "lstm_bw": lstm_dir("_reverse"),
        "proj1": lin("output_layers.1.net.0"),
        "proj2": lin("output_layers.1.net.3"),
    }


_CACHED: dict = {}


def load_utmos(ckpt_path: str | None = None):
    """Load (and cache) UTMOS params from a torch checkpoint on disk.

    ckpt_path defaults to ``$WT_UTMOS_CKPT``.  Returns None when no
    checkpoint is available (zero-egress image: the reference would
    download it, ref UTMOS.py:23-27).
    """
    ckpt_path = ckpt_path or os.environ.get("WT_UTMOS_CKPT")
    if not ckpt_path or not os.path.exists(ckpt_path):
        return None
    if ckpt_path not in _CACHED:
        import torch
        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        _CACHED[ckpt_path] = utmos_params_from_torch(sd)
    return _CACHED[ckpt_path]
