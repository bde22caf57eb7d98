"""torch-checkpoint -> JAX-pytree conversion.

Reads a Lightning checkpoint's ``state_dict`` (prefix-filtered to
backbone./head./feature_extractor. exactly like the reference loader,
decoder/pretrained.py:95-114), folds weight-norm reparametrizations
(g * v / ||v||) into plain kernels, and re-lays-out every tensor for the
channel-last TPU stack:

* Conv1d   (O, I, K)  ->  (K, I, O)
* ConvTr1d (I, O, K)  ->  (K, I, O)
* Linear   (O, I)     ->  (I, O)

All math here is host-side numpy float32, exactly matching torch's
``_weight_norm`` (norm over all dims except dim 0).
"""

from __future__ import annotations

import numpy as np

from ..models.seanet import LayerSpec, SEANetConfig, encoder_layer_specs, decoder_layer_specs
from ..models.vocos import VocosBackboneConfig


class MissingKey(KeyError):
    pass


def _get(sd: dict, key: str) -> np.ndarray:
    if key not in sd:
        raise MissingKey(key)
    return np.asarray(sd[key], dtype=np.float32)


def fold_weight_norm_weight(sd: dict, prefix: str) -> np.ndarray:
    """Return the effective weight for a (possibly weight-normed) conv/linear.

    Supports three layouts: legacy ``weight_g``/``weight_v``, new
    ``parametrizations.weight.original0/original1``, and plain ``weight``.
    """
    if f"{prefix}.weight_v" in sd:
        g = _get(sd, f"{prefix}.weight_g").astype(np.float64)
        v = _get(sd, f"{prefix}.weight_v").astype(np.float64)
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _get(sd, f"{prefix}.parametrizations.weight.original0").astype(np.float64)
        v = _get(sd, f"{prefix}.parametrizations.weight.original1").astype(np.float64)
    else:
        return _get(sd, f"{prefix}.weight")
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v * v).sum(axis=axes, keepdims=True))
    return (v * (g / norm)).astype(np.float32)


def conv1d_params(sd: dict, prefix: str) -> dict:
    """Conv1d weights (O, I, K) -> {'kernel': (K, I, O), 'bias': (O,)}."""
    w = fold_weight_norm_weight(sd, prefix)
    out = {"kernel": np.transpose(w, (2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = _get(sd, f"{prefix}.bias")
    else:
        out["bias"] = None
    return out


def convtr1d_params(sd: dict, prefix: str) -> dict:
    """ConvTranspose1d weights (I, O, K) -> {'kernel': (K, I, O), 'bias': (O,)}."""
    w = fold_weight_norm_weight(sd, prefix)
    out = {"kernel": np.transpose(w, (2, 0, 1))}
    out["bias"] = _get(sd, f"{prefix}.bias") if f"{prefix}.bias" in sd else None
    return out


def linear_params(sd: dict, prefix: str) -> dict:
    w = fold_weight_norm_weight(sd, prefix)
    return {"weight": np.ascontiguousarray(w.T), "bias": _get(sd, f"{prefix}.bias")}


def norm_params(sd: dict, prefix: str) -> dict:
    return {"weight": _get(sd, f"{prefix}.weight"),
            "bias": _get(sd, f"{prefix}.bias")}


def lstm_params(sd: dict, prefix: str, num_layers: int) -> dict:
    layers = []
    for k in range(num_layers):
        layers.append({
            "w_ih": _get(sd, f"{prefix}.weight_ih_l{k}"),
            "w_hh": _get(sd, f"{prefix}.weight_hh_l{k}"),
            "b_ih": _get(sd, f"{prefix}.bias_ih_l{k}"),
            "b_hh": _get(sd, f"{prefix}.bias_hh_l{k}"),
        })
    return {"layers": layers}


# --------------------------------------------------------------------------
# SEANet
# --------------------------------------------------------------------------

def seanet_params(sd: dict, root: str, specs: list[LayerSpec]) -> list:
    """Build the flat param list for apply_seanet from torch keys rooted at
    ``root`` (e.g. 'feature_extractor.encodec.encoder.')."""
    params = []

    def with_gn(p: dict, norm_prefix: str, spec) -> dict:
        # time_group_norm: NormConv(Transpose)1d carries a GroupNorm(1, C)
        # as `.norm` next to the inner conv (ref conv.py:112-122,145-155).
        if spec.norm == "time_group_norm":
            p["gn"] = norm_params(sd, norm_prefix)
        return p

    for spec in specs:
        if spec.kind == "conv":
            params.append(with_gn(
                conv1d_params(sd, f"{root}{spec.prefix}.conv.conv"),
                f"{root}{spec.prefix}.conv.norm", spec))
        elif spec.kind == "convtr":
            params.append(with_gn(
                convtr1d_params(sd, f"{root}{spec.prefix}.convtr.convtr"),
                f"{root}{spec.prefix}.convtr.norm", spec))
        elif spec.kind == "resblock":
            block = []
            # Sequential inside the resblock: [ELU, conv, ELU, conv] -> 1, 3
            for bi in range(len(spec.block_kernel_sizes)):
                block.append(with_gn(
                    conv1d_params(
                        sd, f"{root}{spec.prefix}.block.{2 * bi + 1}.conv.conv"),
                    f"{root}{spec.prefix}.block.{2 * bi + 1}.conv.norm", spec))
            p = {"block": block}
            if not spec.true_skip:
                p["shortcut"] = with_gn(
                    conv1d_params(sd, f"{root}{spec.prefix}.shortcut.conv.conv"),
                    f"{root}{spec.prefix}.shortcut.conv.norm", spec)
            params.append(p)
        elif spec.kind == "lstm":
            params.append(lstm_params(sd, f"{root}{spec.prefix}.lstm",
                                      spec.num_lstm_layers))
        else:  # elu / final_act carry no params
            params.append({})
    return params


# --------------------------------------------------------------------------
# Quantizer
# --------------------------------------------------------------------------

def quantizer_params(sd: dict, root: str, n_q: int) -> dict:
    """Stack per-layer codebooks: root e.g.
    'feature_extractor.encodec.quantizer.' with torch keys
    vq.layers.{q}._codebook.{embed,embed_avg,cluster_size,inited}."""
    embed, embed_avg, cluster_size, inited = [], [], [], []
    for q in range(n_q):
        p = f"{root}vq.layers.{q}._codebook"
        embed.append(_get(sd, f"{p}.embed"))
        if f"{p}.embed_avg" in sd:
            embed_avg.append(_get(sd, f"{p}.embed_avg"))
            cluster_size.append(_get(sd, f"{p}.cluster_size"))
            inited.append(_get(sd, f"{p}.inited"))
    out = {"embed": np.stack(embed)}
    if embed_avg:
        out["embed_avg"] = np.stack(embed_avg)
        out["cluster_size"] = np.stack(cluster_size)
        out["inited"] = np.stack(inited)
    return out


# --------------------------------------------------------------------------
# Vocos backbone + ISTFT head
# --------------------------------------------------------------------------

def _pos_resnet_params(sd: dict, p: str) -> dict:
    return {
        "norm1": norm_params(sd, f"{p}.norm1"),
        "conv1": conv1d_params(sd, f"{p}.conv1"),
        "norm2": norm_params(sd, f"{p}.norm2"),
        "conv2": conv1d_params(sd, f"{p}.conv2"),
    }


def _attn_params(sd: dict, p: str) -> dict:
    return {
        "norm": norm_params(sd, f"{p}.norm"),
        "q": conv1d_params(sd, f"{p}.q"),
        "k": conv1d_params(sd, f"{p}.k"),
        "v": conv1d_params(sd, f"{p}.v"),
        "proj_out": conv1d_params(sd, f"{p}.proj_out"),
    }


def _adaln_params(sd: dict, p: str) -> dict:
    return {"scale": _get(sd, f"{p}.scale.weight"),
            "shift": _get(sd, f"{p}.shift.weight")}


def vocos_backbone_params(sd: dict, root: str, cfg: VocosBackboneConfig) -> dict:
    params = {
        "embed": conv1d_params(sd, f"{root}embed"),
        "pos_net": [
            _pos_resnet_params(sd, f"{root}pos_net.0"),
            _pos_resnet_params(sd, f"{root}pos_net.1"),
            _attn_params(sd, f"{root}pos_net.2"),
            _pos_resnet_params(sd, f"{root}pos_net.3"),
            _pos_resnet_params(sd, f"{root}pos_net.4"),
            norm_params(sd, f"{root}pos_net.5"),
        ],
    }
    if cfg.adanorm_num_embeddings:
        params["norm"] = _adaln_params(sd, f"{root}norm")
    else:
        params["norm"] = norm_params(sd, f"{root}norm")
    convnext = []
    for i in range(cfg.num_layers):
        p = f"{root}convnext.{i}"
        block = {
            "dwconv": conv1d_params(sd, f"{p}.dwconv"),
            "pwconv1": linear_params(sd, f"{p}.pwconv1"),
            "pwconv2": linear_params(sd, f"{p}.pwconv2"),
        }
        if cfg.adanorm_num_embeddings:
            block["adanorm"] = _adaln_params(sd, f"{p}.norm")
        else:
            block["norm"] = norm_params(sd, f"{p}.norm")
        if f"{p}.gamma" in sd:
            block["gamma"] = _get(sd, f"{p}.gamma")
        convnext.append(block)
    params["convnext"] = convnext
    params["final_layer_norm"] = norm_params(sd, f"{root}final_layer_norm")
    return params


def istft_head_params(sd: dict, root: str) -> dict:
    return {"out": linear_params(sd, f"{root}out")}


# --------------------------------------------------------------------------
# Full model
# --------------------------------------------------------------------------

def resnet_backbone_params(sd: dict, root: str, num_blocks: int = 3) -> dict:
    """VocosResNetBackbone (ref: decoder/models.py:238-264): weight-normed
    embed conv k3 + num_blocks x ResBlock1 (convs1/convs2 x3 + gamma)."""
    blocks = []
    for i in range(num_blocks):
        p = f"{root}resnet.{i}"
        blocks.append({
            "convs1": [conv1d_params(sd, f"{p}.convs1.{j}") for j in range(3)],
            "convs2": [conv1d_params(sd, f"{p}.convs2.{j}") for j in range(3)],
            "gamma": [_get(sd, f"{p}.gamma.{j}")[:, 0] for j in range(3)],
        })
    return {"embed": conv1d_params(sd, f"{root}embed"), "resnet": blocks}


def imdct_head_params(sd: dict, root: str) -> dict:
    """IMDCTSymExpHead / IMDCTCosHead linear (ref: decoder/heads.py:70-157)."""
    return {"out": linear_params(sd, f"{root}out")}


def convert_vocos_state_dict(sd: dict, spec) -> dict:
    """state_dict -> params for the plain-Vocos family (VocosSpec)."""
    if spec.backbone_kind == "convnext":
        backbone = vocos_backbone_params(sd, "backbone.", spec.backbone)
    else:
        backbone = resnet_backbone_params(sd, "backbone.",
                                          spec.backbone.num_blocks)
    if spec.head_kind == "istft":
        head = istft_head_params(sd, "head.")
    else:
        head = imdct_head_params(sd, "head.")
    return {"backbone": backbone, "head": head}


INFERENCE_PREFIXES = ("backbone.", "head.", "feature_extractor.")
DISCRIMINATOR_PREFIXES = ("multiperioddisc.", "multiresddisc.", "dac.")


def load_torch_state_dict(path: str, prefixes=INFERENCE_PREFIXES) -> dict:
    """Load a torch/Lightning checkpoint into {key: np.ndarray}, keeping only
    the given key prefixes (ref: decoder/pretrained.py:101-105; the 0828
    variant additionally keeps discriminators, pretrained_model.py:75-79)."""
    import torch
    try:
        raw = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]
    out = {}
    for k, v in raw.items():
        if k.startswith(prefixes):
            out[k] = v.detach().cpu().numpy()
    return out


# --------------------------------------------------------------------------
# Discriminators (for from_pretrained0828 and surgical training resume)
# --------------------------------------------------------------------------

def conv2d_wn_params(sd: dict, prefix: str) -> dict:
    """Weight-normed Conv2d -> {'v' (Kh,Kw,I,O), 'g' (1,1,1,O), 'bias'} kept
    UNFOLDED (the discriminators train; folding happens per-forward)."""
    if f"{prefix}.weight_v" in sd:
        g = _get(sd, f"{prefix}.weight_g")
        v = _get(sd, f"{prefix}.weight_v")
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = _get(sd, f"{prefix}.parametrizations.weight.original0")
        v = _get(sd, f"{prefix}.parametrizations.weight.original1")
    else:
        raise MissingKey(f"{prefix}.weight_v")
    return {"v": np.transpose(v, (2, 3, 1, 0)),
            "g": g.reshape(1, 1, 1, -1),
            "bias": _get(sd, f"{prefix}.bias")}


def _disc_unit_params(sd: dict, p: str, n_convs: int) -> dict:
    d = {"convs": [conv2d_wn_params(sd, f"{p}.convs.{j}")
                   for j in range(n_convs)],
         "conv_post": conv2d_wn_params(sd, f"{p}.conv_post")}
    if f"{p}.emb.weight" in sd:
        d["emb"] = _get(sd, f"{p}.emb.weight")
    return d


def discriminator_params(sd: dict, include_dac: bool = True) -> dict:
    """Convert the Vocos MPD/MRD (+ optional DAC) discriminator weights into
    the train.discriminators param layout (ref: decoder/discriminators.py,
    decoder/discriminator_dac.py; Lightning attribute names multiperioddisc /
    multiresddisc / dac per experiment.py:70-74, pretrained_model.py:49-50)."""
    out = {
        "mpd": [_disc_unit_params(sd, f"multiperioddisc.discriminators.{i}", 5)
                for i in range(5)],
        "mrd": [_disc_unit_params(sd, f"multiresddisc.discriminators.{i}", 5)
                for i in range(3)],
    }
    if include_dac and any(k.startswith("dac.") for k in sd):
        # DAC Discriminator list = 5 MPDs (periods 2,3,5,7,11) then 3 MRDs;
        # DAC wraps each conv in a Sequential, hence the extra ".0" segment
        # (discriminator_dac.py WNConv2d(act=True)) — except conv_post.
        out["dac_mpd"] = []
        for i in range(5):
            p = f"dac.discriminators.{i}"
            out["dac_mpd"].append({
                "convs": [conv2d_wn_params(sd, f"{p}.convs.{j}.0")
                          for j in range(5)],
                "conv_post": conv2d_wn_params(sd, f"{p}.conv_post")})
        dac_mrd = []
        for i in range(5, 8):
            p = f"dac.discriminators.{i}"
            bands = [[conv2d_wn_params(sd, f"{p}.band_convs.{b}.{j}.0")
                      for j in range(5)] for b in range(5)]
            dac_mrd.append({"bands": bands,
                            "conv_post": conv2d_wn_params(sd, f"{p}.conv_post")})
        out["dac_mrd"] = dac_mrd
    return out


def surgical_resume_params(sd: dict, seanet_cfg: SEANetConfig, vq_n_q: int,
                           backbone_cfg: VocosBackboneConfig,
                           keep_quantizer_layers: int = 8) -> dict:
    """Per-submodule checkpoint surgery for training resume
    (ref: decoder/experiment.py:398-445): reload encoder / decoder /
    quantizer (layers < keep_quantizer_layers only) / backbone / head, plus
    discriminators when the checkpoint carries them."""
    params = convert_wavtokenizer_state_dict(
        sd, seanet_cfg, min(vq_n_q, keep_quantizer_layers), backbone_cfg)
    if any(k.startswith("multiperioddisc.") for k in sd):
        params["discriminators"] = discriminator_params(sd)
    return params


def average_state_dicts(sds: list[dict]) -> dict:
    """Checkpoint averaging (ref: decoder/pretrained.py:117-156)."""
    keys = sds[0].keys()
    return {k: np.mean([np.asarray(sd[k], dtype=np.float64) for sd in sds], axis=0)
                .astype(np.float32) for k in keys}


def convert_wavtokenizer_state_dict(sd: dict, seanet_cfg: SEANetConfig,
                                    vq_n_q: int,
                                    backbone_cfg: VocosBackboneConfig) -> dict:
    """state_dict -> full param pytree for the WavTokenizer facade."""
    fe_root = "feature_extractor.encodec."
    return {
        "encoder": seanet_params(sd, f"{fe_root}encoder.",
                                 encoder_layer_specs(seanet_cfg)),
        "decoder": seanet_params(sd, f"{fe_root}decoder.",
                                 decoder_layer_specs(seanet_cfg)),
        "quantizer": quantizer_params(sd, f"{fe_root}quantizer.", vq_n_q),
        "backbone": vocos_backbone_params(sd, "backbone.", backbone_cfg),
        "head": istft_head_params(sd, "head."),
    }


def convert_encodec_state_dict(sd: dict, cfg) -> dict:
    """Raw pretrained-EnCodec state dict (encodec_*.th files load directly
    into EncodecModel, ref encoder/model.py:250-281) -> param pytree for
    models.encodec.  ``cfg`` is an EncodecConfig (e.g. from
    encodec_model_24khz_config); time_group_norm params are picked up via
    the seanet layer specs."""
    return {
        "encoder": seanet_params(sd, "encoder.",
                                 encoder_layer_specs(cfg.seanet)),
        "decoder": seanet_params(sd, "decoder.",
                                 decoder_layer_specs(cfg.seanet)),
        "quantizer": quantizer_params(sd, "quantizer.", cfg.vq.n_q),
    }
