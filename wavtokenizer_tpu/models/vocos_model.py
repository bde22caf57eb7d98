"""Plain-Vocos model family: mel features -> trunk -> waveform head.

The reference carries the full upstream Vocos mode alongside WavTokenizer
(MelSpectrogramFeatures, VocosResNetBackbone, IMDCT heads — SURVEY.md §2.1
"unused by shipped configs" but part of the component surface).  Here it is
a first-class family: a ``VocosSpec`` picks the feature extractor, trunk and
head by kind, and ``vocos_forward`` runs the composed pipeline
(ref: plain-Vocos forward = feature_extractor -> backbone -> head, the same
composition decoder/pretrained.py:159-175 uses for WavTokenizer).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .alt_components import (IMDCTHeadConfig, MelFeaturesConfig,
                             VocosResNetBackboneConfig, imdct_cos_head,
                             imdct_symexp_head, mel_features,
                             vocos_resnet_backbone)
from .vocos import ISTFTHeadConfig, VocosBackboneConfig, istft_head, vocos_backbone


@dataclass(frozen=True)
class VocosSpec:
    """Composed plain-Vocos model: kinds select among the reference's
    interchangeable components (decoder/feature_extractors.py,
    decoder/models.py, decoder/heads.py)."""
    features: MelFeaturesConfig = MelFeaturesConfig()
    backbone_kind: str = "convnext"          # convnext | resnet
    backbone: VocosBackboneConfig | VocosResNetBackboneConfig = (
        VocosBackboneConfig(input_channels=100, adanorm_num_embeddings=None))
    head_kind: str = "istft"                 # istft | imdct_symexp | imdct_cos
    head: ISTFTHeadConfig | IMDCTHeadConfig = ISTFTHeadConfig(n_fft=1024,
                                                              hop_length=256)

    @property
    def sample_rate(self) -> int:
        return self.features.sample_rate


def vocos_features(params: dict, spec: VocosSpec, audio: jnp.ndarray) -> jnp.ndarray:
    """(B, T) audio -> (B, n_mels, T') log-mel features."""
    return mel_features(spec.features, audio)


def vocos_decode(params: dict, spec: VocosSpec, features: jnp.ndarray,
                 bandwidth_id=None) -> jnp.ndarray:
    """(B, C, T') features -> (B, L) waveform."""
    x = jnp.swapaxes(features, 1, 2)
    if spec.backbone_kind == "convnext":
        h = vocos_backbone(params["backbone"], spec.backbone, x,
                           bandwidth_id=bandwidth_id)
    elif spec.backbone_kind == "resnet":
        h = vocos_resnet_backbone(params["backbone"], spec.backbone, x)
    else:
        raise ValueError(spec.backbone_kind)
    head = {"istft": lambda: istft_head(params["head"], spec.head, h),
            "imdct_symexp": lambda: imdct_symexp_head(params["head"], spec.head, h),
            "imdct_cos": lambda: imdct_cos_head(params["head"], spec.head, h)}
    if spec.head_kind not in head:
        raise ValueError(spec.head_kind)
    return head[spec.head_kind]()


def vocos_forward(params: dict, spec: VocosSpec, audio: jnp.ndarray,
                  bandwidth_id=None) -> jnp.ndarray:
    """Copy synthesis through the plain-Vocos pipeline."""
    feats = vocos_features(params, spec, audio)
    return vocos_decode(params, spec, feats, bandwidth_id=bandwidth_id)
