"""Full WavTokenizer model: SEANet encoder -> VQ -> Vocos backbone -> ISTFT head.

Pure jit-able functions over an explicit param pytree.  Behavioral contract:
reference decoder/feature_extractors.py:105-142 (encode paths) and
decoder/pretrained.py:159-239 (decode / codes_to_features / copy synthesis).

Boundary layout matches the reference API: audio (B, T), features (B, D, T'),
codes (K, B, T').  Internally everything is channel-last.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from .quantize import (VQConfig, codes_to_features as _codes_to_features,
                       vq_forward_language, vq_infer)
from .seanet import SEANetConfig, seanet_decode, seanet_encode
from .vocos import ISTFTHeadConfig, VocosBackboneConfig, istft_head, vocos_backbone


@dataclass(frozen=True)
class WavTokenizerSpec:
    seanet: SEANetConfig = SEANetConfig()
    vq: VQConfig = VQConfig()
    backbone: VocosBackboneConfig = VocosBackboneConfig()
    head: ISTFTHeadConfig = ISTFTHeadConfig()
    bandwidths: tuple = (6.6, 6.6, 6.6, 6.6)
    sample_rate: int = 24000

    @property
    def hop_length(self) -> int:
        return self.seanet.hop_length

    @property
    def frame_rate(self) -> int:
        import math
        return math.ceil(self.sample_rate / self.hop_length)


def encode_infer(params: dict, spec: WavTokenizerSpec, audio: jnp.ndarray,
                 bandwidth_id=None):
    """Production tokenization path (ref: feature_extractors.py:131-142,
    n_q=1 per vq.py:137).

    audio: (B, T) -> (features (B, D, T'), codes (1, B, T'))
    """
    x = audio[:, :, None]                                  # (B, T, 1)
    emb = seanet_encode(params["encoder"], spec.seanet, x)  # (B, T', D)
    quantized, codes, _ = vq_infer(params["quantizer"], spec.vq, emb)
    return jnp.swapaxes(quantized, 1, 2), codes


def encode_forward(params: dict, spec: WavTokenizerSpec, audio: jnp.ndarray,
                   n_q: int | None = None):
    """Eval-mode training-style forward (ref: feature_extractors.py:105-119 ->
    LanguageVectorQuantization.forward)."""
    x = audio[:, :, None]
    emb = seanet_encode(params["encoder"], spec.seanet, x)
    quantized, codes, _ = vq_forward_language(params["quantizer"], spec.vq, emb,
                                              n_q=n_q)
    return jnp.swapaxes(quantized, 1, 2), codes


def decode(params: dict, spec: WavTokenizerSpec, features: jnp.ndarray,
           bandwidth_id) -> jnp.ndarray:
    """features (B, D, T') -> waveform (B, L)
    (ref: decoder/pretrained.py:192-207)."""
    x = jnp.swapaxes(features, 1, 2)                       # (B, T', D)
    h = vocos_backbone(params["backbone"], spec.backbone, x,
                       bandwidth_id=bandwidth_id)
    return istft_head(params["head"], spec.head, h)


def codes_to_features(params: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (K, B, T) or (K, T) -> features (B, D, T)
    (ref: decoder/pretrained.py:209-239)."""
    feats = _codes_to_features(params["quantizer"], codes)  # (B, T, D)
    return jnp.swapaxes(feats, 1, 2)


def forward(params: dict, spec: WavTokenizerSpec, audio: jnp.ndarray,
            bandwidth_id) -> jnp.ndarray:
    """Copy synthesis (ref: decoder/pretrained.py:159-175): training-style
    feature extraction then decode."""
    features, _ = encode_forward(params, spec, audio)
    return decode(params, spec, features, bandwidth_id)


def seanet_only_decode(params: dict, spec: WavTokenizerSpec,
                       features: jnp.ndarray) -> jnp.ndarray:
    """SEANet decoder path (B, D, T') -> (B, L): used by the EnCodec-style
    resynthesis and the fork's enhancement stack (bypasses Vocos)."""
    x = jnp.swapaxes(features, 1, 2)
    y = seanet_decode(params["decoder"], spec.seanet, x)
    return y[:, :, 0]
