"""Alternative model components kept for full reference parity.

These are shipped by the reference but unused by the WavTokenizer configs
(SURVEY.md §2.1 "unused by shipped configs"):

* MelSpectrogramFeatures — plain-Vocos feature extractor
  (ref: decoder/feature_extractors.py:30-51)
* VocosResNetBackbone + ResBlock1 — HiFi-GAN-style trunk
  (ref: decoder/models.py:238-264, decoder/modules.py:89-191)
* IMDCTSymExpHead / IMDCTCosHead — MDCT-domain heads
  (ref: decoder/heads.py:70-157)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.conv import conv1d
from ..ops.spectral import imdct, mel_spectrogram, safe_log


# --------------------------------------------------------------------------
# MelSpectrogramFeatures
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class MelFeaturesConfig:
    sample_rate: int = 24000
    n_fft: int = 1024
    hop_length: int = 256
    n_mels: int = 100
    padding: str = "center"


def mel_features(cfg: MelFeaturesConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, n_mels, T') log-mel features
    (ref: decoder/feature_extractors.py:45-51)."""
    if cfg.padding == "same":
        pad = cfg.n_fft - cfg.hop_length
        audio = jnp.pad(audio, ((0, 0), (pad // 2, pad // 2)), mode="reflect")
        center = False
    else:
        center = True
    mel = mel_spectrogram(audio, cfg.sample_rate, cfg.n_fft, cfg.hop_length,
                          cfg.n_mels, power=1.0, center=center)
    return safe_log(mel)


# --------------------------------------------------------------------------
# ResBlock1 (HiFi-GAN) + VocosResNetBackbone
# --------------------------------------------------------------------------

def res_block1(p: dict, x: jnp.ndarray, dilations=(1, 3, 5),
               lrelu_slope: float = 0.1) -> jnp.ndarray:
    """(B, T, C); weight-norm folded convs (ref: decoder/modules.py:172-181)."""
    for c1, c2, gamma, d in zip(p["convs1"], p["convs2"], p["gamma"], dilations):
        pad1 = (3 * d - d) // 2
        xt = jax.nn.leaky_relu(x, lrelu_slope)
        xt = conv1d(xt, c1["kernel"], c1["bias"], dilation=d, padding=(pad1, pad1))
        xt = jax.nn.leaky_relu(xt, lrelu_slope)
        xt = conv1d(xt, c2["kernel"], c2["bias"], padding=(1, 1))
        if gamma is not None:
            xt = gamma * xt
        x = xt + x
    return x


@dataclass(frozen=True)
class VocosResNetBackboneConfig:
    input_channels: int = 100
    dim: int = 512
    num_blocks: int = 3


def vocos_resnet_backbone(params: dict, cfg: VocosResNetBackboneConfig,
                          x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, Cin) -> (B, T, dim) (ref: decoder/models.py:260-264)."""
    x = conv1d(x, params["embed"]["kernel"], params["embed"]["bias"],
               padding=(1, 1))
    for block in params["resnet"]:
        x = res_block1(block, x)
    return x


# --------------------------------------------------------------------------
# IMDCT heads
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class IMDCTHeadConfig:
    dim: int = 768
    mdct_frame_len: int = 640
    padding: str = "same"
    clip_audio: bool = False


def _symexp(x):
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def imdct_symexp_head(params: dict, cfg: IMDCTHeadConfig,
                      x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, dim) -> (B, L) (ref: decoder/heads.py:102-120)."""
    x = jnp.dot(x, params["out"]["weight"]) + params["out"]["bias"]
    x = _symexp(x)
    x = jnp.clip(x, min=-1e2, max=1e2)
    audio = imdct(x, cfg.mdct_frame_len, cfg.padding)
    if cfg.clip_audio:
        audio = jnp.clip(audio, min=-1.0, max=1.0)
    return audio


def imdct_cos_head(params: dict, cfg: IMDCTHeadConfig,
                   x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, dim) -> (B, L) (ref: decoder/heads.py:140-157)."""
    x = jnp.dot(x, params["out"]["weight"]) + params["out"]["bias"]
    m, p = jnp.split(x, 2, axis=-1)
    m = jnp.clip(jnp.exp(m), max=1e2)
    audio = imdct(m * jnp.cos(p), cfg.mdct_frame_len, cfg.padding)
    if cfg.clip_audio:
        audio = jnp.clip(audio, min=-1.0, max=1.0)
    return audio


def conv_layer_norm(x: jnp.ndarray, weight: jnp.ndarray | None = None,
                    bias: jnp.ndarray | None = None,
                    eps: float = 1e-5) -> jnp.ndarray:
    """Channel-last LayerNorm for conv activations.

    Parity component for the reference's ConvLayerNorm
    (encoder/modules/norm.py:16-28), whose forward has a latent bug
    (missing ``return``, so it yields None) and is unused by shipped
    configs.  Our activations are already channel-last, so this is a plain
    last-axis LayerNorm — implemented correctly rather than replicating the
    bug.
    """
    from .vocos import layer_norm
    return layer_norm(x, weight, bias, eps=eps)


def mel_scaled_head_init_scale(sample_rate: int, out_dim: int) -> np.ndarray:
    """Perceptual init scaling for IMDCTSymExpHead (ref: heads.py:92-100)."""
    m_max = 2595.0 * np.log10(1.0 + (sample_rate // 2) / 700.0)
    m_pts = np.linspace(0, m_max, out_dim)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    return (1.0 - f_pts / f_pts.max()).astype(np.float32)
