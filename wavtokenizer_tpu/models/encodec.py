"""EncodecModel-level wrapper: segmented encode/decode with overlap-add and
optional per-segment volume normalization.

Behavioral contract: reference encoder/model.py:68-191 — fixed
``segment``/1% ``overlap`` windows (dormant: WavTokenizer configs use
segment=None = full-sequence), per-segment RMS normalization when
``normalize``, triangular-weight linear overlap-add on decode, and the
EnCodec-style full resynthesis forward used by validation-time reference
audio (experiment.py:464-474).

Segmentation is host-side Python over jit-compiled per-frame functions
(each distinct segment length compiles once; the final ragged segment pads
to the full segment length and trims, keeping shapes static).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..ops.resample import linear_overlap_add
from .quantize import VQConfig, vq_decode, vq_encode
from .seanet import SEANetConfig, seanet_decode, seanet_encode


@dataclass(frozen=True)
class EncodecConfig:
    seanet: SEANetConfig
    vq: VQConfig
    sample_rate: int = 24000
    channels: int = 1
    normalize: bool = False
    segment: float | None = None
    overlap: float = 0.01
    target_bandwidths: tuple = (6.6, 6.6, 6.6, 6.6)

    @property
    def frame_rate(self) -> int:
        return math.ceil(self.sample_rate / self.seanet.hop_length)

    @property
    def segment_length(self) -> int | None:
        if self.segment is None:
            return None
        return int(self.segment * self.sample_rate)

    @property
    def segment_stride(self) -> int | None:
        sl = self.segment_length
        if sl is None:
            return None
        return max(1, int((1 - self.overlap) * sl))


def _encode_frame(params: dict, cfg: EncodecConfig, x: jnp.ndarray,
                  n_q: int | None = None):
    """x: (B, C, L) -> (codes (B, K, T'), scale or None)
    (ref: encoder/model.py:147-165)."""
    if cfg.normalize:
        mono = x.mean(axis=1, keepdims=True)
        volume = jnp.sqrt(jnp.mean(mono ** 2, axis=2, keepdims=True))
        scale = 1e-8 + volume
        x = x / scale
        scale = scale.reshape(-1, 1)
    else:
        scale = None
    emb = seanet_encode(params["encoder"], cfg.seanet,
                        jnp.swapaxes(x, 1, 2))
    codes = vq_encode(params["quantizer"], cfg.vq, emb, n_q=n_q)  # (K, B, T)
    return jnp.swapaxes(codes, 0, 1), scale


def _decode_frame(params: dict, cfg: EncodecConfig, codes: jnp.ndarray,
                  scale) -> jnp.ndarray:
    """codes (B, K, T') -> (B, C, L) (ref: encoder/model.py:180-187)."""
    emb = vq_decode(params["quantizer"], jnp.swapaxes(codes, 0, 1))
    out = seanet_decode(params["decoder"], cfg.seanet, emb)
    out = jnp.swapaxes(out, 1, 2)
    if scale is not None:
        out = out * scale.reshape(-1, 1, 1)
    return out


def encode(params: dict, cfg: EncodecConfig, x: jnp.ndarray,
           n_q: int | None = None) -> list:
    """Segmented encode (ref: encoder/model.py:122-145).  x: (B, C, L)."""
    assert x.ndim == 3
    _, channels, length = x.shape
    assert 0 < channels <= 2
    segment_length = cfg.segment_length
    if segment_length is None:
        segment_length = length
        stride = length
    else:
        stride = cfg.segment_stride
    frames = []
    for offset in range(0, length, stride):
        frame = x[:, :, offset:offset + segment_length]
        frames.append(_encode_frame(params, cfg, frame, n_q=n_q))
    return frames


def decode(params: dict, cfg: EncodecConfig, encoded_frames: list) -> jnp.ndarray:
    """Overlap-add decode (ref: encoder/model.py:167-178)."""
    if cfg.segment_length is None:
        assert len(encoded_frames) == 1
        return _decode_frame(params, cfg, *encoded_frames[0])
    frames = [_decode_frame(params, cfg, c, s) for c, s in encoded_frames]
    return linear_overlap_add(frames, cfg.segment_stride or 1)


def forward(params: dict, cfg: EncodecConfig, x: jnp.ndarray,
            n_q: int | None = None) -> jnp.ndarray:
    """Full resynthesis (ref: encoder/model.py:189-191)."""
    frames = encode(params, cfg, x, n_q=n_q)
    return decode(params, cfg, frames)[:, :, :x.shape[-1]]
