"""On-device polyphase sinc resampling (torchaudio-compatible).

The reference leans on torchaudio's C++ resampler (encoder/utils.py:91,
decoder/experiment.py:231-232).  Here the polyphase kernel bank is
precomputed on host (numpy, float64 like torchaudio) and the resample is ONE
strided conv on device — MXU-friendly and jit-able with static shapes.

Defaults match ``torchaudio.transforms.Resample``:
lowpass_filter_width=6, rolloff=0.99, sinc_interp_hann window.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from .conv import conv1d


@lru_cache(maxsize=32)
def _sinc_resample_kernel(orig_freq: int, new_freq: int,
                          lowpass_filter_width: int = 6,
                          rolloff: float = 0.99) -> tuple[np.ndarray, int, int, int]:
    """Polyphase kernel bank: returns (kernels (K, 1, new), width, orig, new)
    with orig/new reduced by their gcd."""
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig = int(orig_freq) // gcd
    new = int(new_freq) // gcd
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)

    idx = np.arange(-width, width + orig, dtype=np.float64)[None, :] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    scale = base_freq / orig
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels = kernels * window * scale  # (new, 2*width + orig)
    # Layout for channel-last conv1d: (K, Cin=1, Cout=new)
    k = kernels.T[:, None, :].astype(np.float32)
    return k, width, orig, new


def resample(x: jnp.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6, rolloff: float = 0.99) -> jnp.ndarray:
    """Resample (B, L) or (B, C, L) waveforms.  Output length =
    ceil(new * L / orig), matching torchaudio."""
    if orig_freq == new_freq:
        return x
    squeeze = False
    if x.ndim == 3:
        B, C, L = x.shape
        x2 = x.reshape(B * C, L)
    else:
        x2 = x
        squeeze = True if x.ndim == 1 else False
        if squeeze:
            x2 = x2[None, :]
    kern, width, orig, new = _sinc_resample_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    length = x2.shape[-1]
    xp = jnp.pad(x2, ((0, 0), (width, width + orig)))[:, :, None]  # (N, L', 1)
    y = conv1d(xp, jnp.asarray(kern), stride=orig)  # (N, T, new)
    y = y.reshape(y.shape[0], -1)
    target_length = int(math.ceil(new * length / orig))
    y = y[:, :target_length]
    if x.ndim == 3:
        return y.reshape(B, C, target_length)
    if squeeze:
        return y[0]
    return y


def convert_audio(wav: jnp.ndarray, sr: int, target_sr: int,
                  target_channels: int) -> jnp.ndarray:
    """Channel conversion + resample (ref: encoder/utils.py:79-92).

    wav: (..., C, L) with C in {1, 2}.
    """
    assert wav.ndim >= 2, "Audio tensor must have at least 2 dimensions"
    assert wav.shape[-2] in [1, 2], "Audio must be mono or stereo."
    channels = wav.shape[-2]
    if target_channels == 1:
        wav = wav.mean(-2, keepdims=True)
    elif target_channels == 2:
        wav = jnp.broadcast_to(wav, (*wav.shape[:-2], target_channels, wav.shape[-1]))
    elif channels == 1:
        wav = jnp.broadcast_to(wav, (*wav.shape[:-2], target_channels, wav.shape[-1]))
    else:
        raise RuntimeError(f"Impossible to convert from {channels} to {target_channels}")
    shape = wav.shape
    wav = resample(wav.reshape(-1, shape[-1]), sr, target_sr)
    return wav.reshape(*shape[:-1], wav.shape[-1])


def linear_overlap_add(frames: list[jnp.ndarray], stride: int) -> jnp.ndarray:
    """Triangular-weighted overlap-add of decoded segments
    (ref: encoder/utils.py:17-56).  frames: list of (..., L_i)."""
    assert len(frames)
    dtype = frames[0].dtype
    shape = frames[0].shape[:-1]
    total_size = stride * (len(frames) - 1) + frames[-1].shape[-1]

    frame_length = frames[0].shape[-1]
    t = np.linspace(0, 1, frame_length + 2)[1:-1]
    weight = (0.5 - np.abs(t - 0.5)).astype(np.float32)

    sum_weight = jnp.zeros(total_size, dtype=dtype)
    out = jnp.zeros((*shape, total_size), dtype=dtype)
    offset = 0
    for frame in frames:
        fl = frame.shape[-1]
        w = jnp.asarray(weight[:fl])
        out = out.at[..., offset:offset + fl].add(w * frame)
        sum_weight = sum_weight.at[offset:offset + fl].add(w)
        offset += stride
    return out / sum_weight
