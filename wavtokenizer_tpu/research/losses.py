"""Research-layer losses for the enhancement stack.

Behavioral contracts:
* voice_focused_loss — try3.py:834-874: 0.3*L1(time) + 0.7 * sum over
  n_fft in (2048, 1024, 512) of mean((|X|-|Y|| + 0.3*(1-cos(angle diff)))
  * voice_weights) with 3x weight on the 80-3400 Hz band (the reference's
  `torch.linspace(0, 12000, n_bins)` frequency axis is kept verbatim,
  including its hard-coded 12 kHz Nyquist).
* feature_loss — tsne.py:152-169: mean channel-wise L2 distance between
  enhanced and clean-target features.
* hybrid tsne loss — train_with_tsne.py:52-90: 0.7*voice_focused +
  0.3*(1 - cosine similarity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spectral import stft


def _weighted_stft_loss(x: jnp.ndarray, y: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """Single-resolution weighted STFT loss (try3.py:851-864).
    torch.stft defaults: hop n_fft//4, rectangular window, center reflect."""
    hop = n_fft // 4
    ones = np.ones(n_fft, np.float32)
    X = stft(x, n_fft, hop, window=ones)  # (B, T, F)
    Y = stft(y, n_fft, hop, window=ones)
    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0, 12000, n_bins)
    weights = 1.0 + ((freqs >= 80) & (freqs <= 3400)).astype(np.float32) * 2.0
    mag = jnp.abs(jnp.abs(X) - jnp.abs(Y))
    phase = 1.0 - jnp.cos(jnp.angle(X) - jnp.angle(Y))
    return jnp.mean((mag + 0.3 * phase) * jnp.asarray(weights))


def voice_focused_loss(output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(B, T) waveforms -> scalar (try3.py:834-874)."""
    n = min(output.shape[-1], target.shape[-1])
    output, target = output[..., :n], target[..., :n]
    time_loss = jnp.mean(jnp.abs(output - target))
    stft_total = (_weighted_stft_loss(output, target, 2048)
                  + _weighted_stft_loss(output, target, 1024)
                  + _weighted_stft_loss(output, target, 512))
    return 0.3 * time_loss + 0.7 * stft_total


def feature_loss(enhanced: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """(B, T', D) feature tensors -> scalar L2 distance (tsne.py:152-169;
    the blessed variant returns the distance term only)."""
    return jnp.mean(jnp.linalg.norm(enhanced - target, axis=-1))


def cosine_similarity_loss(enhanced: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """1 - mean cosine similarity along the channel axis
    (train_with_tsne.py:52-90's 't-SNE' term)."""
    e = enhanced / (jnp.linalg.norm(enhanced, axis=-1, keepdims=True) + 1e-8)
    t = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + 1e-8)
    return 1.0 - jnp.mean(jnp.sum(e * t, axis=-1))


def hybrid_tsne_loss(output: jnp.ndarray, target_audio: jnp.ndarray,
                     enhanced_feats: jnp.ndarray,
                     target_feats: jnp.ndarray) -> jnp.ndarray:
    """0.7 voice-focused + 0.3 cosine (train_with_tsne.py:52-90)."""
    return (0.7 * voice_focused_loss(output, target_audio)
            + 0.3 * cosine_similarity_loss(enhanced_feats, target_feats))
