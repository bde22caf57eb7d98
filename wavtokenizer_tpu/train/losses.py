"""GAN + reconstruction losses (ref: decoder/loss.py:12-158).

Pure functions over logits / feature maps; the loss *weights* and wiring
live in train.step (mirroring decoder/experiment.py:121-218).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.spectral import mel_spectrogram, safe_log
from .discriminators import dac_discriminator


def mel_loss(y_hat: jnp.ndarray, y: jnp.ndarray, sample_rate: int = 24000,
             n_fft: int = 1024, hop_length: int = 256, n_mels: int = 100) -> jnp.ndarray:
    """L1 between safe_log mel magnitudes (ref: loss.py:12-39)."""
    mel_hat = safe_log(mel_spectrogram(y_hat, sample_rate, n_fft, hop_length,
                                       n_mels, power=1.0))
    mel = safe_log(mel_spectrogram(y, sample_rate, n_fft, hop_length,
                                   n_mels, power=1.0))
    return jnp.mean(jnp.abs(mel - mel_hat))


def hinge_generator_loss(disc_outputs: list) -> jnp.ndarray:
    """sum of mean(clamp(1 - dg, min=0)) (ref: loss.py:42-63); caller divides
    by len(disc_outputs) as experiment.py:164-165 does."""
    loss = 0.0
    for dg in disc_outputs:
        loss = loss + jnp.mean(jnp.maximum(1.0 - dg, 0.0))
    return loss


def hinge_discriminator_loss(disc_real: list, disc_gen: list) -> jnp.ndarray:
    """sum of hinge real+fake terms (ref: loss.py:66-94); caller divides by
    the sub-discriminator count (experiment.py:140-141)."""
    loss = 0.0
    for dr, dg in zip(disc_real, disc_gen):
        loss = loss + jnp.mean(jnp.maximum(1.0 - dr, 0.0))
        loss = loss + jnp.mean(jnp.maximum(1.0 + dg, 0.0))
    return loss


def feature_matching_loss(fmap_r: list, fmap_g: list) -> jnp.ndarray:
    """sum over discs and layers of mean |real - gen| (ref: loss.py:97-116)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss


def dac_discriminator_loss(disc_params: dict, fake: jnp.ndarray,
                           real: jnp.ndarray) -> jnp.ndarray:
    """Least-squares disc loss over conv_post outputs (ref: loss.py:137-144).
    `fake` must already be detached by the caller (lax.stop_gradient)."""
    d_fake = dac_discriminator(disc_params, fake)
    d_real = dac_discriminator(disc_params, real)
    loss = 0.0
    for x_fake, x_real in zip(d_fake, d_real):
        loss = loss + jnp.mean(x_fake[-1] ** 2)
        loss = loss + jnp.mean((1.0 - x_real[-1]) ** 2)
    return loss


def dac_generator_loss(disc_params: dict, fake: jnp.ndarray,
                       real: jnp.ndarray):
    """LS generator loss + L1 feature loss (ref: loss.py:146-158).
    Returns (loss_g, loss_feature)."""
    import jax
    d_fake = dac_discriminator(disc_params, fake)
    d_real = dac_discriminator(disc_params, real)
    loss_g = 0.0
    for x_fake in d_fake:
        loss_g = loss_g + jnp.mean((1.0 - x_fake[-1]) ** 2)
    loss_feature = 0.0
    for i in range(len(d_fake)):
        for j in range(len(d_fake[i]) - 1):
            loss_feature = loss_feature + jnp.mean(
                jnp.abs(d_fake[i][j] - jax.lax.stop_gradient(d_real[i][j])))
    return loss_g, loss_feature
