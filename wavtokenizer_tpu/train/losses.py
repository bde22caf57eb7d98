"""GAN + reconstruction losses (ref: decoder/loss.py:12-158).

Pure functions over logits / feature maps; the loss *weights* and wiring
live in train.step (mirroring decoder/experiment.py:121-218).

Two shapes of the same math:

* list-level primitives (``hinge_*``, ``feature_matching_loss``,
  ``dac_*_loss``) — operate on pre-computed scores/fmaps, used by parity
  tests and the non-remat path;
* fused per-sub-discriminator losses (``*_fused``) — run ONE
  sub-discriminator forward *and its scalar loss terms* inside a single
  ``jax.checkpoint``, so only scalars cross checkpoint boundaries.  This
  is the memory-correct remat granularity: one checkpoint around a whole
  family keeps every recomputed stack live through the backward sweep
  (measured 5.9 GiB of DAC temps at batch 40 x 3 s), while checkpointing
  the sub-discriminator *forwards* alone materializes every fmap (and its
  cotangent) at the boundary — measured even worse.  Each fused scalar is
  built from the list-level primitives on singleton lists, so parity with
  the reference formulas holds by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.spectral import mel_spectrogram, safe_log
from .discriminators import (VOCOS_MPD_PERIODS, VOCOS_MRD_RESOLUTIONS,
                             _dac_preprocess, dac_discriminator,
                             discriminator_p, discriminator_r)


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


# --------------------------------------------------------------------------
# Fused per-sub-discriminator losses (scalar-output remat granularity)
# --------------------------------------------------------------------------

def _ckpt(fn, remat: bool):
    return jax.checkpoint(fn) if remat else fn


def _vocos_subs(params: list, family: str):
    if family == "mpd":
        return [(p, partial(discriminator_p, period=per))
                for p, per in zip(params, VOCOS_MPD_PERIODS)]
    return [(p, partial(discriminator_r, resolution=res))
            for p, res in zip(params, VOCOS_MRD_RESOLUTIONS)]


def vocos_disc_loss_fused(params: list, family: str, y: jnp.ndarray,
                          y_hat: jnp.ndarray, bandwidth_id=None,
                          remat: bool = False,
                          compute_dtype=None) -> jnp.ndarray:
    """Discriminator-phase hinge loss for one Vocos family, already divided
    by the sub-discriminator count (= hinge_discriminator_loss(...) / len
    as experiment.py:140-148 wires it).  The real and fake hinge terms are
    separable, so each gets its OWN checkpoint — halving the per-stack
    backward-recompute peak (one conv stack live instead of two).
    ``compute_dtype`` runs the conv stacks in that dtype (mixed-precision
    training, see discriminators._cast_floats); the hinge means are f32."""
    def real_term(p, y, bw, _fwd):
        r, _ = _fwd(p, x=y, cond_embedding_id=bw, compute_dtype=compute_dtype)
        return jnp.mean(jnp.maximum(1.0 - r.astype(jnp.float32), 0.0))

    def fake_term(p, y_hat, bw, _fwd):
        g, _ = _fwd(p, x=y_hat, cond_embedding_id=bw,
                    compute_dtype=compute_dtype)
        return jnp.mean(jnp.maximum(1.0 + g.astype(jnp.float32), 0.0))

    subs = _vocos_subs(params, family)
    total = 0.0
    for p, fwd in subs:
        total = total + _ckpt(partial(real_term, _fwd=fwd), remat)(
            p, y, bandwidth_id)
        total = total + _ckpt(partial(fake_term, _fwd=fwd), remat)(
            p, y_hat, bandwidth_id)
    return total / len(subs)


def vocos_gen_loss_fused(params: list, family: str, y: jnp.ndarray,
                         y_hat: jnp.ndarray, bandwidth_id=None,
                         remat: bool = False, compute_dtype=None):
    """Generator-phase (hinge_gen, feature_matching) for one Vocos family,
    each divided by the sub-discriminator count (experiment.py:164-171)."""
    def one(p, y, y_hat, bw, _fwd):
        # Fake and real share one conv stack at batch 2B: both are live
        # simultaneously in this checkpoint's backward anyway (the FM loss
        # pairs them), and one 2B conv pads 2B->128 lanes once (1.6x at
        # B=40) instead of twice at 3.2x — ~halving the recompute peak.
        nb = y.shape[0]
        out, fmap = _fwd(p, x=jnp.concatenate([y_hat, y], axis=0),
                         cond_embedding_id=bw, compute_dtype=compute_dtype)
        # f32 loss math (casts fuse into the abs/maximum elementwise ops)
        fmap_g = [a[:nb].astype(jnp.float32) for a in fmap]
        fmap_r = [a[nb:].astype(jnp.float32) for a in fmap]
        return (hinge_generator_loss([out[:nb].astype(jnp.float32)]),
                feature_matching_loss([fmap_r], [fmap_g]))

    subs = _vocos_subs(params, family)
    total_g, total_fm = 0.0, 0.0
    for p, fwd in subs:
        lg, lfm = _ckpt(partial(one, _fwd=fwd), remat)(p, y, y_hat,
                                                       bandwidth_id)
        total_g, total_fm = total_g + lg, total_fm + lfm
    return total_g / len(subs), total_fm / len(subs)


def _dac_mrd_conv_post(sub_params: dict, n_fft: int, x: jnp.ndarray,
                       remat: bool, collect_l1_vs=None, compute_dtype=None):
    """One DAC MRD sub-discriminator at BAND granularity: each band's conv
    stack runs in its own checkpoint (one band ~0.6 GiB of recompute temps
    vs ~2.8 GiB for the whole fake+real pair at batch 40).  Returns the
    conv_post output; when ``collect_l1_vs`` is the matching real
    spectrogram, each band checkpoint also emits its feature-matching L1
    sum (real stack recomputed inside, stop-gradient semantics)."""
    from .discriminators import (_dac_mrd_band, _dac_mrd_band_slices,
                                 _dac_mrd_post, _dac_mrd_spectrogram)

    spec = _dac_mrd_spectrogram(x, n_fft)
    spec_r = (_dac_mrd_spectrogram(collect_l1_vs, n_fft)
              if collect_l1_vs is not None else None)
    outs, l1 = [], 0.0
    for (lo, hi), stack in zip(_dac_mrd_band_slices(n_fft),
                               sub_params["bands"]):
        if spec_r is None:
            def band(bp, s):
                return _dac_mrd_band(bp, s, compute_dtype=compute_dtype)[-1]
            outs.append(_ckpt(band, remat)(stack, spec[:, :, lo:hi, :]))
        else:
            def band(bp, s, sr):
                # fake+real as one batch-2B stack (see vocos_gen_loss_fused
                # .one for the lane-padding rationale)
                nb = s.shape[0]
                fm = _dac_mrd_band(bp, jnp.concatenate([s, sr], axis=0),
                                   compute_dtype=compute_dtype)
                lf = 0.0
                for a in fm:
                    a = a.astype(jnp.float32)
                    lf = lf + jnp.mean(
                        jnp.abs(a[:nb] - jax.lax.stop_gradient(a[nb:])))
                return lf, fm[-1][:nb]
            lf, out = _ckpt(band, remat)(stack, spec[:, :, lo:hi, :],
                                         spec_r[:, :, lo:hi, :])
            outs.append(out)
            l1 = l1 + lf
    return _dac_mrd_post(sub_params["conv_post"], outs,
                         compute_dtype=compute_dtype), l1


def _dac_subs_split(disc_params: dict):
    """(kind, params, fwd_or_nfft) triplets: MPD subs keep their whole-stack
    forward; MRD subs are handled at band granularity."""
    from .discriminators import DAC_FFT_SIZES, DAC_PERIODS, _dac_mpd
    subs = []
    for p, period in zip(disc_params["dac_mpd"], DAC_PERIODS):
        subs.append(("mpd", p, partial(_dac_mpd, period=period)))
    for p, n_fft in zip(disc_params["dac_mrd"], DAC_FFT_SIZES):
        subs.append(("mrd", p, n_fft))
    return subs


def dac_disc_loss_fused(disc_params: dict, fake: jnp.ndarray,
                        real: jnp.ndarray, remat: bool = False,
                        compute_dtype=None) -> jnp.ndarray:
    """= dac_discriminator_loss, with per-(stack, input) scalar checkpoints
    (the fake and real LS terms are separable, see vocos_disc_loss_fused);
    MRD stacks checkpoint per band."""
    fake = _dac_preprocess(fake)
    real = _dac_preprocess(real)

    def mpd_fake(p, x, _f):
        o = _f(p, x=x, compute_dtype=compute_dtype)[-1].astype(jnp.float32)
        return jnp.mean(o ** 2)

    def mpd_real(p, x, _f):
        o = _f(p, x=x, compute_dtype=compute_dtype)[-1].astype(jnp.float32)
        return jnp.mean((1.0 - o) ** 2)

    loss = 0.0
    for kind, p, fwd in _dac_subs_split(disc_params):
        if kind == "mpd":
            loss = loss + _ckpt(partial(mpd_fake, _f=fwd), remat)(p, fake)
            loss = loss + _ckpt(partial(mpd_real, _f=fwd), remat)(p, real)
        else:
            out_f, _ = _dac_mrd_conv_post(p, fwd, fake, remat,
                                          compute_dtype=compute_dtype)
            out_r, _ = _dac_mrd_conv_post(p, fwd, real, remat,
                                          compute_dtype=compute_dtype)
            out_f = out_f.astype(jnp.float32)
            out_r = out_r.astype(jnp.float32)
            loss = loss + jnp.mean(out_f ** 2) + jnp.mean((1.0 - out_r) ** 2)
    return loss


def dac_gen_loss_fused(disc_params: dict, fake: jnp.ndarray,
                       real: jnp.ndarray, remat: bool = False,
                       compute_dtype=None):
    """= dac_generator_loss, with per-stack (MPD) / per-band (MRD) scalar
    checkpoints."""
    fake = _dac_preprocess(fake)
    real = _dac_preprocess(real)

    def mpd_pair(p, fake, real, _fwd):
        # fake+real as one batch-2B stack (see vocos_gen_loss_fused.one)
        nb = fake.shape[0]
        fm = _fwd(p, x=jnp.concatenate([fake, real], axis=0),
                  compute_dtype=compute_dtype)
        fm = [a.astype(jnp.float32) for a in fm]
        lg = jnp.mean((1.0 - fm[-1][:nb]) ** 2)
        lf = 0.0
        for a in fm[:-1]:
            lf = lf + jnp.mean(
                jnp.abs(a[:nb] - jax.lax.stop_gradient(a[nb:])))
        return lg, lf

    loss_g, loss_feature = 0.0, 0.0
    for kind, p, fwd in _dac_subs_split(disc_params):
        if kind == "mpd":
            lg, lf = _ckpt(partial(mpd_pair, _fwd=fwd), remat)(p, fake, real)
        else:
            out_f, lf = _dac_mrd_conv_post(p, fwd, fake, remat,
                                           collect_l1_vs=real,
                                           compute_dtype=compute_dtype)
            lg = jnp.mean((1.0 - out_f.astype(jnp.float32)) ** 2)
        loss_g, loss_feature = loss_g + lg, loss_feature + lf
    return loss_g, loss_feature
