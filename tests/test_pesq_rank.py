"""Rank-correlation check for the native PESQ on codec-style degradations
(VERDICT r2 Next #7): val_loss ranks checkpoints on PESQ, so what matters
is ORDERING on reconstruction-like signals, not absolute MOS.  Build a
quality ladder by mixing a clean speech proxy with an actual random-weight
codec reconstruction (plus additive-noise rungs), then require the native
PESQ ordering to agree with mel-distance and STOI orderings
(Spearman >= 0.9).  Catches calibration drift exactly where the trainer
consumes the score (train/trainer.py::_host_val_metrics).
"""

import numpy as np
import pytest

from wavtokenizer_tpu.metrics.objective import (mel_spectral_distance,
                                                pesq_wb, stoi)
from wavtokenizer_tpu.train.data import resample_np

FS24, FS16 = 24000, 16000


def _spearman(a, b) -> float:
    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() /
                 np.sqrt((ra * ra).sum() * (rb * rb).sum()))


@pytest.fixture(scope="module")
def ladder():
    """(ref16, [deg16 ...]) ordered best->worst by construction."""
    rng = np.random.default_rng(0)
    t = np.arange(FS24 * 4) / FS24
    f0 = 140 + 30 * np.sin(2 * np.pi * 1.1 * t)
    sig = np.zeros_like(t)
    for k in range(1, 12):
        sig += (1.0 / k) * np.sin(2 * np.pi * np.cumsum(k * f0) / FS24)
    env = np.clip(np.sin(2 * np.pi * 2.3 * t), 0, None)
    sig = sig * env + 0.01 * rng.standard_normal(len(t))
    ref = (0.5 * sig / np.abs(sig).max()).astype(np.float32)

    # an actual codec reconstruction at random weights (garbage audio):
    # mixing toward it sweeps quality from transparent to fully coded-noise
    import jax
    from test_trainer_fit import _tiny_spec
    from wavtokenizer_tpu.api.pretrained import WavTokenizer
    from wavtokenizer_tpu.models.init import init_wavtokenizer

    spec = _tiny_spec()
    wt = WavTokenizer(jax.device_put(
        init_wavtokenizer(spec, seed=0, random_codebook=True)), spec)
    recon = np.asarray(wt(ref[: FS24 * 4], bandwidth_id=0))[0]
    recon = recon[:len(ref)] / max(1e-6, np.abs(recon).max()) * 0.5

    degs = []
    for lam in (0.97, 0.9, 0.75, 0.55, 0.3):   # best -> worst mix rungs
        degs.append(lam * ref + (1 - lam) * recon)
    for snr in (25.0, 12.0):                   # additive-noise rungs
        n = rng.standard_normal(len(ref)).astype(np.float32)
        n *= np.sqrt((ref ** 2).mean() / (n ** 2).mean()) * 10 ** (-snr / 20)
        degs.append(ref + n)

    ref16 = resample_np(ref, FS24, FS16)
    degs16 = [resample_np(d.astype(np.float32), FS24, FS16) for d in degs]
    return ref16, degs16


def test_native_pesq_rank_correlates_with_mel_and_stoi(ladder):
    ref16, degs16 = ladder
    scores_pesq = np.array([pesq_wb(ref16, d, FS16) for d in degs16],
                           dtype=np.float64)
    assert np.all(np.isfinite(scores_pesq))
    d_mel = np.array([mel_spectral_distance(ref16, d, FS16) for d in degs16])
    s_stoi = np.array([stoi(ref16, d, FS16) for d in degs16])

    # PESQ must rank like the independent quality axes: negatively with
    # mel distance, positively with STOI
    rho_mel = _spearman(scores_pesq, -d_mel)
    rho_stoi = _spearman(scores_pesq, s_stoi)
    assert rho_mel >= 0.9, (rho_mel, scores_pesq.tolist(), d_mel.tolist())
    assert rho_stoi >= 0.9, (rho_stoi, scores_pesq.tolist(), s_stoi.tolist())

    # and the constructed mix ladder itself must be monotone in PESQ
    mix = scores_pesq[:5]
    assert np.all(np.diff(mix) < 0), mix.tolist()
