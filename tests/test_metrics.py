"""Objective metric suite sanity + behavioral tests (metrics/)."""

import numpy as np
import pytest

from wavtokenizer_tpu.metrics.objective import (envelope_similarity,
                                                mel_spectral_distance, snr_db,
                                                stoi)
from wavtokenizer_tpu.metrics.periodicity import (calculate_periodicity_metrics,
                                                  nac_pitch)


def _speechish(sr, seconds, f0, seed=0):
    """Harmonic tone with amplitude modulation (voiced-speech stand-in)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    sig = sum((0.5 / (k * k)) * np.sin(2 * np.pi * f0 * k * t)
              for k in range(1, 6))
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t)
    return (sig * env + rng.normal(size=t.size) * 0.005).astype(np.float32)


def test_stoi_identity_and_noise():
    sr = 16000
    x = _speechish(sr, 2.0, 150.0)
    assert stoi(x, x, sr) > 0.95
    noisy = x + np.random.default_rng(1).normal(size=x.size).astype(np.float32)
    assert stoi(x, noisy, sr) < stoi(x, x, sr)


def test_snr_and_envelope():
    x = _speechish(24000, 1.0, 200.0)
    assert snr_db(x, x) > 80
    assert abs(envelope_similarity(x, x) - 1.0) < 1e-5
    assert snr_db(x, x + 0.1 * np.std(x)) < 25


def test_mel_spectral_distance_orders_degradation():
    sr = 24000
    x = _speechish(sr, 1.0, 200.0)
    mild = x + np.random.default_rng(2).normal(size=x.size).astype(np.float32) * 0.01
    harsh = x + np.random.default_rng(3).normal(size=x.size).astype(np.float32) * 0.2
    d0 = mel_spectral_distance(x, x, sr)
    d1 = mel_spectral_distance(x, mild, sr)
    d2 = mel_spectral_distance(x, harsh, sr)
    assert d0 < d1 < d2


def test_nac_pitch_tracks_f0():
    sr = 16000
    for f0 in (120.0, 220.0):
        x = _speechish(sr, 1.0, f0)
        pitch, period = nac_pitch(x, sr)
        voiced = period > 0.5
        assert voiced.mean() > 0.5
        med = np.median(pitch[voiced])
        assert abs(med - f0) / f0 < 0.1, (f0, med)


def test_periodicity_metrics_self_and_shifted():
    sr = 16000
    x = _speechish(sr, 2.0, 180.0)
    per_rmse, pitch_rmse, f1 = calculate_periodicity_metrics(x, x, sr)
    assert per_rmse < 0.05 and f1 > 0.95
    assert pitch_rmse < 20  # cents, self-comparison
    # different pitch -> large cents error, f1 still high (both voiced)
    y = _speechish(sr, 2.0, 250.0)
    _, pitch_rmse2, _ = calculate_periodicity_metrics(x, y, sr)
    assert pitch_rmse2 > 100


def test_nac_vs_synthetic_sweep():
    """Published NAC accuracy bound (VERDICT r1 #9): on harmonic sweeps
    covering the CREPE range (80-400 Hz) with known instantaneous f0, the
    voiced-frame pitch RMSE stays under 60 cents (CREPE-full reports
    ~10-20 cents on such clean tones; the gap is the documented cost of the
    weight-free fallback — PARITY.md 'Pitch tracking').  Exact-parity
    tracking is available via metrics/crepe.py + WT_CREPE_CKPT."""
    from wavtokenizer_tpu.metrics.periodicity import HOP

    sr = 16000
    t = np.arange(2 * sr) / sr
    for lo, hi in ((80.0, 400.0), (400.0, 80.0)):
        f_inst = lo * (hi / lo) ** (t / t[-1])          # exponential sweep
        phase = 2 * np.pi * np.cumsum(f_inst) / sr
        x = sum((0.5 / (k * k)) * np.sin(k * phase) for k in range(1, 5))
        x = x.astype(np.float32)
        pitch, period = nac_pitch(x, sr)
        centers = np.arange(len(pitch)) * HOP + 512
        truth = f_inst[np.clip(centers, 0, len(f_inst) - 1)]
        voiced = period > 0.5
        assert voiced.mean() > 0.8
        cents = 1200 * np.abs(np.log2(pitch[voiced] / truth[voiced]))
        # ignore octave errors at the extremes of the lag grid (<2% frames)
        ok = cents < 600
        assert ok.mean() > 0.98, ok.mean()
        rmse = float(np.sqrt(np.mean(cents[ok] ** 2)))
        assert rmse < 60.0, rmse
