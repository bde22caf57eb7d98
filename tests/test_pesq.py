"""Property tests for the native wideband PESQ (metrics/pesq_native.py).

No ITU oracle exists in this image (the `pesq` package is not
installed), so these pin the P.862 properties that are exact by
construction — the clean-signal ceiling, level invariance, delay
compensation — plus monotonicity under additive noise and the
calibration anchors fitted in the module (see its docstring).
Reference behavior being reproduced: metrics/infer.py's
``pesq(16000, ref, deg, "wb")`` scoring of codec resyntheses.
"""

import numpy as np
import pytest

from wavtokenizer_tpu.metrics.objective import pesq_wb
from wavtokenizer_tpu.metrics.pesq_native import pesq_wb_native

FS = 16000


@pytest.fixture(scope="module")
def speech_like():
    """4 s harmonic, AM-modulated, noise-floored signal (speech proxy)."""
    rng = np.random.default_rng(0)
    t = np.arange(FS * 4) / FS
    f0 = 140 + 30 * np.sin(2 * np.pi * 1.1 * t)
    sig = np.zeros_like(t)
    for k in range(1, 12):
        sig += (1.0 / k) * np.sin(2 * np.pi * np.cumsum(k * f0) / FS)
    env = np.clip(np.sin(2 * np.pi * 2.3 * t), 0, None)
    sig = sig * env + 0.01 * rng.standard_normal(len(t))
    return (sig / np.abs(sig).max()).astype(np.float64)


def _noisy(sig, snr_db, seed=1):
    n = np.random.default_rng(seed).standard_normal(len(sig))
    n *= np.sqrt((sig ** 2).mean() / (n ** 2).mean()) * 10 ** (-snr_db / 20)
    return sig + n


def test_identical_hits_wb_ceiling(speech_like):
    # raw 4.5 through the P.862.2 logistic = 4.64389 exactly
    assert pesq_wb_native(speech_like, speech_like) == pytest.approx(
        4.643888, abs=1e-4)


def test_level_invariance(speech_like):
    # level alignment scales both to the same 350-3250 Hz band power
    for g in (0.25, 0.5, 2.0):
        assert pesq_wb_native(speech_like, g * speech_like) == pytest.approx(
            4.643888, abs=1e-3)


@pytest.mark.parametrize("delay_ms", [12, 40, -25])
def test_delay_compensated(speech_like, delay_ms):
    # time alignment must absorb a constant offset (codec latency);
    # score stays near-ceiling (edge frames compare signal vs padding)
    d = int(abs(delay_ms) * FS / 1000)
    if delay_ms > 0:
        ref, deg = speech_like, np.concatenate([np.zeros(d), speech_like])
    else:
        ref, deg = np.concatenate([np.zeros(d), speech_like]), speech_like
    assert pesq_wb_native(ref, deg) > 4.3


def test_monotonic_in_noise(speech_like):
    scores = [pesq_wb_native(speech_like, _noisy(speech_like, snr))
              for snr in (35, 25, 15, 5)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    # calibration anchors (published WB white-noise curve), +-0.6 MOS
    for s, anchor in zip(scores, (4.2, 3.2, 2.3, 1.5)):
        assert abs(s - anchor) < 0.6, (scores,)
    assert all(1.0 <= s <= 4.644 for s in scores)


def test_uncorrelated_signal_scores_low(speech_like):
    rng = np.random.default_rng(7)
    junk = rng.standard_normal(len(speech_like)) * 0.1
    assert pesq_wb_native(speech_like, junk) < 2.5


def test_mild_lowpass_scores_high(speech_like):
    # linear filtering is partially equalized out (freq compensation)
    spec = np.fft.rfft(speech_like)
    mask = np.fft.rfftfreq(len(speech_like), 1 / FS) < 4000
    deg = np.fft.irfft(spec * mask, len(speech_like))
    assert pesq_wb_native(speech_like, deg) > 4.0


def test_too_short_returns_nan():
    x = np.zeros(100)
    assert np.isnan(pesq_wb_native(x, x))


def test_wrapper_resamples_and_falls_back(speech_like, monkeypatch):
    # pesq_wb at 24 kHz: resample to 16 k then native fallback
    monkeypatch.delenv("WT_NATIVE_PESQ", raising=False)
    from wavtokenizer_tpu.train.data import resample_np
    sig24 = resample_np(speech_like.astype(np.float32), FS, 24000)
    v = pesq_wb(sig24, sig24, 24000)
    assert v is not None and v > 4.5
    monkeypatch.setenv("WT_NATIVE_PESQ", "0")
    assert pesq_wb(speech_like, speech_like, FS) is None
