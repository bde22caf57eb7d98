"""Native CREPE-full pitch tracker (the reference's torchcrepe dependency).

Behavioral contract: reference metrics/periodicity.py:16-67 calls
``torchcrepe.predict(audio, fmin=50, fmax=550, sample_rate=16000,
model="full", return_periodicity=True, pad=False)`` — CREPE's 6-layer conv
net over 1024-sample frames at hop 160 (10 ms), sigmoid salience over 360
pitch bins, viterbi decoding, periodicity = salience at the decoded bin.

torchcrepe downloads its weights at install time; this zero-egress image
cannot, so the model GRAPH is implemented natively (jit, channel-last,
frames batched into one device call) plus a converter from the torchcrepe
state-dict layout (``conv1.weight`` … ``conv6_BN.running_var``,
``classifier.*``).  Scoring is available whenever a local checkpoint is
supplied (``WT_CREPE_CKPT`` or an explicit path); graph + converter parity
is pinned by ``tests/test_crepe.py`` against a randomly-initialized torch
oracle replicating torchcrepe's model.py exactly.

Architecture (torchcrepe/model.py, model="full"): per frame (1024,) ->
x[:, None, :, None]; six layers of [pad time -> Conv2d(k=(512,1) s=(4,1)
for layer 1, k=(64,1) s=1 after) -> relu -> BatchNorm(eps=1e-3) ->
maxpool (2,1)]; layer 1 pads (254, 254), layers 2-6 pad (31, 32); the
(B, 512, 4, 1) output permutes to (B, 4, 512, 1) -> reshape (B, 2048) ->
Linear -> sigmoid over 360 bins.

Decoding (torchcrepe/decode.py viterbi): softmax over bins, viterbi with
the banded transition max(12 - |i-j|, 0) row-normalized, uniform init;
bins -> cents = 20*bin + 1997.3794084376191 -> Hz = 10 * 2**(cents/1200).
torchcrepe adds triangular dither (+-20 cents) to decoded cents; we default
it OFF (deterministic metrics) with ``dither=True`` for bug-parity.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

SAMPLE_RATE = 16000
WINDOW_SIZE = 1024
PITCH_BINS = 360
CENTS_PER_BIN = 20.0
CENTS_OFFSET = 1997.3794084376191
UNVOICED = float("nan")
# torchcrepe/loudness.py REF_DB
REF_DB = 20.0

# (out_channels, kernel, stride, (pad_lo, pad_hi)) per layer, model="full"
FULL_LAYERS = (
    (1024, 512, 4, (254, 254)),
    (128, 64, 1, (31, 32)),
    (128, 64, 1, (31, 32)),
    (128, 64, 1, (31, 32)),
    (256, 64, 1, (31, 32)),
    (512, 64, 1, (31, 32)),
)
BN_EPS = 1e-3   # torchcrepe's keras-converted BatchNorm eps (0.001f)


def crepe_salience(params: dict, frames: jnp.ndarray) -> jnp.ndarray:
    """Normalized frames (N, 1024) -> sigmoid pitch salience (N, 360).

    Channel-last conv1d over the time axis (the reference's Conv2d trailing
    width-1 axis is dead weight on any backend; XLA maps these onto the
    MXU as batched GEMMs).
    """
    x = frames[:, :, None]                      # (N, T, C=1)
    for (_, k, s, (lo, hi)), lp in zip(FULL_LAYERS, params["layers"]):
        x = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
        x = jax.lax.conv_general_dilated(
            x, lp["weight"], window_strides=(s,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC")) + lp["bias"]
        x = jax.nn.relu(x)
        # inference BatchNorm: per-channel affine with running stats
        x = (x - lp["bn_mean"]) * jax.lax.rsqrt(lp["bn_var"] + BN_EPS)
        x = x * lp["bn_weight"] + lp["bn_bias"]
        # maxpool (2, 1): pairwise max over time
        x = jnp.maximum(x[:, 0::2], x[:, 1::2])
    # (N, 4, 512): torch permutes (B, C, T', 1)->(B, T', C) then flattens,
    # which is exactly our (N, T', C) layout row-major
    x = x.reshape(x.shape[0], -1)
    return jax.nn.sigmoid(x @ params["classifier"]["weight"]
                          + params["classifier"]["bias"])


@jax.jit
def _salience_jit(params, frames):
    return crepe_salience(params, frames)


def frame_audio(audio: np.ndarray, hop_length: int = 160) -> np.ndarray:
    """(T,) 16 kHz audio -> per-frame normalized windows (N, 1024)
    (torchcrepe/core.py preprocess with pad=False: 1024-sample frames every
    ``hop_length``, mean-centered, scaled by the unbiased std)."""
    audio = np.asarray(audio, np.float32)
    if len(audio) < WINDOW_SIZE:
        audio = np.pad(audio, (0, WINDOW_SIZE - len(audio)))
    n = 1 + (len(audio) - WINDOW_SIZE) // hop_length
    idx = (np.arange(n)[:, None] * hop_length
           + np.arange(WINDOW_SIZE)[None, :])
    frames = audio[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)
    std = frames.std(axis=1, ddof=1, keepdims=True)   # torch std: unbiased
    return frames / np.maximum(std, 1e-10)


def frequency_to_bins(freq: float, quantize=np.floor) -> int:
    cents = 1200.0 * np.log2(freq / 10.0)
    return int(quantize((cents - CENTS_OFFSET) / CENTS_PER_BIN))


def bins_to_frequency(bins: np.ndarray, dither: bool = False,
                      seed: int = 0) -> np.ndarray:
    cents = CENTS_PER_BIN * bins + CENTS_OFFSET
    if dither:
        # torchcrepe/convert.py dither: triangular noise on (-20, 20) cents
        rng = np.random.default_rng(seed)
        cents = cents + rng.triangular(-CENTS_PER_BIN, 0.0, CENTS_PER_BIN,
                                       size=cents.shape)
    return 10.0 * 2.0 ** (cents / 1200.0)


_VITERBI_TRANSITION = None


def viterbi_decode(posterior: np.ndarray) -> np.ndarray:
    """Max-product path over (T, 360) frame posteriors.

    Equivalent to librosa.sequence.viterbi with torchcrepe's banded
    transition matrix max(12 - |i-j|, 0) (row-normalized) and a uniform
    initial distribution, in log space.
    """
    global _VITERBI_TRANSITION
    if _VITERBI_TRANSITION is None:
        i = np.arange(PITCH_BINS)
        t = np.maximum(12.0 - np.abs(i[:, None] - i[None, :]), 0.0)
        _VITERBI_TRANSITION = np.log(t / t.sum(axis=1, keepdims=True)
                                     + 1e-300)
    log_t = _VITERBI_TRANSITION
    log_p = np.log(np.maximum(posterior, 1e-300))
    T = log_p.shape[0]
    score = log_p[0] - np.log(PITCH_BINS)
    back = np.zeros((T, PITCH_BINS), np.int32)
    for t in range(1, T):
        cand = score[:, None] + log_t            # (from, to)
        back[t] = cand.argmax(axis=0)
        score = cand.max(axis=0) + log_p[t]
    path = np.zeros(T, np.int64)
    path[-1] = score.argmax()
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1][path[t + 1]]
    return path


def crepe_predict(params: dict, audio: np.ndarray, fmin: float = 50.0,
                  fmax: float = 550.0, hop_length: int = 160,
                  decoder: str = "viterbi", batch_size: int = 512,
                  dither: bool = False):
    """torchcrepe.predict(…, model="full", return_periodicity=True,
    pad=False) for one clip: (pitch_hz (N,), periodicity (N,)).

    periodicity is the SIGMOID salience at the decoded bin (torchcrepe
    core.periodicity); decoding runs on the softmax posterior
    (decode.viterbi) restricted to [fmin, fmax] bins.
    """
    frames = frame_audio(audio, hop_length)
    sal = np.concatenate(
        [np.asarray(_salience_jit(params,
                                  jnp.asarray(frames[i:i + batch_size])))
         for i in range(0, len(frames), batch_size)], axis=0)

    lo = frequency_to_bins(fmin)
    hi = frequency_to_bins(fmax, np.ceil)
    masked = sal.copy()
    masked[:, :lo] = -np.inf
    masked[:, hi:] = -np.inf

    if decoder == "viterbi":
        e = np.exp(masked - masked.max(axis=1, keepdims=True))
        posterior = e / e.sum(axis=1, keepdims=True)
        bins = viterbi_decode(posterior)
    elif decoder == "argmax":
        bins = masked.argmax(axis=1)
    else:
        raise ValueError(decoder)

    pitch = bins_to_frequency(bins, dither=dither)
    periodicity = sal[np.arange(len(bins)), bins]
    return pitch.astype(np.float32), periodicity.astype(np.float32)


def perceptual_silence_mask(audio: np.ndarray, hop_length: int = 160,
                            threshold_db: float = -60.0) -> np.ndarray:
    """Reference silence gate (metrics/periodicity.py:47-63): hann power
    STFT (n_fft=1024, center=False), A-weighted dB (librosa
    perceptual_weighting: power_to_db with amin=1e-10 / top_db=80 + the
    IEC 61672 A-curve), minus torchcrepe REF_DB; frames whose freq-mean sits
    under ``threshold_db`` are silent.  True = silent."""
    audio = np.asarray(audio, np.float32)
    if len(audio) < WINDOW_SIZE:
        audio = np.pad(audio, (0, WINDOW_SIZE - len(audio)))
    n = 1 + (len(audio) - WINDOW_SIZE) // hop_length
    idx = (np.arange(n)[:, None] * hop_length
           + np.arange(WINDOW_SIZE)[None, :])
    win = np.hanning(WINDOW_SIZE + 1)[:-1].astype(np.float32)  # periodic
    spec = np.abs(np.fft.rfft(audio[idx] * win, axis=1)) ** 2   # (N, F)

    # librosa.A_weighting: 2.0 + 20*log10(c0*f^4 / ((f^2+c0)(f^2+c1)
    # sqrt((f^2+c2)(f^2+c3)))), clamped at min_db=-80
    freqs = np.fft.rfftfreq(WINDOW_SIZE, 1.0 / SAMPLE_RATE)
    f2 = freqs ** 2
    const = np.array([12194.217, 20.598997, 107.65265, 737.86223]) ** 2
    num = const[0] * f2 ** 2
    den = ((f2 + const[0]) * (f2 + const[1])
           * np.sqrt((f2 + const[2]) * (f2 + const[3])))
    a_db = 2.0 + 20.0 * np.log10(np.maximum(num / np.maximum(den, 1e-30),
                                            1e-30))
    a_db = np.maximum(a_db, -80.0)

    s_db = 10.0 * np.log10(np.maximum(spec, 1e-10))
    s_db = np.maximum(s_db, s_db.max() - 80.0)          # top_db=80
    weighted = s_db + a_db[None, :] - REF_DB
    return weighted.mean(axis=1) < threshold_db


def predict_pitch(params: dict, audio: np.ndarray,
                  silence_threshold: float = -60.0,
                  unvoiced_threshold: float = 0.21):
    """Reference predict_pitch (metrics/periodicity.py:16-67) with the
    native CREPE: viterbi pitch + periodicity, silent frames' periodicity
    zeroed, pitch = nan where periodicity < 0.21."""
    pitch, periodicity = crepe_predict(params, audio)
    silence = perceptual_silence_mask(audio)
    m = min(len(pitch), len(silence))
    pitch, periodicity, silence = pitch[:m], periodicity[:m], silence[:m]
    periodicity = np.where(silence, 0.0, periodicity)
    pitch = np.where(periodicity < unvoiced_threshold, UNVOICED, pitch)
    return pitch, periodicity


def crepe_periodicity_metrics(params: dict, ref: np.ndarray,
                              deg: np.ndarray):
    """Reference calculate_periodicity_metrics (periodicity.py:70-105):
    (periodicity RMSE, pitch RMSE cents on voiced∩voiced, voiced F1)."""
    p_r, per_r = predict_pitch(params, ref)
    p_d, per_d = predict_pitch(params, deg)
    m = min(len(p_r), len(p_d))
    p_r, per_r, p_d, per_d = p_r[:m], per_r[:m], p_d[:m], per_d[:m]

    v_r, v_d = ~np.isnan(p_r), ~np.isnan(p_d)
    periodicity_loss = float(np.sqrt(np.mean((per_d - per_r) ** 2)))
    voiced = v_r & v_d
    if voiced.any():
        cents = 1200.0 * (np.log2(p_r[voiced]) - np.log2(p_d[voiced]))
        pitch_loss = float(np.sqrt(np.mean(cents ** 2)))
    else:
        pitch_loss = float("nan")
    tp = float((v_r & v_d).sum())
    fp = float((~v_r & v_d).sum())
    fn = float((v_r & ~v_d).sum())
    precision = tp / max(tp + fp, 1e-9)
    recall = tp / max(tp + fn, 1e-9)
    f1 = 2 * precision * recall / max(precision + recall, 1e-9)
    return periodicity_loss, pitch_loss, float(f1)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (torchcrepe state-dict layout)
# ---------------------------------------------------------------------------

def crepe_params_from_torch(sd: dict) -> dict:
    """torchcrepe ``Crepe('full').state_dict()`` -> params pytree.

    Layer i lives under ``conv{i}`` / ``conv{i}_BN``; conv weights are torch
    Conv2d (Cout, Cin, K, 1) -> our (K, Cin, Cout).
    """
    def a(key):
        v = sd[key]
        return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                          else v, np.float32)

    layers = []
    for i in range(1, len(FULL_LAYERS) + 1):
        layers.append({
            "weight": a(f"conv{i}.weight")[:, :, :, 0].transpose(2, 1, 0),
            "bias": a(f"conv{i}.bias"),
            "bn_weight": a(f"conv{i}_BN.weight"),
            "bn_bias": a(f"conv{i}_BN.bias"),
            "bn_mean": a(f"conv{i}_BN.running_mean"),
            "bn_var": a(f"conv{i}_BN.running_var"),
        })
    return {"layers": layers,
            "classifier": {"weight": a("classifier.weight").T,
                           "bias": a("classifier.bias")}}


_CACHED: dict = {}


def load_crepe(ckpt_path: str | None = None):
    """Load (and cache) CREPE-full params from a torch checkpoint on disk
    (torchcrepe ships ``crepe.pth``; path via ``WT_CREPE_CKPT``).  Returns
    None when no checkpoint is available (zero-egress image)."""
    ckpt_path = ckpt_path or os.environ.get("WT_CREPE_CKPT")
    if not ckpt_path or not os.path.exists(ckpt_path):
        return None
    if ckpt_path not in _CACHED:
        import torch
        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        _CACHED[ckpt_path] = crepe_params_from_torch(sd)
    return _CACHED[ckpt_path]
