"""Host-side data pipeline: filelist dataset -> batched 24 kHz crops.

Behavioral contract: reference decoder/dataset.py:44-84 —
read -> mono mix -> sox "norm <gain>" peak normalization (random -1..-6 dB
train / -3 dB val) -> resample to target sr -> repeat-pad or random crop to
num_samples.

The image has no soundfile/torchaudio; WAV files are read with the stdlib
(scipy.io.wavfile), other formats via soundfile when available.  Resampling
reuses the same polyphase sinc kernel bank as the on-device resampler
(ops.resample) executed in numpy.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..ops.resample import _sinc_resample_kernel


@dataclass
class DataConfig:
    """Mirror of reference DataConfig (dataset.py:15-21)."""
    filelist_path: str
    sampling_rate: int = 24000
    num_samples: int = 72000
    batch_size: int = 40
    num_workers: int = 0


def read_audio(path: str) -> tuple[np.ndarray, int]:
    """Returns (samples float32 (T,) or (T, C), sample_rate)."""
    try:
        import soundfile
        y, sr = soundfile.read(path)
        return np.asarray(y, np.float32), int(sr)
    except ImportError:
        pass
    from scipy.io import wavfile
    sr, y = wavfile.read(path)
    y = np.asarray(y)
    if y.dtype == np.int16:
        y = y.astype(np.float32) / 32768.0
    elif y.dtype == np.int32:
        y = y.astype(np.float32) / 2147483648.0
    elif y.dtype == np.uint8:
        y = (y.astype(np.float32) - 128.0) / 128.0
    else:
        y = y.astype(np.float32)
    return y, int(sr)


def sox_norm(y: np.ndarray, gain_db: float) -> np.ndarray:
    """sox `norm <gain>`: scale so the peak sits at gain_db dBFS
    (ref: dataset.py:69-70)."""
    peak = np.abs(y).max()
    if peak == 0:
        return y
    target = 10.0 ** (gain_db / 20.0)
    return y * (target / peak)


def resample_np(y: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase sinc resample in numpy with the same kernel bank as
    ops.resample (torchaudio-compatible filter design)."""
    if orig_sr == new_sr:
        return y
    kern, width, orig, new = _sinc_resample_kernel(orig_sr, new_sr)
    # kern: (K, 1, new) -> (new, K)
    k = kern[:, 0, :].T
    length = y.shape[-1]
    ypad = np.pad(y, (width, width + orig))
    K = k.shape[1]
    n_frames = (ypad.shape[-1] - K) // orig + 1
    idx = (np.arange(n_frames) * orig)[:, None] + np.arange(K)[None, :]
    frames = ypad[idx]                       # (T, K)
    out = frames @ k.T                       # (T, new)
    out = out.reshape(-1)
    target_length = int(math.ceil(new * length / orig))
    return out[:target_length].astype(np.float32)


class WavDataset:
    """Indexable dataset mirroring VocosDataset semantics (dataset.py:44-84)."""

    def __init__(self, cfg: DataConfig, train: bool, seed: int = 0):
        with open(cfg.filelist_path) as f:
            self.filelist = [l for l in f.read().splitlines() if l.strip()]
        self.cfg = cfg
        self.train = train
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.filelist)

    def __getitem__(self, index: int) -> np.ndarray:
        return self.sample(index, self.rng)

    def sample(self, index: int, rng) -> np.ndarray:
        """Load one crop using an explicit RNG.  The loader passes a
        stateless per-(epoch, index) generator so an interrupted-and-resumed
        run replays the exact gain/crop stream of an uninterrupted one;
        plain indexing keeps the legacy stateful RNG."""
        cfg = self.cfg
        y, sr = read_audio(self.filelist[index])
        if y.ndim > 1:  # mix to mono
            y = y.mean(axis=-1)
        gain = rng.uniform(-6, -1) if self.train else -3.0
        y = sox_norm(y, gain)
        if sr != cfg.sampling_rate:
            y = resample_np(y, sr, cfg.sampling_rate)
        n = y.shape[-1]
        if n < cfg.num_samples:
            reps = 1 + (cfg.num_samples - n) // n
            y = np.concatenate([y] + [y] * reps)[:cfg.num_samples]
        elif self.train:
            start = rng.integers(0, n - cfg.num_samples + 1)
            y = y[start:start + cfg.num_samples]
        else:
            y = y[:cfg.num_samples]
        return y.astype(np.float32)


def data_loader(dataset: WavDataset, batch_size: int, shuffle: bool,
                seed: int = 0, drop_last: bool = True, skip_batches: int = 0):
    """Simple epoch iterator yielding (B, num_samples) float32 batches.

    ``skip_batches`` fast-forwards the shuffle/crop stream WITHOUT decoding
    audio — index bookkeeping only — so a resumed run's loader is positioned
    exactly where the interrupted run stopped.  Crops/gains are stateless
    per (seed, epoch, file-index) via :meth:`WavDataset.sample`."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    epoch = 0
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        for i in range(0, n - (batch_size - 1 if drop_last else 0), batch_size):
            idx = order[i:i + batch_size]
            if drop_last and len(idx) < batch_size:
                break
            if skip_batches > 0:
                skip_batches -= 1
                continue
            yield np.stack([
                dataset.sample(int(j),
                               np.random.default_rng((seed, epoch, int(j))))
                for j in idx])
        epoch += 1
