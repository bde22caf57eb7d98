"""Training observability helpers: spectrogram plots + TensorBoard logging.

Behavioral contract: reference decoder/helpers.py (plot_spectrogram_to_numpy
for TB image logging) and the experiment's TensorBoard streams — scalars per
loss term, audio + mel-spectrogram images every 1000 steps
(decoder/experiment.py:195-216, 272-294).  The grad-norm stream
(GradNormCallback, helpers.py:49-55) comes from train_step's ``grad_norm``
metric.

TensorBoard is optional: when the package is unavailable the logger
degrades to a no-op and the JSONL metrics stream remains the source of
truth.
"""

from __future__ import annotations

import numpy as np


def plot_spectrogram_to_numpy(spectrogram: np.ndarray) -> np.ndarray:
    """(n_mels, T) log-mel -> (3, H, W) RGB image array (CHW for TB)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 3))
    im = ax.imshow(np.asarray(spectrogram), aspect="auto", origin="lower",
                   interpolation="none")
    plt.colorbar(im, ax=ax)
    plt.xlabel("Frames")
    plt.ylabel("Channels")
    plt.tight_layout()
    fig.canvas.draw()
    data = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
    plt.close(fig)
    return data.transpose(2, 0, 1)


def log_mel(audio: np.ndarray, sample_rate: int) -> np.ndarray:
    """(T,) waveform -> (n_mels, frames) log-mel for plotting."""
    import jax.numpy as jnp

    from ..ops.spectral import mel_spectrogram, safe_log

    mel = mel_spectrogram(jnp.asarray(audio)[None], sample_rate, 1024, 256, 100)
    return np.asarray(safe_log(mel))[0]


class TBLogger:
    """Thin TensorBoard writer; silently no-ops without tensorboard."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._w = SummaryWriter(logdir)
        except Exception:
            self._w = None

    def scalars(self, metrics: dict, step: int) -> None:
        if self._w is None:
            return
        for k, v in metrics.items():
            if isinstance(v, (int, float, np.floating, np.integer)):
                self._w.add_scalar(k, float(v), step)

    def audio(self, tag: str, audio: np.ndarray, sample_rate: int,
              step: int) -> None:
        """Audio-only snapshot (ref: experiment.py:469-473 `add_audio`)."""
        if self._w is None:
            return
        audio = np.asarray(audio, np.float32).reshape(-1)
        self._w.add_audio(tag, audio, step, sample_rate=sample_rate)

    def audio_and_spectrogram(self, tag: str, audio: np.ndarray,
                              sample_rate: int, step: int) -> None:
        """Audio clip + its mel spectrogram image
        (ref: experiment.py:195-216)."""
        if self._w is None:
            return
        audio = np.asarray(audio, np.float32).reshape(-1)
        self._w.add_audio(f"{tag}/audio", audio, step, sample_rate=sample_rate)
        self._w.add_image(f"{tag}/spectrogram",
                          plot_spectrogram_to_numpy(log_mel(audio, sample_rate)),
                          step)

    def flush(self) -> None:
        if self._w is not None:
            self._w.flush()
