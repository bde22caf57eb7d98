"""Enhancement trainers: the fork's try3 / tsne / train_with_tsne / try loops.

Four training regimes over the adapter stack (research.adapter):

* ``waveform`` (try3.py): adapter + SEANet decoder trainable, voice-focused
  waveform loss against the clean target, features*1.5 -> tanh before
  decode (try3.py:1038-1053), Adam + grad clipping.
* ``feature`` (tsne.py): only the adapter trains; L2 feature loss between
  enhanced(noisy) and encoder(clean) features (tsne.py:152-169).
* ``hybrid`` (train_with_tsne.py): 0.7 voice-focused + 0.3 cosine feature
  loss, adapter-only.
* ``byol`` (try.py): the BYOL SimpleTransformer inserted between the frozen
  encoder and the adapter, amplitude hacks, voice-focused loss.

Plus the paired noisy/clean dataset (speaker_pairs.txt "noisy|clean" format
from tools/prepare_data_lists.py, or directory pairs with filename
matching).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.seanet import seanet_encode
from ..models.wavtokenizer import WavTokenizerSpec
from ..train.data import read_audio, resample_np, sox_norm
from .adapter import (AdapterConfig, InPathTransformerConfig,
                      apply_adapter, enhanced_forward, init_adapter)
from .losses import (cosine_similarity_loss, feature_loss, hybrid_tsne_loss,
                     voice_focused_loss)


class PairedAudioDataset:
    """Paired (noisy, clean) crops.

    Accepts either a pairs file with `noisy|clean` lines
    (tools/prepare_data_lists.py format) or two parallel filelists.
    """

    def __init__(self, pairs_file: str, sample_rate: int = 24000,
                 num_samples: int = 72000, seed: int = 0):
        self.pairs = []
        with open(pairs_file) as f:
            for line in f:
                line = line.strip()
                if line and "|" in line:
                    noisy, clean = line.split("|", 1)
                    self.pairs.append((noisy, clean))
        self.sample_rate = sample_rate
        self.num_samples = num_samples
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.pairs)

    def _load(self, path):
        y, sr = read_audio(path)
        if y.ndim > 1:
            y = y.mean(axis=-1)
        if sr != self.sample_rate:
            y = resample_np(y, sr, self.sample_rate)
        return y

    def __getitem__(self, i):
        noisy, clean = (self._load(p) for p in self.pairs[i])
        n = min(len(noisy), len(clean))
        noisy, clean = noisy[:n], clean[:n]
        if n < self.num_samples:
            reps = 1 + (self.num_samples - n) // n
            noisy = np.tile(noisy, reps + 1)[:self.num_samples]
            clean = np.tile(clean, reps + 1)[:self.num_samples]
        else:
            start = self.rng.integers(0, n - self.num_samples + 1)
            noisy = noisy[start:start + self.num_samples]
            clean = clean[start:start + self.num_samples]
        return noisy.astype(np.float32), clean.astype(np.float32)

    def batches(self, batch_size: int, shuffle: bool = True, seed: int = 0):
        # clamp rather than busy-loop: with fewer pairs than batch_size the
        # range() below would be empty and `while True` would spin forever
        batch_size = min(batch_size, len(self))
        if batch_size == 0:
            raise ValueError("empty paired dataset")
        rng = np.random.default_rng(seed)
        while True:
            order = rng.permutation(len(self)) if shuffle else np.arange(len(self))
            for i in range(0, len(self) - batch_size + 1, batch_size):
                items = [self[int(j)] for j in order[i:i + batch_size]]
                yield (np.stack([a for a, _ in items]),
                       np.stack([b for _, b in items]))


@dataclass(frozen=True)
class EnhanceConfig:
    """mode:
    * ``waveform`` — try3.py: adapter + decoder, voice-focused loss
    * ``feature`` — tsne.py: adapter only, L2 feature loss
    * ``hybrid`` — train_with_tsne.py: adapter only, 0.7 voice + 0.3 cosine
    * ``byol`` — try.py:36-134: the BYOL SimpleTransformer inserted between
      the frozen encoder and the adapter (transformer + adapter + decoder
      all trainable, try.py:83 freeze_byol_transformer=False default),
      voice-focused loss (try.py:1111), amplitude hacks instead of the
      tanh feature squash.
    """
    mode: str = "waveform"           # waveform | feature | hybrid | byol
    learning_rate: float = 1e-4
    grad_clip: float = 1.0
    feature_scale: float | None = 1.5  # try3's features*1.5 -> tanh
    normalize_inputs: bool = True      # try3 peak-normalizes the noisy input
    transformer_cfg: InPathTransformerConfig = InPathTransformerConfig()


def _normalize(x):
    """Per-utterance peak normalization of (B, T) — the reference loads the
    noisy input with ``wav / (wav.abs().max() + 1e-8)`` (try3.py:183) and
    the clean target UN-normalized (try3.py:292-293)."""
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return x / (peak + 1e-8)


@partial(jax.jit, static_argnames=("spec", "ecfg"))
def enhance_step(opt_state, adapter_params, adapter_state, decoder_params,
                 base_params, noisy, clean, spec: WavTokenizerSpec,
                 ecfg: EnhanceConfig, transformer_params=None):
    """One enhancement training step.  Returns (opt_state, adapter_params,
    adapter_state, decoder_params, transformer_params, loss);
    transformer_params is passed through as None outside ``byol`` mode."""
    if ecfg.normalize_inputs:
        noisy = _normalize(noisy)   # target stays raw (try3.py:292-293)

    train_decoder = ecfg.mode in ("waveform", "byol")
    use_tr = ecfg.mode == "byol" and transformer_params is not None

    def loss_fn(trainable):
        ap = trainable["adapter"]
        dp = trainable["decoder"] if train_decoder else decoder_params
        bp = {"encoder": base_params["encoder"], "decoder": dp}
        out, enhanced, _, new_state = enhanced_forward(
            bp, spec.seanet, ap, adapter_state, noisy, train=True,
            feature_scale=ecfg.feature_scale if ecfg.mode == "waveform" else None,
            transformer_params=trainable.get("transformer"),
            transformer_cfg=ecfg.transformer_cfg)
        if ecfg.mode in ("waveform", "byol"):
            loss = voice_focused_loss(out, clean)
        else:
            target = jax.lax.stop_gradient(
                seanet_encode(base_params["encoder"], spec.seanet,
                              clean[:, :, None]))
            if ecfg.mode == "feature":
                loss = feature_loss(enhanced, target)
            else:  # hybrid
                loss = hybrid_tsne_loss(out, clean, enhanced, target)
        return loss, new_state

    trainable = {"adapter": adapter_params}
    if train_decoder:
        trainable["decoder"] = decoder_params
    if use_tr:
        trainable["transformer"] = transformer_params
    (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)

    tx = optax.chain(optax.clip_by_global_norm(ecfg.grad_clip),
                     optax.adam(ecfg.learning_rate))
    updates, opt_state = tx.update(grads, opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    new_decoder = trainable.get("decoder", decoder_params)
    new_tr = trainable.get("transformer", transformer_params)
    return (opt_state, trainable["adapter"], new_state, new_decoder, new_tr,
            loss)


def make_enhance_optimizer(adapter_params, decoder_params,
                           ecfg: EnhanceConfig, transformer_params=None):
    trainable = {"adapter": adapter_params}
    if ecfg.mode in ("waveform", "byol"):
        trainable["decoder"] = decoder_params
    if ecfg.mode == "byol" and transformer_params is not None:
        trainable["transformer"] = transformer_params
    tx = optax.chain(optax.clip_by_global_norm(ecfg.grad_clip),
                     optax.adam(ecfg.learning_rate))
    return tx.init(trainable)
