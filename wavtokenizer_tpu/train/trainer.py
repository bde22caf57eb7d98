"""Training orchestration: the `train.py fit --config` equivalent.

Behavioral contract: reference train.py + Lightning wiring in
decoder/experiment.py — per-batch disc->gen updates, random bandwidth_id,
validation val_loss = mel + (5 - utmos) + (5 - pesq) + 1000*commit
(experiment.py:227-270), top-k checkpointing on val_loss + save_last
(configs/*.yaml ModelCheckpoint), JSONL metric logging (stands in for
TensorBoard scalars), grad-norm logging (decoder/helpers.py:49-55 parity is
the `gen_total` metrics stream).

TPU-native: one jit-compiled train_step, data-parallel over a mesh when
multiple devices are present, host-side data pipeline feeding device
batches.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

import numpy as np

import jax
import jax.numpy as jnp

from ..models.wavtokenizer import WavTokenizerSpec
from ..api.config import spec_from_config_dict
from .data import DataConfig, WavDataset, data_loader
from .losses import mel_loss
from .step import (TrainConfig, create_train_state, generator_forward,
                   mel_coeff_decay, state_to_inference_params, train_step)


def train_config_from_yaml(config: dict) -> tuple[WavTokenizerSpec, TrainConfig,
                                                  DataConfig | None, DataConfig | None]:
    """Parse a reference-style Lightning YAML into (spec, tcfg, train/val data)."""
    spec = spec_from_config_dict(config)
    init = config.get("model", {}).get("init_args", {})
    trainer = config.get("trainer", {})
    tcfg = TrainConfig(
        sample_rate=int(init.get("sample_rate", 24000)),
        initial_learning_rate=float(init.get("initial_learning_rate", 2e-4)),
        num_warmup_steps=int(init.get("num_warmup_steps", 0)),
        mel_loss_coeff=float(init.get("mel_loss_coeff", 45)),
        mrd_loss_coeff=float(init.get("mrd_loss_coeff", 1.0)),
        pretrain_mel_steps=int(init.get("pretrain_mel_steps", 0)),
        decay_mel_coeff=bool(init.get("decay_mel_coeff", False)),
        max_steps=int(trainer.get("max_steps", 2_000_000)),
        num_bandwidths=len(init.get("feature_extractor", {})
                           .get("init_args", {}).get("bandwidths", [1, 1, 1, 1])),
    )

    def data_cfg(block):
        if not block:
            return None
        return DataConfig(
            filelist_path=block["filelist_path"],
            sampling_rate=int(block.get("sampling_rate", 24000)),
            num_samples=int(block.get("num_samples", 72000)),
            batch_size=int(block.get("batch_size", 40)),
            num_workers=int(block.get("num_workers", 0)),
        )

    data = config.get("data", {}).get("init_args", {})
    return (spec, tcfg, data_cfg(data.get("train_params")),
            data_cfg(data.get("val_params")))


def save_checkpoint(path: str, state: dict) -> None:
    """Orbax checkpoint of the full train state."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, template: dict) -> dict:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=jax.device_get(template))


class Trainer:
    """Minimal but complete training driver."""

    def __init__(self, spec: WavTokenizerSpec, tcfg: TrainConfig,
                 train_data: DataConfig, val_data: DataConfig | None = None,
                 out_dir: str = "runs/default", seed: int = 3407,
                 log_every: int = 100, val_every: int = 10_000,
                 save_top_k: int = 10, limit_val_batches: int = 100):
        self.spec, self.tcfg = spec, tcfg
        self.train_data, self.val_data = train_data, val_data
        self.out_dir = out_dir
        self.seed = seed
        self.log_every = log_every
        self.val_every = val_every
        self.save_top_k = save_top_k
        self.limit_val_batches = limit_val_batches
        os.makedirs(out_dir, exist_ok=True)
        self._metrics_f = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self._topk: list[tuple[float, str]] = []
        from .helpers import TBLogger
        self.tb = TBLogger(os.path.join(out_dir, "tb"))

    def log(self, record: dict) -> None:
        self._metrics_f.write(json.dumps(record) + "\n")
        self._metrics_f.flush()

    # ------------------------------------------------------------------ val

    def validate(self, state: dict, val_iter, step: int) -> float:
        """val_loss = mel + (5 - utmos) + (5 - pesq) + 1000*commit
        (ref: experiment.py:257-258; utmos/pesq contribute 0 scores when
        their evaluators are unavailable, i.e. the constants remain)."""
        losses = []
        key = jax.random.PRNGKey(self.seed + step)
        spec = self.spec

        # One jitted program for the whole eval forward: the eager version
        # dispatched thousands of ops per batch (encoder + VQ + backbone +
        # head one op at a time), stalling training for minutes per
        # validation pass on slow hosts.
        if not hasattr(self, "_val_step"):
            @jax.jit
            def _val_step(gen, vq, audio, key):
                audio_hat, commit, _ = generator_forward(
                    gen, vq, spec, audio, jnp.zeros((), jnp.int32), key,
                    n_q=1)
                return mel_loss(audio_hat, audio, spec.sample_rate), commit, \
                    audio_hat
            self._val_step = _val_step

        for i in range(self.limit_val_batches):
            try:
                batch = next(val_iter)
            except StopIteration:
                break
            audio = jnp.asarray(batch)
            m, commit, audio_hat = self._val_step(state["gen"], state["vq"],
                                                  audio, key)
            losses.append(float(m) + 5.0 + 5.0 + 1000.0 * float(commit))
            if i == 0:
                # Audio + mel-spectrogram snapshots (ref: experiment.py:272-294)
                sr = self.spec.sample_rate
                self.tb.audio_and_spectrogram(
                    "val/reconstructed", np.asarray(audio_hat[0]), sr, step)
                self.tb.audio_and_spectrogram(
                    "val/original", np.asarray(audio[0]), sr, step)
        val_loss = float(np.mean(losses)) if losses else float("inf")
        self.log({"step": step, "val_loss": val_loss})
        self.tb.scalars({"val_loss": val_loss}, step)
        self.tb.flush()
        return val_loss

    def _save_topk(self, state: dict, step: int, val_loss: float) -> None:
        name = f"wavtokenizer_checkpoint_step={step}_val_loss={val_loss:.4f}"
        path = os.path.join(self.out_dir, name)
        save_checkpoint(path, state)
        self._topk.append((val_loss, path))
        self._topk.sort()
        while len(self._topk) > self.save_top_k:
            _, worst = self._topk.pop()
            import shutil
            shutil.rmtree(worst, ignore_errors=True)

    # ---------------------------------------------------------------- train

    def _make_train_iter(self):
        """Native C++ threaded loader when the toolchain allows and every
        file is a .wav (native/wt_data_loader.cc); pure-Python pipeline
        otherwise.  Both implement the same decode/norm/resample/crop
        contract (ref: decoder/dataset.py:44-84)."""
        cfg = self.train_data
        with open(cfg.filelist_path) as f:
            files = [l for l in f.read().splitlines() if l.strip()]
        if all(p.endswith(".wav") for p in files):
            try:
                from ..native import NativeDataLoader
                loader = NativeDataLoader(
                    files, sample_rate=cfg.sampling_rate,
                    num_samples=cfg.num_samples, batch_size=cfg.batch_size,
                    train=True, num_threads=max(2, cfg.num_workers),
                    seed=self.seed)
                self.log({"event": "native_loader", "files": len(files)})
                return iter(loader)
            except Exception as e:  # no g++ / build failure -> python path
                self.log({"event": "native_loader_unavailable", "error": str(e)})
        ds = WavDataset(cfg, train=True, seed=self.seed)
        return data_loader(ds, cfg.batch_size, shuffle=True, seed=self.seed)

    def fit(self, max_batches: int | None = None, state: dict | None = None):
        spec, tcfg = self.spec, self.tcfg
        if state is None:
            state = create_train_state(spec, tcfg, seed=self.seed)
        train_iter = self._make_train_iter()
        val_iter = None
        if self.val_data is not None:
            val_ds = WavDataset(self.val_data, train=False, seed=self.seed)
            val_iter = data_loader(val_ds, self.val_data.batch_size,
                                   shuffle=False, seed=self.seed)

        total = max_batches if max_batches is not None else tcfg.max_steps // 2
        key = jax.random.PRNGKey(self.seed)
        nq_rng = np.random.default_rng(self.seed + 1)
        t_last = time.time()
        for step in range(int(state["step"]), total):
            batch = next(train_iter)
            key, sub = jax.random.split(key)
            train_disc = step >= tcfg.pretrain_mel_steps
            mel_coeff = mel_coeff_decay(tcfg, step + 1)
            # Multi-quantizer configs randomize n_q over [4, 6, 8] per step
            # (ref: vq.py:103-108); a no-op for the shipped n_q=1 models.
            n_q = (min(int(nq_rng.choice([4, 6, 8])), spec.vq.n_q)
                   if spec.vq.n_q > 1 else 1)
            state, metrics = train_step(state, jnp.asarray(batch), sub, spec,
                                        tcfg, mel_coeff=mel_coeff,
                                        train_discriminator=train_disc,
                                        n_q=n_q,
                                        with_grad_norm=(step % self.log_every
                                                        == 0))
            if step % self.log_every == 0:
                rec = {"step": step,
                       **{k: float(v) for k, v in metrics.items()},
                       "sec_per_step": (time.time() - t_last) / max(1, self.log_every)}
                t_last = time.time()
                self.log(rec)
                self.tb.scalars({k: v for k, v in rec.items() if k != "step"},
                                step)
            if val_iter is not None and step > 0 and step % self.val_every == 0:
                val_loss = self.validate(state, val_iter, step)
                self._save_topk(state, step, val_loss)
        save_checkpoint(os.path.join(self.out_dir, "last"), state)
        return state

    def export_inference_params(self, state: dict) -> dict:
        return state_to_inference_params(state, self.spec)
