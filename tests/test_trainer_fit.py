"""Product-path data-parallel training: Trainer.fit over the 8-device mesh.

Round-1 gap (VERDICT.md Missing #2): the trainer never built a mesh, so the
reference's 8-way DDP configs (configs/...frame75...yaml:86-92 `strategy:
ddp, devices: [0..7]`, global batch 40 = 5/chip; encoder/distrib.py) could
not actually train data-parallel through `train.py fit`.  These tests pin
the wiring: Trainer builds the mesh, shards state + batches, and the CLI
entry reaches it.
"""

import os

import numpy as np
import pytest
from scipy.io import wavfile

import jax
from jax.sharding import NamedSharding

from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, VQConfig,
                              VocosBackboneConfig, WavTokenizerSpec)
from wavtokenizer_tpu.train import TrainConfig
from wavtokenizer_tpu.train.data import DataConfig
from wavtokenizer_tpu.train.trainer import Trainer


# Width-scaled discriminators for fit-loop tests: disc PARITY is covered by
# tests/test_train.py at full width; the fit loop only needs the structure,
# and 1/8-width cuts the 8-device GAN-step XLA:CPU compile from ~19 min to
# ~4 min on this 1-core box.
TCFG_FIT = dict(max_steps=100, disc_channels_scale=0.125)


def _tiny_spec():
    return WavTokenizerSpec(
        seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)),
        vq=VQConfig(dimension=16, bins=32, kmeans_iters=2),
        backbone=VocosBackboneConfig(input_channels=16, dim=32,
                                     intermediate_dim=64, num_layers=1,
                                     adanorm_num_embeddings=4),
        head=ISTFTHeadConfig(dim=32, n_fft=1280, hop_length=320),
    )


def _write_wavs(d, n=10, sr=24000, samples=4800):
    files = []
    rng = np.random.default_rng(0)
    for i in range(n):
        t = np.arange(samples) / sr
        y = 0.3 * np.sin(2 * np.pi * (200 + 37 * i) * t) \
            + 0.02 * rng.normal(size=samples)
        p = str(d / f"clip{i}.wav")
        wavfile.write(p, sr, (y * 32767).astype(np.int16))
        files.append(p)
    filelist = str(d / "files.txt")
    with open(filelist, "w") as f:
        f.write("\n".join(files) + "\n")
    return filelist


def test_fit_data_parallel_on_mesh(tmp_path):
    assert len(jax.devices()) == 8, "conftest should force 8 virtual devices"
    filelist = _write_wavs(tmp_path)
    spec = _tiny_spec()
    tcfg = TrainConfig(**TCFG_FIT)
    data = DataConfig(filelist_path=filelist, num_samples=3840, batch_size=8,
                      num_workers=0)
    tr = Trainer(spec, tcfg, data, out_dir=str(tmp_path / "run"),
                 log_every=1, val_every=10**9)
    assert tr.mesh is not None
    assert tr.mesh.shape == {"data": 8, "model": 1}

    state = tr.fit(max_batches=2)
    assert int(jax.device_get(state["step"])) == 2
    # State must live on the mesh (sharded/replicated NamedSharding), not a
    # single device.
    leaf = jax.tree.leaves(state["gen"])[0]
    assert isinstance(leaf.sharding, NamedSharding)
    assert set(leaf.sharding.mesh.axis_names) == {"data", "model"}
    # Per-step metrics were logged and finite.
    with open(tmp_path / "run" / "metrics.jsonl") as f:
        lines = f.read().splitlines()
    assert any('"mesh"' in l for l in lines)
    import json
    recs = [json.loads(l) for l in lines if '"gen_total"' in l]
    assert recs and all(np.isfinite(r["gen_total"]) for r in recs)


def test_validate_metrics_and_resynthesis(tmp_path):
    """Trainer.validate computes the reference's objective metric set on
    16 kHz audio (experiment.py:227-258) and logs the val-end EnCodec
    resynthesis snapshot (experiment.py:464-474).  Without the optional
    UTMOS ckpt its score is 0 (the (5-0) constant stays in val_loss);
    PESQ comes from the native P.862 fallback (metrics/pesq_native.py),
    so it must be a real MOS-LQO in range, and the rest finite."""
    import json

    from wavtokenizer_tpu.train.data import WavDataset, data_loader
    from wavtokenizer_tpu.train.step import create_train_state

    filelist = _write_wavs(tmp_path, n=4, samples=24000)
    spec = _tiny_spec()
    tcfg = TrainConfig(max_steps=10, disc_channels_scale=0.125)
    data = DataConfig(filelist_path=filelist, num_samples=19200, batch_size=2,
                      num_workers=0)
    tr = Trainer(spec, tcfg, data, val_data=data,
                 out_dir=str(tmp_path / "run"), limit_val_batches=1)
    state = create_train_state(spec, tcfg, seed=0)
    val_ds = WavDataset(data, train=False, seed=0)
    val_iter = data_loader(val_ds, 2, shuffle=False, seed=0)

    val_loss = tr.validate(state, val_iter, step=0)
    assert np.isfinite(val_loss)

    with open(tmp_path / "run" / "metrics.jsonl") as f:
        recs = [json.loads(l) for l in f.read().splitlines()]
    vrec = [r for r in recs if "val_loss" in r][-1]
    for k in ("val_mel_loss", "val_utmos_score", "val_pesq_score",
              "val_periodicity_loss", "val_pitch_loss", "val_f1_score",
              "val_stoi"):
        assert k in vrec, vrec
    # UTMOS ckpt absent -> its (5-0) constant remains; PESQ is the
    # native fallback's real MOS-LQO (untrained model -> low score)
    assert vrec["val_utmos_score"] == 0.0
    assert 1.0 <= vrec["val_pesq_score"] <= 4.644
    assert np.isfinite(vrec["val_periodicity_loss"])
    assert 0.0 <= vrec["val_f1_score"] <= 1.0


def test_train_cli_builds_mesh(tmp_path, monkeypatch):
    """`python train.py fit --config ... --max-batches N` reaches a
    mesh-wired Trainer (fit itself mocked: the full-size model's GAN-step
    compile is minutes on this host and is covered above at tiny scale)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import train as train_cli

    filelist = _write_wavs(tmp_path, n=4)
    cfg = f"""
seed_everything: 3407
data:
  class_path: decoder.dataset.VocosDataModule
  init_args:
    train_params:
      filelist_path: {filelist}
      sampling_rate: 24000
      num_samples: 72000
      batch_size: 40
      num_workers: 0
model:
  class_path: decoder.experiment.WavTokenizer
  init_args:
    sample_rate: 24000
    initial_learning_rate: 2e-4
    feature_extractor:
      class_path: decoder.feature_extractors.EncodecFeatures
      init_args:
        bandwidths: [6.6, 6.6, 6.6, 6.6]
        vq_bins: 4096
        vq_kmeans: 200
        dowmsamples: [8, 5, 4, 2]
    backbone:
      class_path: decoder.models.VocosBackbone
      init_args: {{input_channels: 512, dim: 768, intermediate_dim: 2304,
                  num_layers: 12, adanorm_num_embeddings: 4}}
    head:
      class_path: decoder.heads.ISTFTHead
      init_args: {{dim: 768, n_fft: 1280, hop_length: 320}}
trainer:
  max_steps: 2000000
"""
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(cfg)

    seen = {}

    def fake_fit(self, max_batches=None, state=None, resume_path=None):
        seen["trainer"] = self
        seen["max_batches"] = max_batches
        seen["resume_path"] = resume_path
        return {}

    monkeypatch.setattr(Trainer, "fit", fake_fit)
    rc = train_cli.main(["fit", "--config", str(cfg_path),
                         "--out-dir", str(tmp_path / "out"),
                         "--max-batches", "2"])
    assert rc == 0
    tr = seen["trainer"]
    assert seen["max_batches"] == 2
    assert tr.mesh is not None and tr.mesh.shape["data"] == 8
    assert tr.train_data.batch_size == 40  # global batch = config batch
    assert tr.spec.backbone.dim == 768


def test_train_step_media_logged(tmp_path):
    """Training-step TB media parity (VERDICT r2 Next #8; ref:
    decoder/experiment.py:195-216 logs reconstructed/original audio + mel
    images every 1000 TRAINING steps — here log_media_every=2 so a 3-step
    smoke fit crosses one media step)."""
    import glob

    filelist = _write_wavs(tmp_path)
    spec = _tiny_spec()
    tcfg = TrainConfig(**TCFG_FIT)
    data = DataConfig(filelist_path=filelist, num_samples=3840, batch_size=8,
                      num_workers=0)
    tr = Trainer(spec, tcfg, data, out_dir=str(tmp_path / "run"),
                 log_every=10**9, val_every=10**9, log_media_every=2)
    tr.fit(max_batches=3)

    events = glob.glob(str(tmp_path / "run" / "tb" / "events*"))
    assert events, "no TB event files written"
    blob = b"".join(open(f, "rb").read() for f in events)
    assert b"train/reconstructed" in blob
    assert b"train/original" in blob


def test_underfull_final_batch_repeat_padded(tmp_path):
    """No silent sample loss (VERDICT r2 Next #9): a filelist of
    batch_size+1 files yields a 1-sample final batch that must be
    repeat-padded to the full static shape, not trimmed/dropped."""
    filelist = _write_wavs(tmp_path, n=9)   # batch 8 -> final batch of 1
    spec = _tiny_spec()
    tcfg = TrainConfig(**TCFG_FIT)
    data = DataConfig(filelist_path=filelist, num_samples=3840, batch_size=8,
                      num_workers=0)
    tr = Trainer(spec, tcfg, data, out_dir=str(tmp_path / "run"),
                 log_every=10**9, val_every=10**9)

    # epoch has ceil(9/8)=2 batches; 2 steps = one full epoch, so the
    # second step consumes the padded 1-sample remainder
    state = tr.fit(max_batches=2)
    assert int(jax.device_get(state["step"])) == 2
    with open(tmp_path / "run" / "metrics.jsonl") as f:
        assert not any('"batch_trimmed"' in l for l in f)

    # the pad helper itself: 1 -> 8 by repetition
    padded = tr._pad_batch(np.ones((1, 3840), np.float32))
    assert padded.shape == (8, 3840)
    np.testing.assert_array_equal(padded[0], padded[7])
