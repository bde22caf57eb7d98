"""Training resume (VERDICT r2 Next #4).

Two reference mechanisms (SURVEY.md §5 checkpoint/resume):
1. Lightning crash-resume (`trainer.fit(ckpt_path=...)`) — ours is
   `train.py fit --resume <orbax-dir>` / `Trainer.fit(resume_path=...)`:
   an interrupted-then-resumed run must land on EXACTLY the state of an
   uninterrupted run (same optimizer moments, same RNG stream, same data
   stream positioning).
2. Surgical per-submodule resume from a torch Lightning checkpoint
   (ref: decoder/experiment.py:398-445 + the `resume/resume_config/
   resume_model` YAML keys, configs/...yaml:35-37), with the
   quantizer-layers<8 quirk and fresh optimizers.
"""

import numpy as np
import pytest

import jax

from test_trainer_fit import TCFG_FIT, _tiny_spec, _write_wavs

from wavtokenizer_tpu.train import TrainConfig
from wavtokenizer_tpu.train.data import DataConfig
from wavtokenizer_tpu.train.trainer import (Trainer, resume_from_yaml,
                                            surgical_train_state)


def _trainer(tmp_path, filelist, name):
    spec = _tiny_spec()
    tcfg = TrainConfig(**TCFG_FIT)
    data = DataConfig(filelist_path=filelist, num_samples=3840, batch_size=8,
                      num_workers=0)
    return Trainer(spec, tcfg, data, out_dir=str(tmp_path / name),
                   log_every=1, val_every=10**9, seed=11)


def test_crash_resume_matches_uninterrupted(tmp_path):
    """Kill a 3-step fit, resume to 5, compare against a straight 5-step
    run: every leaf of the train state (params, BOTH optimizer states, VQ
    EMA buffers, step counter) must match."""
    filelist = _write_wavs(tmp_path)

    # interrupted run: 3 steps, saves <out>/last at the end
    tr_a = _trainer(tmp_path, filelist, "run_a")
    state_a = tr_a.fit(max_batches=3)
    assert int(jax.device_get(state_a["step"])) == 3

    # resumed run: fresh Trainer instance, restore, continue to 5
    tr_b = _trainer(tmp_path, filelist, "run_b")
    state_b = tr_b.fit(max_batches=5,
                       resume_path=str(tmp_path / "run_a" / "last"))
    assert int(jax.device_get(state_b["step"])) == 5

    # uninterrupted run: straight to 5
    tr_c = _trainer(tmp_path, filelist, "run_c")
    state_c = tr_c.fit(max_batches=5)
    assert int(jax.device_get(state_c["step"])) == 5

    flat_b = jax.tree.leaves(jax.device_get(state_b))
    flat_c = jax.tree.leaves(jax.device_get(state_c))
    assert len(flat_b) == len(flat_c)
    for b, c in zip(flat_b, flat_c):
        np.testing.assert_allclose(np.asarray(b), np.asarray(c),
                                   rtol=2e-5, atol=2e-6)


def test_surgical_resume_from_torch_checkpoint(tmp_path):
    """YAML-keyed surgical resume: export a train state to the torch
    Lightning layout, reload it via surgical_train_state, and check the
    generator weights round-trip while the optimizers restart fresh."""
    torch = pytest.importorskip("torch")
    from wavtokenizer_tpu.checkpoint.export import export_training_state_dict
    from wavtokenizer_tpu.train.step import create_train_state
    from wavtokenizer_tpu.train.wnorm import fold_tree

    spec = _tiny_spec()
    tcfg = TrainConfig(**TCFG_FIT)
    src = create_train_state(spec, tcfg, seed=5)
    sd = export_training_state_dict(src, spec)
    sd = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}

    state = surgical_train_state(spec, tcfg, {k: v.numpy()
                                              for k, v in sd.items()}, seed=9)

    # generator forward-weights match the source (weight-norm folded view)
    for key in ("backbone", "head"):
        for a, b in zip(jax.tree.leaves(jax.device_get(src["gen"][key])),
                        jax.tree.leaves(jax.device_get(state["gen"][key]))):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    enc_src = fold_tree(jax.device_get(src["gen"]["encoder"]))
    enc_new = fold_tree(jax.device_get(state["gen"]["encoder"]))
    for a, b in zip(jax.tree.leaves(enc_src), jax.tree.leaves(enc_new)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # quantizer codebook grafted
    np.testing.assert_allclose(np.asarray(src["vq"]["embed"]),
                               np.asarray(state["vq"]["embed"]), rtol=1e-6)
    # discriminators grafted
    v_src = np.asarray(jax.device_get(src["disc"]["mpd"][0]["convs"][0]["v"]))
    v_new = np.asarray(jax.device_get(state["disc"]["mpd"][0]["convs"][0]["v"]))
    np.testing.assert_allclose(v_src, v_new, rtol=1e-6)
    # optimizers restart at zero (the reference reloads module weights only)
    mu_leaves = jax.tree.leaves(jax.device_get(state["opt_gen"]))
    assert any(np.all(np.asarray(l) == 0) for l in mu_leaves
               if hasattr(l, "shape") and getattr(l, "size", 0) > 1)
    assert int(jax.device_get(state["step"])) == 0


def test_resume_keys_parsed_from_yaml():
    cfg = {"model": {"init_args": {"resume": True,
                                   "resume_config": "a.yaml",
                                   "resume_model": "b.ckpt"}}}
    assert resume_from_yaml(cfg) == ("a.yaml", "b.ckpt")
    assert resume_from_yaml({"model": {"init_args": {"resume": False,
                                                     "resume_model": "x"}}}) \
        == (None, None)
    assert resume_from_yaml({}) == (None, None)
