"""Tests for the BYOL pair datasets (Kaldi x-vectors, feature views) and
the speaker-cluster CLI.

Contract source: byol_dataset.py (XVectorDataset pairing, WavFeatureDataset
views), tr_encodec.py k-means clustering, recon.py similarity scoring."""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools_tpu"))

from wavtokenizer_tpu.research.byol_data import (XVectorPairs,
                                                 feature_pair_views,
                                                 make_pairs, read_kaldi_scp,
                                                 write_kaldi_ark_scp)


def _xvector_set(rng, dim=32):
    keys = [
        "boy1_box_LDV_001", "boy1_box_LDV_002",
        "boy1_box_clean_LDV_001",
        "boy1_papercup_LDV_001",
        "girl2_plastic_LDV_007", "girl2_plastic_clean_LDV_007",
        "short_key",  # <3 parts after split on '_'? (has 2) -> skipped
    ]
    return {k: rng.normal(size=dim).astype(np.float32) for k in keys}


def test_kaldi_ark_scp_roundtrip(tmp_path, rng):
    data = _xvector_set(rng)
    data["amatrix_utt_x_001"] = rng.normal(size=(5, 16)).astype(np.float32)
    ark = str(tmp_path / "xvector.ark")
    scp = str(tmp_path / "xvector.scp")
    write_kaldi_ark_scp(ark, scp, data)
    back = read_kaldi_scp(scp)
    assert set(back) == set(data)
    for k in data:
        np.testing.assert_array_equal(back[k], data[k])  # bit-exact f32


def test_make_pairs_reference_semantics(rng):
    keys = _xvector_set(rng).keys()
    # Faithful mode: material = parts[1] only (ref byol_dataset.py:40), so
    # 'boy1_box_clean_LDV_001' groups under material 'box' and the
    # mat+'_clean' lookup never matches — the clean-pair phase is inert
    # (latent reference quirk).  Only cross-material pairs survive; the
    # clean utterance sits inside 'box' and, sharing utt number 001, is a
    # legitimate cross-material candidate too.
    pairs = make_pairs(keys)
    assert ("boy1_box_LDV_001", "boy1_papercup_LDV_001") in pairs
    assert ("boy1_box_clean_LDV_001", "boy1_papercup_LDV_001") in pairs
    assert not any("clean" in b for _, b in pairs)  # no clean-phase pairs
    assert not any("boy1_box_LDV_002" in p for p in pairs)
    # no cross-speaker pairs
    assert not any(a.split("_")[0] != b.split("_")[0] for a, b in pairs)
    assert len(pairs) == 2

    # detect_clean=True: the documented fix — clean keys group as
    # '<mat>_clean' and phase-1 pairs them with their noisy counterparts.
    fixed = make_pairs(keys, detect_clean=True)
    assert ("boy1_box_LDV_001", "boy1_box_clean_LDV_001") in fixed
    assert ("girl2_plastic_LDV_007", "girl2_plastic_clean_LDV_007") in fixed
    assert ("boy1_box_LDV_001", "boy1_papercup_LDV_001") in fixed
    assert len(fixed) == 3


def test_xvector_pairs_and_byol_step(tmp_path, rng):
    import jax
    import optax

    from wavtokenizer_tpu.research.byol import (BYOLConfig, byol_loss,
                                                init_byol, target_update)

    ark = str(tmp_path / "xvector.ark")
    scp = str(tmp_path / "xvector.scp")
    write_kaldi_ark_scp(ark, scp, _xvector_set(rng))
    ds = XVectorPairs(scp)
    assert ds.feat_dim == 32 and len(ds) == 2  # faithful mode, see pairing test
    assert len(XVectorPairs(scp, detect_clean=True)) == 3
    x1, x2, label, utt = ds[0]
    assert x1.shape == (32,) and label == utt.split("_")[0]

    v1, v2, labels = ds.batch(rng, 4)
    assert v1.shape == (4, 32) and len(labels) == 4

    cfg = BYOLConfig(input_dim=32, hidden_dim=64, ff_dim=64, encoder_out=16,
                     projection_dim=8)
    params = init_byol(cfg, seed=0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params["online"])
    loss, grads = jax.value_and_grad(
        lambda on: byol_loss({"online": on, "target": params["target"]},
                             v1, v2, cfg))(params["online"])
    assert np.isfinite(float(loss))
    updates, _ = tx.update(grads, opt_state, params["online"])
    params = target_update({"online": optax.apply_updates(params["online"],
                                                          updates),
                            "target": params["target"]})
    assert np.isfinite(float(byol_loss(params, v1, v2, cfg)))


def test_feature_pair_views(rng):
    f = rng.normal(size=(3, 10, 8)).astype(np.float32)
    v1, v2 = feature_pair_views(f, rng, noise_scale=0.01)
    assert v1.shape == f.shape and not np.array_equal(v1, v2)
    assert np.abs(v1 - f).max() < 0.1


def test_speaker_cluster_cli(tmp_path, rng):
    from speaker_cluster import main
    # two well-separated "speakers" in feature space, (D, T) layout
    fdir = tmp_path / "feats"; fdir.mkdir()
    for i in range(3):
        np.save(fdir / f"spkA_{i}.npy",
                rng.normal(size=(16, 20)).astype(np.float32) + 5.0)
        np.save(fdir / f"spkB_{i}.npy",
                rng.normal(size=(16, 20)).astype(np.float32) - 5.0)
    out = tmp_path / "spk"
    rc = main(["cluster", "--features-dir", str(fdir), "--n-clusters", "2",
               "--out-dir", str(out)])
    assert rc == 0
    labels = json.load(open(out / "labels.json"))
    a = {labels[k] for k in labels if k.startswith("spkA")}
    b = {labels[k] for k in labels if k.startswith("spkB")}
    assert len(a) == 1 and len(b) == 1 and a != b

    rc = main(["score", "--features-dir", str(fdir),
               "--centroids", str(out / "centroids.npy"),
               "--out", str(out / "scores.json")])
    assert rc == 0
    scores = json.load(open(out / "scores.json"))
    assert len(scores) == 6
    # every spkA file lands in the same best cluster, != spkB's
    bests_a = {scores[k]["best_cluster"] for k in scores if "spkA" in k}
    bests_b = {scores[k]["best_cluster"] for k in scores if "spkB" in k}
    assert len(bests_a) == 1 and bests_a != bests_b


def test_byol_train_cli_xvector_mode(tmp_path, rng):
    from byol_train import main
    ark = str(tmp_path / "xvector.ark")
    scp = str(tmp_path / "xvector.scp")
    write_kaldi_ark_scp(ark, scp, _xvector_set(rng))
    out = str(tmp_path / "byol")
    rc = main(["--xvector-scp", scp, "--steps", "3", "--batch-size", "4",
               "--out-dir", out, "--tsne-out", os.path.join(out, "tsne.npy")])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "byol_model"))
    pts = np.load(os.path.join(out, "tsne.npy"))
    assert pts.shape == (7, 2)  # all 7 x-vectors projected
