#!/usr/bin/env python
"""BYOL speaker-representation pretraining CLI.

Behavioral contract: the fork's BYOL suite (tr_byol.py / train_byol.py) —
online/target SimpleTransformer + ProjectionMLP + predictor, EMA tau=0.996,
symmetric MSE on two views of the same utterance's features.  Views come
from saved feature files (extract_features.py output, .npy (D, T)) by
sampling two random time crops per utterance (byol_dataset.py's saved-
feature pair mode).  Optionally writes a 2-D t-SNE of the learned
embeddings (the fork's cluster plots, host-side sklearn).

Usage:
    python tools_tpu/byol_train.py --features-dir feats/ --steps 500 \
        --out-dir runs/byol [--tsne-out runs/byol/tsne.npy]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_feature_files(features_dir: str, layout: str = "dt") -> list[np.ndarray]:
    """layout "dt": files are (D, T) like extract_features.py output;
    "td": already time-major (T, D)."""
    feats = []
    for name in sorted(os.listdir(features_dir)):
        if name.endswith(".npy"):
            f = np.load(os.path.join(features_dir, name))
            if f.ndim == 2 and layout == "dt":
                f = f.T
            feats.append(np.asarray(f, np.float32))
    return feats


def two_views(rng, feats: list[np.ndarray], batch: int, crop: int):
    """Sample (B, crop, D) view pairs: two random crops per utterance."""
    d = feats[0].shape[-1]
    v1 = np.zeros((batch, crop, d), np.float32)
    v2 = np.zeros((batch, crop, d), np.float32)
    for b in range(batch):
        f = feats[rng.integers(0, len(feats))]
        for v in (v1, v2):
            if f.shape[0] <= crop:
                reps = 1 + crop // f.shape[0]
                fc = np.tile(f, (reps, 1))[:crop]
            else:
                s = rng.integers(0, f.shape[0] - crop + 1)
                fc = f[s:s + crop]
            v[b] = fc
    return v1, v2


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--features-dir", default=None,
                    help=".npy feature files (extract_features.py output)")
    ap.add_argument("--xvector-scp", default=None,
                    help="Kaldi xvector.scp — train on speaker/material "
                         "x-vector pairs instead of feature crops "
                         "(byol_dataset.py XVectorDataset mode)")
    ap.add_argument("--detect-clean", action="store_true",
                    help="fix the reference's inert clean-pairing phase "
                         "(see research/byol_data.py)")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--crop-frames", type=int, default=64)
    ap.add_argument("--learning-rate", type=float, default=3e-4)
    ap.add_argument("--tau", type=float, default=0.996)
    ap.add_argument("--out-dir", default="runs/byol")
    ap.add_argument("--tsne-out", default=None)
    ap.add_argument("--layout", choices=["dt", "td"], default="dt",
                    help="feature file layout: dt=(D,T) extract_features "
                         "output, td=(T,D)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import optax

    from wavtokenizer_tpu.research.byol import (BYOLConfig, byol_loss,
                                                init_byol, simple_transformer,
                                                target_update)
    from wavtokenizer_tpu.train.trainer import save_checkpoint
    from wavtokenizer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    xv = None
    if args.xvector_scp:
        from wavtokenizer_tpu.research.byol_data import XVectorPairs
        xv = XVectorPairs(args.xvector_scp, detect_clean=args.detect_clean)
        print(f"{len(xv)} x-vector pairs (dim {xv.feat_dim})")
        cfg = BYOLConfig(input_dim=xv.feat_dim)
    elif args.features_dir:
        feats = load_feature_files(args.features_dir, args.layout)
        if not feats:
            print("no .npy files found", file=sys.stderr)
            return 1
        cfg = BYOLConfig(input_dim=feats[0].shape[-1])
    else:
        ap.error("one of --features-dir / --xvector-scp is required")
    params = init_byol(cfg, seed=args.seed)
    tx = optax.adam(args.learning_rate)
    opt_state = tx.init(params["online"])

    @jax.jit
    def step(params, opt_state, v1, v2):
        loss, grads = jax.value_and_grad(
            lambda on: byol_loss({"online": on, "target": params["target"]},
                                 v1, v2, cfg))(params["online"])
        updates, opt_state = tx.update(grads, opt_state, params["online"])
        online = optax.apply_updates(params["online"], updates)
        params = target_update({"online": online, "target": params["target"]},
                               tau=args.tau)
        return params, opt_state, loss

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "metrics.jsonl"), "a") as logf:
        for s in range(args.steps):
            if xv is not None:
                v1, v2, _ = xv.batch(rng, args.batch_size)
            else:
                v1, v2 = two_views(rng, feats, args.batch_size,
                                   args.crop_frames)
            params, opt_state, loss = step(params, opt_state, v1, v2)
            if s % 20 == 0:
                rec = {"step": s, "byol_loss": float(loss)}
                print(rec)
                logf.write(json.dumps(rec) + "\n")
                logf.flush()
    save_checkpoint(os.path.join(args.out_dir, "byol_model"), params)
    print(f"saved {args.out_dir}/byol_model")

    if args.tsne_out:
        from wavtokenizer_tpu.research.analysis import tsne_project
        embed_fn = jax.jit(lambda x: simple_transformer(
            params["online"]["encoder"], x, cfg))
        embs = []
        if xv is not None:
            for utt in sorted(xv.vectors):
                embs.append(np.asarray(
                    embed_fn(np.asarray(xv.vectors[utt], np.float32)[None]))[0])
        else:
            for f in feats:
                v, _ = two_views(rng, [f], 1, args.crop_frames)
                embs.append(np.asarray(embed_fn(v))[0])
        embs = np.stack(embs)
        pts = tsne_project(embs, perplexity=min(30.0, max(2.0, len(embs) / 3)))
        np.save(args.tsne_out, pts)
        print(f"t-SNE projection saved to {args.tsne_out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
