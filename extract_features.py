#!/usr/bin/env python
"""Bulk feature extraction (ref: extract_features.py:32-178): raw pre-VQ
SEANet encoder features for a file or a directory tree, saved as .npy.

TPU-first rebuild of the reference's serial batch=1 loop
(SURVEY.md §3.5): fixed-length 3 s windows are packed into large batches and
sharded over the device mesh ('data' axis), so a LibriTTS shard streams
through all chips in parallel (BASELINE config #5).
"""

import argparse
import os
from pathlib import Path

import numpy as np


def iter_audio_files(path: str):
    p = Path(path)
    if p.is_file():
        yield p
        return
    for ext in ("*.wav", "*.flac", "*.mp3"):
        yield from sorted(p.rglob(ext))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--input", required=True, help="audio file or directory")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--seconds", type=float, default=3.0,
                        help="window length per item (repeat-pad/crop)")
    parser.add_argument("--codes", action="store_true",
                        help="also save discrete token ids")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu import WavTokenizer
    from wavtokenizer_tpu.models.seanet import seanet_encode
    from wavtokenizer_tpu.models.quantize import vq_infer
    from wavtokenizer_tpu.parallel.mesh import make_mesh, shard_batch
    from wavtokenizer_tpu.train.data import read_audio, resample_np
    from wavtokenizer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    wt = WavTokenizer.from_pretrained0802(args.config, args.ckpt)
    spec = wt.spec
    sr = spec.sample_rate
    T = int(args.seconds * sr)
    os.makedirs(args.out_dir, exist_ok=True)

    mesh = make_mesh(model_parallel=1)
    n_dev = mesh.devices.size

    @jax.jit
    def extract(params, audio):
        emb = seanet_encode(params["encoder"], spec.seanet, audio[:, :, None])
        _, codes, _ = vq_infer(params["quantizer"], spec.vq, emb)
        return jnp.swapaxes(emb, 1, 2), codes  # (B, D, T'), (1, B, T')

    files = list(iter_audio_files(args.input))
    print(f"{len(files)} files, batch {args.batch_size} over {n_dev} device(s)")

    def load(path):
        y, in_sr = read_audio(str(path))
        if y.ndim > 1:
            y = y.mean(axis=-1)
        if in_sr != sr:
            y = resample_np(y, in_sr, sr)
        y = y / (np.abs(y).max() + 1e-9)  # peak norm (ref: extract_features.py:43)
        if len(y) < T:
            reps = 1 + (T - len(y)) // len(y)
            y = np.concatenate([y] * (reps + 1))[:T]
        return y[:T].astype(np.float32)

    B = args.batch_size - args.batch_size % n_dev or n_dev
    for i in range(0, len(files), B):
        chunk = files[i:i + B]
        batch = np.stack([load(p) for p in chunk])
        if len(batch) % n_dev:  # pad to divide the mesh
            pad = n_dev - len(batch) % n_dev
            batch = np.concatenate([batch, np.zeros((pad, T), np.float32)])
        audio = shard_batch(mesh, jnp.asarray(batch))
        feats, codes = extract(wt.params, audio)
        feats = np.asarray(feats)[:len(chunk)]
        codes = np.asarray(codes)[:, :len(chunk)]
        for j, p in enumerate(chunk):
            out = os.path.join(args.out_dir, p.stem + "_features.npy")
            np.save(out, feats[j])
            if args.codes:
                np.save(os.path.join(args.out_dir, p.stem + "_codes.npy"),
                        codes[:, j])
        print(f"[{i + len(chunk)}/{len(files)}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
