#!/usr/bin/env python
"""Batch reconstruction driver (ref: infer.py:31-70): load a checkpoint,
encode_infer + decode every file in a filelist, write 16-bit PCM WAVs.

TPU-first: files are grouped into fixed-shape batches (3 s crops or chunked
streaming for long files) so the device sees a handful of compiled shapes
instead of one dispatch per file.
"""

import argparse
import os

import numpy as np


def save_pcm16(path: str, wav: np.ndarray, sample_rate: int) -> None:
    """16-bit PCM writer (ref: encoder/utils.py:95-103 save_audio clamps)."""
    from scipy.io import wavfile
    wav = np.clip(wav, -0.99, 0.99)
    wavfile.write(path, sample_rate, (wav * 32767.0).astype(np.int16))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", required=True, help="torch .ckpt or orbax dir")
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--bandwidth-id", type=int, default=0)
    parser.add_argument("--batch-size", type=int, default=128,
                        help="device batch: chunks from MANY files share "
                             "each call (128 = measured chip sweet spot)")
    parser.add_argument("--chunk-seconds", type=float, default=3.0)
    parser.add_argument("--overlap", type=float, default=0.25,
                        help="chunk overlap fraction (ref tsne_inf.py uses "
                             "0.25; lower burns less redundant compute)")
    parser.add_argument("--files-per-group", type=int, default=64,
                        help="files read/decoded per host-side group "
                             "(bounds host RAM, not the device batch)")
    args = parser.parse_args(argv)

    from wavtokenizer_tpu import WavTokenizer
    from wavtokenizer_tpu.api.streaming import reconstruct_long_batch
    from wavtokenizer_tpu.train.data import read_audio, resample_np
    from wavtokenizer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if os.path.isdir(args.ckpt):   # orbax training checkpoint dir
        wt = WavTokenizer.from_train_checkpoint(args.config, args.ckpt)
    else:                          # torch/Lightning .ckpt
        wt = WavTokenizer.from_pretrained0802(args.config, args.ckpt)
    sr = wt.spec.sample_rate
    os.makedirs(args.out_dir, exist_ok=True)

    with open(args.filelist) as f:
        files = [l.strip() for l in f if l.strip()]

    # Host-side groups of files; inside a group every file's chunks share
    # fixed-shape (batch_size, chunk) device calls.
    for g in range(0, len(files), args.files_per_group):
        group = files[g:g + args.files_per_group]
        audios = []
        for path in group:
            y, in_sr = read_audio(path)
            if y.ndim > 1:
                y = y.mean(axis=-1)
            if in_sr != sr:
                y = resample_np(y, in_sr, sr)
            audios.append(y)
        wavs = reconstruct_long_batch(wt, audios,
                                      chunk_seconds=args.chunk_seconds,
                                      overlap=args.overlap,
                                      bandwidth_id=args.bandwidth_id,
                                      batch_size=args.batch_size)
        for path, y, wav in zip(group, audios, wavs):
            out = os.path.join(args.out_dir, os.path.basename(path))
            save_pcm16(out, np.asarray(wav)[:len(y)], sr)
            print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
