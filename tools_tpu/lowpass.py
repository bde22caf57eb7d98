#!/usr/bin/env python
"""Batch lowpass filter: remove content above a cutoff from a folder of wavs.

Behavioral contract: reference dd.py:6-74 — per file: load, resample to
24 kHz, mono-mix, STFT (n_fft 2048, hop 512), zero all bins above the
cutoff (default 4 kHz), ISTFT, peak-normalize, save.

TPU-first design: instead of the reference's one-file-at-a-time torch
loop, all files are zero-padded into fixed-length batches and the whole
mask -> ISTFT -> normalize pipeline runs as ONE jit-compiled device call
per batch (STFT framing + masked inverse-DFT matmuls on the MXU).

Usage:
    python tools_tpu/lowpass.py --input-dir noisy/ --output-dir filtered/ \
        [--cutoff 4000] [--sample-rate 24000] [--batch-size 16]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FFT = 2048
HOP = N_FFT // 4


def lowpass_batch(audio, sample_rate: int, cutoff: float):
    """(B, L) -> (B, L') lowpassed + peak-normalized (jit-able)."""
    import jax.numpy as jnp
    from wavtokenizer_tpu.ops.spectral import istft_center, stft

    spec = stft(audio, N_FFT, HOP, center=True)            # (B, T, F)
    freqs = np.linspace(0, sample_rate // 2, N_FFT // 2 + 1)
    mask = jnp.asarray((freqs <= cutoff).astype(np.float32))
    spec = spec * mask
    y = istft_center(jnp.real(spec), jnp.imag(spec), N_FFT, HOP)
    peak = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    return y / jnp.maximum(peak, 1e-9)


def process_folder(input_dir: str, output_dir: str, sample_rate: int = 24000,
                   cutoff: float = 4000.0, batch_size: int = 16) -> int:
    import jax
    import jax.numpy as jnp
    from scipy.io import wavfile

    from wavtokenizer_tpu.train.data import read_audio, resample_np
    from wavtokenizer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    os.makedirs(output_dir, exist_ok=True)
    names = sorted(n for n in os.listdir(input_dir) if n.endswith(".wav"))
    fn = jax.jit(lambda a: lowpass_batch(a, sample_rate, cutoff))

    done = 0
    for start in range(0, len(names), batch_size):
        chunk = names[start:start + batch_size]
        waves = []
        for name in chunk:
            y, sr = read_audio(os.path.join(input_dir, name))
            if y.ndim > 1:
                y = y.mean(axis=-1)
            if sr != sample_rate:
                y = resample_np(y, sr, sample_rate)
            waves.append(y.astype(np.float32))
        lens = [len(y) for y in waves]
        # Pad to a shared bucket length (multiple of 4 hops limits recompiles).
        bucket = math.ceil(max(lens) / (4 * HOP)) * 4 * HOP
        batch = np.zeros((len(waves), bucket), dtype=np.float32)
        for i, y in enumerate(waves):
            batch[i, :len(y)] = y
        out = np.asarray(fn(jnp.asarray(batch)))
        for i, name in enumerate(chunk):
            y = out[i, :min(lens[i], out.shape[1])]
            wavfile.write(os.path.join(output_dir, name), sample_rate,
                          (np.clip(y, -1.0, 1.0) * 32767.0).astype(np.int16))
            done += 1
        print(f"{done}/{len(names)} files")
    return done


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--cutoff", type=float, default=4000.0)
    ap.add_argument("--sample-rate", type=int, default=24000)
    ap.add_argument("--batch-size", type=int, default=16)
    args = ap.parse_args(argv)
    n = process_folder(args.input_dir, args.output_dir, args.sample_rate,
                       args.cutoff, args.batch_size)
    print(f"filtered {n} files -> {args.output_dir}")


if __name__ == "__main__":
    main()
