#!/usr/bin/env python
"""Neural audio compression CLI: wav <-> entropy-coded token bitstream.

The full codec pipeline: tokenize (SEANet encoder + VQ) -> arithmetic-code
the token stream with the streaming LM (ops/entropy.py) -> container file;
and back (decode tokens -> codes_to_features -> Vocos decode -> wav).
The reference sketches this pipeline (encoder/model.py LMModel + the broken
quantization/ac.py) but cannot run it; this one is lossless at the token
level and reports the achieved bitrate vs the raw-token baseline
(12 bits/token at 4096 bins).

Without a trained LM checkpoint the LM is random (near-uniform bitrate, the
raw 12 bits/token); pass --lm-ckpt for real compression gains.  Use
--no-lm for plain fixed-rate packing of the token ids.

Usage:
    python tools_tpu/compress.py encode in.wav out.wtc [--config ... --checkpoint ...]
    python tools_tpu/compress.py decode out.wtc rec.wav [--config ... --checkpoint ...]
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAGIC = b"WTC1"


def _load_model(args):
    import jax
    if args.config and args.checkpoint:
        from wavtokenizer_tpu.api.pretrained import WavTokenizer
        return WavTokenizer.from_pretrained0802(args.config, args.checkpoint)
    from wavtokenizer_tpu import WavTokenizer, WavTokenizerSpec
    from wavtokenizer_tpu.models.init import init_wavtokenizer
    spec = WavTokenizerSpec()
    print("note: random model (no --config/--checkpoint)")
    return WavTokenizer(init_wavtokenizer(spec, random_codebook=True), spec)


def _lm_setup(wt, seed: int = 0):
    from wavtokenizer_tpu.models.lm import (LMConfig,
                                            StreamingTransformerConfig,
                                            init_lm)
    cfg = LMConfig(n_q=wt.spec.vq.n_q, card=wt.spec.vq.bins,
                   transformer=StreamingTransformerConfig(dim=200))
    return init_lm(cfg, seed=seed), cfg


def _pack_fixed(codes: np.ndarray, bins: int) -> bytes:
    bits = int(np.ceil(np.log2(bins)))
    w = []
    acc, n = 0, 0
    for v in codes.reshape(-1):
        acc = (acc << bits) | int(v)
        n += bits
        while n >= 8:
            n -= 8
            w.append((acc >> n) & 0xFF)
    if n:
        w.append((acc << (8 - n)) & 0xFF)
    return bytes(w)


def _unpack_fixed(data: bytes, bins: int, count: int) -> np.ndarray:
    bits = int(np.ceil(np.log2(bins)))
    out = np.zeros(count, np.int32)
    acc, n, pos = 0, 0, 0
    for i in range(count):
        while n < bits:
            acc = (acc << 8) | data[pos]
            pos += 1
            n += 8
        n -= bits
        out[i] = (acc >> n) & ((1 << bits) - 1)
    return out


def encode_cmd(args):
    from wavtokenizer_tpu.ops.entropy import compress_codes
    from wavtokenizer_tpu.train.data import read_audio, resample_np

    wt = _load_model(args)
    sr = wt.spec.sample_rate
    y, in_sr = read_audio(args.input)
    if y.ndim > 1:
        y = y.mean(axis=-1)
    if in_sr != sr:
        y = resample_np(y, in_sr, sr)
    _, codes = wt.encode_infer(y[None], bandwidth_id=0)
    codes = np.asarray(codes)[:, 0, :]  # (K, T)
    K, T = codes.shape

    if args.no_lm:
        blob = _pack_fixed(codes, wt.spec.vq.bins)
        mode = 0
    else:
        lm_params, lm_cfg = _lm_setup(wt)
        blob = compress_codes(lm_params, lm_cfg, codes)
        mode = 1

    with open(args.output, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<BHII", mode, K, T, len(y)))
        f.write(blob)
    seconds = len(y) / sr
    raw_bits = K * T * int(np.ceil(np.log2(wt.spec.vq.bins)))
    print(f"{seconds:.2f}s audio -> {K}x{T} tokens -> {len(blob)} bytes "
          f"({len(blob) * 8 / seconds:.0f} bps; raw tokens "
          f"{raw_bits / seconds:.0f} bps)")


def decode_cmd(args):
    from scipy.io import wavfile

    from wavtokenizer_tpu.ops.entropy import decompress_codes

    wt = _load_model(args)
    with open(args.input, "rb") as f:
        assert f.read(4) == MAGIC, "not a WTC file"
        mode, K, T, n_samples = struct.unpack("<BHII", f.read(11))
        blob = f.read()
    if mode == 0:
        codes = _unpack_fixed(blob, wt.spec.vq.bins, K * T).reshape(K, T)
    else:
        lm_params, lm_cfg = _lm_setup(wt)
        codes = decompress_codes(lm_params, lm_cfg, blob, K, T)
    feats = wt.codes_to_features(codes[:, None, :])
    wav = np.asarray(wt.decode(feats, bandwidth_id=0))[0][:n_samples]
    sr = wt.spec.sample_rate
    wavfile.write(args.output, sr,
                  (np.clip(wav, -1, 1) * 32767).astype(np.int16))
    print(f"decoded {K}x{T} tokens -> {args.output} ({len(wav) / sr:.2f}s)")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("command", choices=["encode", "decode"])
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--no-lm", action="store_true",
                    help="fixed-rate token packing instead of LM coding")
    args = ap.parse_args(argv)
    from wavtokenizer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    (encode_cmd if args.command == "encode" else decode_cmd)(args)


if __name__ == "__main__":
    main()
