#!/usr/bin/env python
"""Enhanced-model inference over a folder of (long) wavs.

Behavioral contract: tsne_inf.py:63-157 — 3 s segments with 25% overlap and
linear fade-in/out cross-fade; here all segments run as ONE batched device
call (api.streaming) instead of the reference's per-segment python loop.

Usage:
    python tools_tpu/enhance_infer.py --input-dir noisy/ --output-dir out/ \
        --adapter-ckpt runs/enhance/best_model \
        [--config configs/...yaml --checkpoint model.ckpt]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--adapter-ckpt", required=True)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--chunk-seconds", type=float, default=3.0)
    ap.add_argument("--overlap", type=float, default=0.25)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from scipy.io import wavfile

    from wavtokenizer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from wavtokenizer_tpu.api.streaming import chunk_audio, crossfade_join
    from wavtokenizer_tpu.models.init import init_wavtokenizer
    from wavtokenizer_tpu.research.adapter import enhanced_forward, init_adapter
    from wavtokenizer_tpu.train.data import read_audio, resample_np
    from wavtokenizer_tpu.train.trainer import load_checkpoint

    if args.config and args.checkpoint:
        from wavtokenizer_tpu.api.pretrained import WavTokenizer
        m = WavTokenizer.from_pretrained0802(args.config, args.checkpoint)
        spec, base_params = m.spec, jax.device_get(m.params)
    else:
        from wavtokenizer_tpu import WavTokenizerSpec
        spec = WavTokenizerSpec()
        base_params = init_wavtokenizer(spec, random_codebook=True)
        print("note: random base model (no --config/--checkpoint)")

    adapter_params, adapter_state = init_adapter()
    tpl = {"adapter": adapter_params, "adapter_state": adapter_state,
           "decoder": base_params["decoder"], "step": np.asarray(0)}
    ck = load_checkpoint(args.adapter_ckpt, tpl)
    base_params = dict(base_params)
    base_params["decoder"] = ck["decoder"]

    sr = spec.sample_rate
    chunk_samples = int(args.chunk_seconds * sr)

    @jax.jit
    def enhance_chunks(chunks):
        out, _, _, _ = enhanced_forward(base_params, spec.seanet,
                                        ck["adapter"], ck["adapter_state"],
                                        chunks, train=False,
                                        feature_scale=1.5)
        return out

    os.makedirs(args.output_dir, exist_ok=True)
    names = sorted(n for n in os.listdir(args.input_dir) if n.endswith(".wav"))
    for i, name in enumerate(names):
        y, in_sr = read_audio(os.path.join(args.input_dir, name))
        if y.ndim > 1:
            y = y.mean(axis=-1)
        if in_sr != sr:
            y = resample_np(y, in_sr, sr)
        chunks, stride, orig_len = chunk_audio(jnp.asarray(y), chunk_samples,
                                               args.overlap)
        out = enhance_chunks(chunks)
        joined = np.asarray(crossfade_join(out[:, :chunk_samples], stride,
                                           orig_len))
        peak = np.abs(joined).max()
        if peak > 1.0:
            joined = joined / peak
        wavfile.write(os.path.join(args.output_dir, name), sr,
                      (np.clip(joined, -1, 1) * 32767).astype(np.int16))
        print(f"{i + 1}/{len(names)} {name}")


if __name__ == "__main__":
    main()
