#!/usr/bin/env python
"""Feature-space analysis drivers: roundtrip t-SNE and clean-vs-enhanced
comparison plots.

Behavioral contract: the fork's two standalone analysis scripts —

* ``roundtrip`` mode = wav_re.py:39-100: encode every wav in a folder with
  the plain tokenizer, t-SNE the pooled features (one point per file,
  colored by filename group), decode, and save the reconstructions.
* ``compare`` mode = add.py:354-443: a COMBINED t-SNE of clean features
  (plain tokenizer) vs enhanced features (adapter path) across materials —
  each (material, variant) pair gets its own scatter group.

TPU-first: all clips are batched into one fixed-shape device call per mode
(3 s crop/pad, like the training crop) instead of the reference's
one-file-at-a-time python loop; the t-SNE itself is host-side sklearn
(research/analysis.py), matching the reference's use of sklearn.

Usage:
    python tools_tpu/analyze_features.py roundtrip --input-dir wavs/ \
        --out-dir out/ [--config c.yaml --checkpoint m.ckpt]
    python tools_tpu/analyze_features.py compare --input-dir wavs/ \
        --adapter-ckpt runs/enhance/best_model --out-dir out/
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def material_of(name: str, pattern: str = r"([A-Za-z]+)") -> str:
    """Group label from a filename (add.py keys its plots off the material
    token embedded in the name, e.g. ``s1_box_LDV.wav`` -> ``box``)."""
    parts = re.split(r"[_\-.]", os.path.splitext(os.path.basename(name))[0])
    for p in parts[1:]:
        m = re.fullmatch(pattern, p)
        if m:
            return m.group(1)
    return parts[0]


def load_clips(input_dir: str, sample_rate: int, seconds: float = 3.0):
    """Read every wav, mono-mix, resample, crop/repeat-pad to a fixed 3 s
    window -> (names, (N, T) float32). Fixed shape = one compiled program."""
    from wavtokenizer_tpu.train.data import read_audio, resample_np

    T = int(seconds * sample_rate)
    names, clips = [], []
    for name in sorted(os.listdir(input_dir)):
        if not name.lower().endswith((".wav", ".flac")):
            continue
        y, sr = read_audio(os.path.join(input_dir, name))
        if y.ndim > 1:
            y = y.mean(axis=-1)
        if sr != sample_rate:
            y = resample_np(y, sr, sample_rate)
        if len(y) < T:
            reps = 1 + T // max(len(y), 1)
            y = np.tile(y, reps)[:T]
        else:
            y = y[:T]
        names.append(name)
        clips.append(np.asarray(y, np.float32))
    if not clips:
        raise SystemExit(f"no audio files in {input_dir}")
    return names, np.stack(clips)


def _load_model(args):
    import jax

    if args.config and args.checkpoint:
        from wavtokenizer_tpu.api.pretrained import WavTokenizer
        m = WavTokenizer.from_pretrained0802(args.config, args.checkpoint)
        return m.spec, jax.device_get(m.params)
    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.models.init import init_wavtokenizer
    print("note: random base model (no --config/--checkpoint)")
    return WavTokenizerSpec(), init_wavtokenizer(WavTokenizerSpec(),
                                                 random_codebook=True)


def run_roundtrip(args) -> int:
    import jax
    import jax.numpy as jnp

    from infer import save_pcm16
    from wavtokenizer_tpu.models import wavtokenizer as wt
    from wavtokenizer_tpu.research.analysis import (plot_tsne, pool_features,
                                                    tsne_project)

    spec, params = _load_model(args)
    names, clips = load_clips(args.input_dir, spec.sample_rate, args.seconds)

    @jax.jit
    def roundtrip(params, audio):
        feats, codes = wt.encode_infer(params, spec, audio)
        return feats, wt.decode(params, spec, feats, args.bandwidth_id)

    feats, recon = roundtrip(params, jnp.asarray(clips))
    feats, recon = np.asarray(feats), np.asarray(recon)

    os.makedirs(args.out_dir, exist_ok=True)
    for name, wav in zip(names, recon):
        # reconstructions are PCM WAV regardless of the source container
        out_name = os.path.splitext(name)[0] + ".wav"
        save_pcm16(os.path.join(args.out_dir, out_name), wav, spec.sample_rate)
    pooled = pool_features(feats, time_axis=2)   # encode_infer: (B, D, T')
    np.save(os.path.join(args.out_dir, "pooled_features.npy"), pooled)
    if len(names) >= 3:
        pts = tsne_project(pooled, perplexity=args.perplexity)
        labels = [material_of(n) for n in names]
        plot_tsne(pts, labels, os.path.join(args.out_dir, "tsne.png"),
                  title="encoder features (wav_re-style roundtrip)")
        print(f"t-SNE -> {os.path.join(args.out_dir, 'tsne.png')}")
    print(f"wrote {len(names)} reconstructions to {args.out_dir}")
    return 0


def run_compare(args) -> int:
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu.models.seanet import seanet_encode
    from wavtokenizer_tpu.research.adapter import enhanced_forward, init_adapter
    from wavtokenizer_tpu.research.analysis import (plot_tsne, pool_features,
                                                    tsne_project)
    from wavtokenizer_tpu.train.trainer import load_checkpoint

    spec, params = _load_model(args)
    names, clips = load_clips(args.input_dir, spec.sample_rate, args.seconds)

    adapter_params, adapter_state = init_adapter()
    tpl = {"adapter": adapter_params, "adapter_state": adapter_state,
           "decoder": params["decoder"], "step": np.asarray(0)}
    ck = load_checkpoint(args.adapter_ckpt, tpl)

    @jax.jit
    def both(params, audio):
        clean = seanet_encode(params["encoder"], spec.seanet, audio[:, :, None])
        _, enhanced, _, _ = enhanced_forward(params, spec.seanet,
                                             ck["adapter"], ck["adapter_state"],
                                             audio, train=False)
        return clean, enhanced

    clean, enhanced = both(params, jnp.asarray(clips))
    # seanet_encode / enhanced_forward are channel-last: (B, T', D)
    pooled = np.concatenate([pool_features(np.asarray(clean), time_axis=1),
                             pool_features(np.asarray(enhanced), time_axis=1)])
    labels = ([f"{material_of(n)}/clean" for n in names] +
              [f"{material_of(n)}/enhanced" for n in names])

    os.makedirs(args.out_dir, exist_ok=True)
    np.save(os.path.join(args.out_dir, "combined_features.npy"), pooled)
    out_png = os.path.join(args.out_dir, "combined_tsne.png")
    pts = tsne_project(pooled, perplexity=args.perplexity)
    plot_tsne(pts, labels, out_png,
              title="clean vs enhanced features (add.py-style)")
    print(f"combined t-SNE ({len(names)} files x 2 variants) -> {out_png}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    for mode in ("roundtrip", "compare"):
        p = sub.add_parser(mode)
        p.add_argument("--input-dir", required=True)
        p.add_argument("--out-dir", required=True)
        p.add_argument("--config", default=None)
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--seconds", type=float, default=3.0)
        p.add_argument("--perplexity", type=float, default=30.0)
        p.add_argument("--bandwidth-id", type=int, default=0)
    sub.choices["compare"].add_argument("--adapter-ckpt", required=True)
    args = ap.parse_args(argv)

    from wavtokenizer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    return run_roundtrip(args) if args.mode == "roundtrip" else run_compare(args)


if __name__ == "__main__":
    raise SystemExit(main())
