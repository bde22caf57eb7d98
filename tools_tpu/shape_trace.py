#!/usr/bin/env python
"""Dump a per-layer I/O shape trace of the full model.

The reference ships a captured module tree with per-layer shapes
(wavtokenizer.txt) as its golden shape oracle; this tool regenerates the
same information from our layer specs using ``jax.eval_shape`` (no device,
no FLOPs) so converted checkpoints and config edits can be shape-checked.

Usage:
    python tools_tpu/shape_trace.py [--config configs/...yaml]
        [--batch 1] [--seconds 3] [-o trace.txt]
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shape_trace(spec, batch: int = 1, seconds: float = 3.0) -> str:
    """Returns the formatted trace (uses abstract shapes only)."""
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu.models.init import init_wavtokenizer
    from wavtokenizer_tpu.models.quantize import vq_infer
    from wavtokenizer_tpu.models.seanet import apply_seanet, encoder_layer_specs
    from wavtokenizer_tpu.models.vocos import (attn_block, convnext_block,
                                               group_norm, istft_head,
                                               pos_resnet_block)
    from wavtokenizer_tpu.ops.conv import conv1d

    params = jax.eval_shape(
        lambda: init_wavtokenizer(spec, seed=0, random_codebook=True))
    T = int(spec.sample_rate * seconds)
    out = io.StringIO()
    w = lambda depth, name, shape, extra="": out.write(
        "  " * depth + f"{name:<28s} {tuple(shape)} {extra}\n".rstrip() + "\n")

    out.write(f"WavTokenizer shape trace  (batch={batch}, clip={seconds}s @ "
              f"{spec.sample_rate} Hz, hop={spec.hop_length})\n")
    x = jax.ShapeDtypeStruct((batch, T, 1), jnp.float32)
    w(0, "input", x.shape)

    out.write("feature_extractor.encoder (SEANet)\n")
    specs = encoder_layer_specs(spec.seanet)
    enc = params["encoder"]
    for i, ls in enumerate(specs):
        x = jax.eval_shape(
            lambda p, a, u=i: apply_seanet([p], specs[u:u + 1], a), enc[i], x)
        label = ls.kind + (f" s{ls.stride}" if ls.stride > 1 else "")
        w(1, f"model.{i} {label}", x.shape)

    q = jax.eval_shape(lambda p, e: vq_infer(p, spec.vq, e),
                       params["quantizer"], x)
    w(0, "quantizer (VQ)", q[0].shape,
      f"codes {tuple(q[1].shape)}  [{spec.vq.bins} bins x {spec.vq.dimension}]")
    feats = q[0]

    out.write("backbone (Vocos)\n")
    bp = params["backbone"]
    g = spec.backbone.groupnorm_groups
    h = jax.eval_shape(lambda p, f: conv1d(f, p["embed"]["kernel"],
                                           p["embed"]["bias"], padding=(3, 3)),
                       bp, feats)
    w(1, "embed conv k7", h.shape)
    for i in range(len(bp["pos_net"]) - 1):
        blk = bp["pos_net"][i]
        if "q" in blk:
            h = jax.eval_shape(lambda p, a: attn_block(p, a, g), blk, h)
            w(1, f"pos_net.{i} attn", h.shape)
        else:
            h = jax.eval_shape(lambda p, a: pos_resnet_block(p, a, g), blk, h)
            w(1, f"pos_net.{i} resblock", h.shape)
    w(1, f"pos_net.{len(bp['pos_net'])-1} groupnorm", h.shape)
    for i, blk in enumerate(bp["convnext"]):
        h = jax.eval_shape(
            lambda p, a: convnext_block(p, a, cond_id=0, fused=False), blk, h)
        w(1, f"convnext.{i}", h.shape)

    y = jax.eval_shape(lambda p, a: istft_head(p["head"], spec.head, a),
                       params, h)
    w(0, "head (ISTFT)", y.shape,
      f"[n_fft={spec.head.n_fft} hop={spec.head.hop_length}]")
    return out.getvalue()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args(argv)

    if args.config:
        from wavtokenizer_tpu.api.config import spec_from_config
        spec = spec_from_config(args.config)
    else:
        from wavtokenizer_tpu import WavTokenizerSpec
        spec = WavTokenizerSpec()

    text = shape_trace(spec, args.batch, args.seconds)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)
        print(f"wrote {args.output}")
    else:
        print(text, end="")


if __name__ == "__main__":
    main()
