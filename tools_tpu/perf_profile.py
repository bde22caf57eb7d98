#!/usr/bin/env python
"""Per-stage performance profile of the inference pipeline on the local chip.

Prints a stage table (encoder / VQ / backbone / ISTFT head / totals) with
per-stage milliseconds and the end-to-end real-time factor; optionally dumps
an XLA profiler trace for TensorBoard (``--trace-dir``).

This is the framework's profiling entry point (SURVEY.md §5 'tracing /
profiling'); the reference has no equivalent tooling.

Usage:
    python tools_tpu/profile.py [--batch 128] [--seconds 3] [--trace-dir d/]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--config", default=None,
                    help="reference YAML config (default: small-320 spec)")
    ap.add_argument("--checkpoint", default=None,
                    help="torch checkpoint (default: random weights)")
    ap.add_argument("--trace-dir", default=None,
                    help="also dump a TensorBoard XLA trace here")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    if args.config and args.checkpoint:
        from wavtokenizer_tpu.api.pretrained import WavTokenizer
        m = WavTokenizer.from_pretrained0802(args.config, args.checkpoint)
        params, spec = m.params, m.spec
    else:
        from wavtokenizer_tpu import WavTokenizerSpec
        from wavtokenizer_tpu.models.init import init_wavtokenizer
        spec = WavTokenizerSpec()
        params = jax.device_put(init_wavtokenizer(spec, random_codebook=True))

    from wavtokenizer_tpu.utils.profiling import (device_peak_flops,
                                                  pipeline_stages,
                                                  stage_flops, stage_timings,
                                                  xla_trace)

    B = args.batch
    T = int(spec.sample_rate * args.seconds)
    rng = np.random.default_rng(0)
    audio = jax.device_put(jnp.asarray(
        rng.normal(size=(B, T)).astype(np.float32) * 0.1))

    print(f"device: {jax.devices()[0].device_kind}  batch={B}  clip={args.seconds}s")
    stages = pipeline_stages(params, spec, audio)
    times = stage_timings(stages, iters=args.iters)
    flops = stage_flops(stages)
    peak = device_peak_flops()
    print(f"  {'stage':13s} {'ms':>8s} {'tflops/s':>9s} {'mfu':>7s}")
    for name, ms in times.items():
        f = flops.get(name, 0.0)
        tfs = f / (ms / 1e3) / 1e12 if ms > 0 and f > 0 else 0.0
        mfu = f"{tfs * 1e12 / peak:7.3f}" if peak and tfs else "      -"
        print(f"  {name:13s} {ms:8.2f} {tfs:9.2f} {mfu}")
    rtf = B * args.seconds / (times["roundtrip"] / 1e3)
    print(f"  realtime factor: {rtf:.0f}x audio-sec/sec/chip")

    if args.trace_dir:
        fn = jax.jit(stages["roundtrip"][0])
        fn(params, audio)  # compile outside the trace
        with xla_trace(args.trace_dir):
            out = fn(params, audio)
            np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
        print(f"XLA trace written to {args.trace_dir}")


if __name__ == "__main__":
    main()
