#!/usr/bin/env python
"""Environment smoke test (ref: test_env.py:6-36 / c.py — CUDA visibility +
checkpoint-load checks, rebuilt for the TPU runtime).

Prints the JAX backend, device inventory, a tiny compile/execute roundtrip,
compilation-cache status, and (optionally) that a checkpoint loads.

Usage:
    python tools_tpu/check_env.py [--config c.yaml --checkpoint m.ckpt]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wavtokenizer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    devs = jax.devices()
    print(f"jax {jax.__version__}  backend={jax.default_backend()}  "
          f"devices={len(devs)} x {devs[0].device_kind}")

    t0 = time.perf_counter()
    y = jax.jit(lambda x: jnp.sum(x * x))(jnp.arange(1024.0))
    val = float(np.asarray(y))
    print(f"compile+execute roundtrip: {time.perf_counter() - t0:.2f}s "
          f"(sum sq 0..1023 = {val:.0f}, expect ~357389824)")
    # f32 reduction order varies by backend (XLA:CPU is off by ~32 here);
    # allow ulp-scale drift, catch garbage
    ok = abs(val - 357389824.0) / 357389824.0 < 1e-5

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    print(f"compilation cache: {cache_dir} "
          f"({'present' if os.path.isdir(cache_dir) else 'missing'})")

    if args.config and args.checkpoint:
        from wavtokenizer_tpu.api.pretrained import WavTokenizer
        wt = WavTokenizer.from_pretrained0802(args.config, args.checkpoint)
        n = sum(np.asarray(l).size for l in jax.tree_util.tree_leaves(wt.params)
                if hasattr(l, "size"))
        print(f"checkpoint loads: {args.checkpoint} ({n / 1e6:.1f} M params)")

    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
