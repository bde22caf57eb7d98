"""AOT memory probe for the GAN train step.

Compiles (never executes) the full train step at a given batch size from
ShapeDtypeStructs only and prints XLA's memory analysis — the tool behind
the single-chip batch-size guidance in CLAUDE.md / README ("largest fitting
batch on a 16 GB v5e").  No reference counterpart (torch has no AOT
what-if compile); this is how the remat/layout work is measured.

Usage:
    python tools_tpu/mem_probe.py [--batch 40] [--seconds 3.0] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--no-remat-encoder", action="store_true",
                    help="selective remat: store encoder activations")
    ap.add_argument("--no-remat-disc", action="store_true",
                    help="selective remat: store discriminator activations")
    ap.add_argument("--remat-disc", default=None,
                    choices=["on", "off", "store_dac"],
                    help="discriminator remat mode (overrides "
                         "--no-remat-disc; store_dac stores only the DAC "
                         "family and remats MPD/MRD)")
    ap.add_argument("--disc-dtype", default="float32",
                    help="discriminator compute dtype (mixed precision; "
                         "e.g. bfloat16)")
    ap.add_argument("--cpu", action="store_true",
                    help="compile for XLA:CPU instead of the TPU chip "
                         "(layout conclusions do NOT transfer)")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.train.step import (TrainConfig, create_train_state,
                                             train_step)
    from wavtokenizer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    spec = WavTokenizerSpec()
    if args.remat_disc is not None:
        remat_disc = {"on": True, "off": False,
                      "store_dac": "store_dac"}[args.remat_disc]
    else:
        remat_disc = not args.no_remat_disc
    tcfg = TrainConfig(remat=not args.no_remat,
                       remat_encoder=not args.no_remat_encoder,
                       remat_disc=remat_disc,
                       disc_compute_dtype=args.disc_dtype)

    # Shapes only — no device buffers, no execution.
    state = jax.eval_shape(lambda: create_train_state(spec, tcfg, seed=0))
    B, T = args.batch, int(args.seconds * spec.sample_rate)
    audio = jax.ShapeDtypeStruct((B, T), jnp.float32)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    lowered = train_step.lower(state, audio, key, spec=spec, tcfg=tcfg,
                               mel_coeff=45.0, train_discriminator=True,
                               n_q=1)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024 ** 3
    print(f"batch={B} T={T} remat={tcfg.remat} remat_enc={tcfg.remat_encoder} "
          f"remat_disc={tcfg.remat_disc} platform={jax.devices()[0].platform}")
    if ma is None:
        print("memory_analysis unavailable on this backend")
        return 0
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            print(f"  {k}: {v / gib:.3f} GiB")
    tot = (getattr(ma, "temp_size_in_bytes", 0)
           + getattr(ma, "argument_size_in_bytes", 0)
           + getattr(ma, "output_size_in_bytes", 0)
           - getattr(ma, "alias_size_in_bytes", 0))
    print(f"  peak (temp+arg+out-alias): {tot / gib:.3f} GiB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
