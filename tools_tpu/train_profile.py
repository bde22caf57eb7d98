#!/usr/bin/env python
"""Per-phase attribution of the default f32 GAN train step on the chip.

VERDICT r4 next #2: inference has a full per-stage attribution
(perf_profile.py) but the train step's MFU had none.  This tool times, at
the reference batch (40 x 3 s, configs/...frame75...yaml:10), separately-
jitted slices of the step (ref decoder/experiment.py:121-218):

  full_train_step  the production train_step (disc update + gen update)
  disc_phase       gen fwd (stop-grad) + disc value_and_grad + AdamW
  gen_phase        gen value_and_grad (all loss terms) + AdamW
  gen_fwd          generator forward only (encode+VQ+backbone+head)
  disc_fwd_all     all 3 discriminator families, forward losses only
  mpd_step         value_and_grad of the MPD hinge loss alone
  mrd_step         value_and_grad of the MRD hinge loss alone
  dac_step         value_and_grad of the DAC LS loss alone
  melcommit_step   gen value_and_grad with train_discriminator=False
                   (mel + commit only — the pretrain gate graph)

Methodology: the axon chip is time-shared and run-to-run contention can
swing single measurements several-fold (r5: a forward-only slice once
measured >= the sum of fwd+bwd slices).  All stages are therefore timed
ROUND-ROBIN: each pass takes one chained-pair estimate per stage, passes
repeat over minutes, and the MIN per stage is reported — contention has
to miss the same stage on every pass to survive.  Sums still need not
match `full_train_step` exactly (slices compile to their own programs)
but the table is for RELATIVE attribution.

`--remat-ab N` instead runs ONLY a remat=True vs remat=False A/B of the
full step at batch N (default batch 40 remat=False does not fit HBM, and
the A/B needs a fresh process — two full states + the slice programs of
a prior run OOM the chip).

Usage: python tools_tpu/train_profile.py [--batch 40] [--passes 6]
       python tools_tpu/train_profile.py --remat-ab 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=4,
                    help="chained iterations per estimate (long minus short)")
    ap.add_argument("--passes", type=int, default=6,
                    help="round-robin passes; min per stage is reported")
    ap.add_argument("--remat-ab", type=int, default=0, metavar="B",
                    help="run ONLY the remat on/off A/B at batch B")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from wavtokenizer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.train.losses import (dac_disc_loss_fused,
                                               vocos_disc_loss_fused)
    from wavtokenizer_tpu.train.step import (TrainConfig, _disc_loss_fn,
                                             _gen_loss_fn, create_train_state,
                                             generator_forward,
                                             make_optimizers, train_step)

    spec = WavTokenizerSpec()
    tcfg = TrainConfig()
    B = args.remat_ab or args.batch
    T = int(spec.sample_rate * args.seconds)
    rng = np.random.default_rng(0)
    audio = jax.device_put(jnp.asarray(
        rng.normal(size=(B, T)).astype(np.float32) * 0.1))
    key = jax.device_put(jax.random.PRNGKey(0))
    mel_c = jnp.asarray(tcfg.mel_loss_coeff, jnp.float32)
    bw = jnp.asarray(0)

    def pair_estimate(fn, iters):
        """One chained-pair estimate: (t[2+iters] - t[2]) / iters."""
        def run(n):
            o = jnp.asarray(0.0)
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(audio + o * 0.0)
            np.asarray(o)
            return time.perf_counter() - t0
        ts, tl = run(2), run(2 + iters)
        return (tl - ts) / iters

    # ---------------- remat A/B mode (fresh-process only) ----------------
    if args.remat_ab:
        for remat in (True, False):
            tc = TrainConfig(remat=remat)
            holder = {"st": jax.device_put(create_train_state(spec, tc,
                                                              seed=0))}

            def step_fn(a, holder=holder, tc=tc):
                holder["st"], m = train_step(holder["st"], a, key, spec, tc,
                                             mel_c)
                return m["gen_total"]
            step_fn(audio)  # compile
            ests = [pair_estimate(step_fn, args.iters)
                    for _ in range(args.passes)]
            t = min(e for e in ests if e > 0)
            print(json.dumps({
                "stage": f"full_b{B}_remat_{str(remat).lower()}",
                "ms": round(t * 1e3, 1),
                "train_rtf": round(B * args.seconds / t, 1)}), flush=True)
        return

    # ---------------- stage registry ------------------------------------
    state = jax.device_put(create_train_state(spec, tcfg, seed=0))
    opt_disc_tx, opt_gen_tx = make_optimizers(tcfg)

    audio_hat, _, _ = jax.jit(
        lambda g, v, a: generator_forward(g, v, spec, a, bw,
                                          jax.random.PRNGKey(1), 1))(
        state["gen"], state["vq"], audio)
    audio_hat = jax.device_put(jax.lax.stop_gradient(audio_hat))

    def full_fn(a):
        nonlocal state
        state, m = train_step(state, a, key, spec, tcfg, mel_c)
        return m["gen_total"]

    @jax.jit
    def disc_phase(disc, opt_disc, gen, vq, a):
        ah, _, _ = generator_forward(gen, vq, spec, a, bw,
                                     jax.random.PRNGKey(1), 1,
                                     remat=tcfg.remat)
        ah = jax.lax.stop_gradient(ah)
        (_, m), grads = jax.value_and_grad(_disc_loss_fn, has_aux=True)(
            disc, ah, a, bw, tcfg.mrd_loss_coeff, tcfg.remat, None)
        upd, new_opt = opt_disc_tx.update(grads, opt_disc, disc)
        return optax.apply_updates(disc, upd), new_opt, m["disc_total"]

    @jax.jit
    def gen_phase(gen, opt_gen, disc, vq, a):
        (_, (m, _, _)), grads = jax.value_and_grad(
            _gen_loss_fn, has_aux=True)(gen, disc, vq, spec, a, bw,
                                        jax.random.PRNGKey(2), 1, mel_c,
                                        tcfg.mrd_loss_coeff, True, tcfg.remat)
        upd, new_opt = opt_gen_tx.update(grads, opt_gen, gen)
        return optax.apply_updates(gen, upd), new_opt, m["gen_total"]

    @jax.jit
    def gen_fwd(gen, vq, a):
        ah, cl, _ = generator_forward(gen, vq, spec, a, bw,
                                      jax.random.PRNGKey(1), 1)
        return jnp.sum(ah[:1, :1]) + cl

    @jax.jit
    def disc_fwd(disc, ah, a):
        l, _ = _disc_loss_fn(disc, ah, a, bw, tcfg.mrd_loss_coeff)
        return l

    fam = {
        "mpd_step": lambda d, ah, a: vocos_disc_loss_fused(
            d["mpd"], "mpd", a, ah, bw),
        "mrd_step": lambda d, ah, a: vocos_disc_loss_fused(
            d["mrd"], "mrd", a, ah, bw),
        "dac_step": lambda d, ah, a: dac_disc_loss_fused(d, ah, a),
    }
    fam_jit = {name: jax.jit(lambda d, ah, a, loss=loss:
                             jax.value_and_grad(loss)(d, ah, a)[0])
               for name, loss in fam.items()}

    @jax.jit
    def melcommit(gen, vq, a):
        (_, (m, _, _)), grads = jax.value_and_grad(
            _gen_loss_fn, has_aux=True)(gen, state["disc"], vq, spec, a, bw,
                                        jax.random.PRNGKey(2), 1, mel_c,
                                        tcfg.mrd_loss_coeff, False, tcfg.remat)
        return m["gen_total"] + jax.tree_util.tree_leaves(grads)[0].ravel()[0]

    stages = [
        ("full_train_step", full_fn),
        ("disc_phase", lambda a: disc_phase(state["disc"], state["opt_disc"],
                                            state["gen"], state["vq"], a)[2]),
        ("gen_phase", lambda a: gen_phase(state["gen"], state["opt_gen"],
                                          state["disc"], state["vq"], a)[2]),
        ("gen_fwd", lambda a: gen_fwd(state["gen"], state["vq"], a)),
        ("disc_fwd_all", lambda a: disc_fwd(state["disc"], audio_hat, a)),
        *[(name, lambda a, f=f: f(state["disc"], audio_hat, a))
          for name, f in fam_jit.items()],
        ("melcommit_step", lambda a: melcommit(state["gen"], state["vq"], a)),
    ]

    # Compile everything first so robin passes measure steady state.
    for name, fn in stages:
        t0 = time.perf_counter()
        np.asarray(fn(audio))
        print(f"# compiled {name} ({time.perf_counter() - t0:.0f}s)",
              flush=True)

    best = {name: float("inf") for name, _ in stages}
    for p in range(args.passes):
        for name, fn in stages:
            est = pair_estimate(fn, args.iters)
            if 0 < est < best[name]:
                best[name] = est
        print(f"# pass {p + 1}/{args.passes}: " + " ".join(
            f"{n}={best[n] * 1e3:.0f}ms" for n, _ in stages), flush=True)

    rows = []
    for name, _ in stages:
        t = best[name]
        rows.append({"stage": name, "ms": round(t * 1e3, 1),
                     "train_rtf": round(B * args.seconds / t, 1)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"table": rows, "passes": args.passes}), flush=True)


if __name__ == "__main__":
    main()
