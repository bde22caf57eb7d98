#!/usr/bin/env python
"""Feature-enhancement training CLI (the fork's research trainers).

Covers all three regimes behind --mode (behavioral contracts:
try3.py waveform loop / tsne.py feature loop / train_with_tsne.py hybrid):

    waveform  adapter + SEANet decoder train on the voice-focused waveform
              loss, features*1.5 -> tanh before decode (try3.py:1038-1053)
    feature   adapter-only, L2 between enhanced(noisy) and encoder(clean)
              features (tsne.py:152-169)
    hybrid    0.7 voice-focused + 0.3 cosine feature loss
              (train_with_tsne.py:52-90)
    byol      try.py:36-134 — the BYOL SimpleTransformer inserted between
              the frozen encoder and the adapter; transformer + adapter +
              decoder train on the voice-focused loss with try.py's
              amplitude hacks.  --byol-ckpt loads transformer weights with
              the reference's strict=False semantics (shape-matching
              leaves only; the fork's actual BYOL checkpoints match
              nothing and the transformer trains from init).

Resume (resume_training.py equivalent) via --resume <ckpt-dir>.

Usage:
    python tools_tpu/enhance_train.py --pairs-file data/speaker_pairs.txt \
        [--config configs/...yaml --checkpoint model.ckpt] \
        --mode waveform --steps 1000 --out-dir runs/enhance
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
    ap.add_argument("--pairs-file", required=True,
                    help="noisy|clean lines (prepare_data_lists.py output)")
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None,
                    help="base WavTokenizer torch checkpoint (frozen encoder)")
    ap.add_argument("--mode", choices=["waveform", "feature", "hybrid",
                                       "byol"],
                    default="waveform")
    ap.add_argument("--byol-ckpt", default=None,
                    help="orbax checkpoint dir from byol_train.py (byol "
                         "mode; partial strict=False-style load)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--num-samples", type=int, default=72000)
    ap.add_argument("--learning-rate", type=float, default=1e-4)
    ap.add_argument("--out-dir", default="runs/enhance")
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume")
    ap.add_argument("--save-every", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    from wavtokenizer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from wavtokenizer_tpu.models.init import init_wavtokenizer
    from wavtokenizer_tpu.research.adapter import init_adapter
    from wavtokenizer_tpu.research.enhance import (EnhanceConfig,
                                                   PairedAudioDataset,
                                                   enhance_step,
                                                   make_enhance_optimizer)
    from wavtokenizer_tpu.train.trainer import load_checkpoint, save_checkpoint

    if args.config and args.checkpoint:
        from wavtokenizer_tpu.api.pretrained import WavTokenizer
        m = WavTokenizer.from_pretrained0802(args.config, args.checkpoint)
        spec, base_params = m.spec, jax.device_get(m.params)
    else:
        from wavtokenizer_tpu import WavTokenizerSpec
        spec = WavTokenizerSpec()
        base_params = init_wavtokenizer(spec, seed=args.seed,
                                        random_codebook=True)
        print("note: no --config/--checkpoint given, using random base model")

    ecfg = EnhanceConfig(mode=args.mode, learning_rate=args.learning_rate)
    adapter_params, adapter_state = init_adapter(seed=args.seed)
    decoder_params = base_params["decoder"]
    transformer_params = None
    if args.mode == "byol":
        from wavtokenizer_tpu.research.adapter import (init_inpath_transformer,
                                                       load_byol_transformer)
        transformer_params = init_inpath_transformer(seed=args.seed)
        if args.byol_ckpt:
            import orbax.checkpoint as ocp
            ck = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.byol_ckpt))
            tree = ck.get("online", ck).get("encoder", ck) \
                if isinstance(ck, dict) else ck
            transformer_params, n = load_byol_transformer(transformer_params,
                                                          tree)
            print(f"byol ckpt: {n} shape-matching leaves loaded "
                  "(strict=False semantics, try.py:101-104)")
    opt_state = make_enhance_optimizer(adapter_params, decoder_params, ecfg,
                                       transformer_params)
    start_step = 0

    os.makedirs(args.out_dir, exist_ok=True)
    if args.resume:
        tpl = {"adapter": adapter_params, "adapter_state": adapter_state,
               "decoder": decoder_params, "step": np.asarray(0)}
        if transformer_params is not None:
            tpl["transformer"] = transformer_params
        ck = load_checkpoint(args.resume, tpl)
        adapter_params, adapter_state = ck["adapter"], ck["adapter_state"]
        decoder_params = ck["decoder"]
        transformer_params = ck.get("transformer", transformer_params)
        start_step = int(ck["step"])
        print(f"resumed from {args.resume} at step {start_step}")

    ds = PairedAudioDataset(args.pairs_file, sample_rate=spec.sample_rate,
                            num_samples=args.num_samples, seed=args.seed)
    print(f"{len(ds)} pairs, mode={args.mode}")
    it = ds.batches(args.batch_size, shuffle=True, seed=args.seed)

    log_path = os.path.join(args.out_dir, "metrics.jsonl")
    best = float("inf")
    t0 = time.time()
    with open(log_path, "a") as logf:
        for step in range(start_step, args.steps):
            noisy, clean = next(it)
            (opt_state, adapter_params, adapter_state, decoder_params,
             transformer_params, loss) = enhance_step(
                opt_state, adapter_params, adapter_state, decoder_params,
                base_params, noisy, clean, spec, ecfg, transformer_params)
            loss = float(loss)
            if step % 10 == 0:
                rec = {"step": step, "loss": loss,
                       "sec": round(time.time() - t0, 1)}
                print(rec)
                logf.write(json.dumps(rec) + "\n")
                logf.flush()
            ck = {"adapter": adapter_params, "adapter_state": adapter_state,
                  "decoder": decoder_params, "step": np.asarray(step + 1)}
            if transformer_params is not None:
                ck["transformer"] = transformer_params
            if loss < best:
                best = loss
                save_checkpoint(os.path.join(args.out_dir, "best_model"), ck)
            if (step + 1) % args.save_every == 0:
                save_checkpoint(os.path.join(args.out_dir, f"step_{step+1}"), ck)
    save_checkpoint(os.path.join(args.out_dir, "last"), ck)
    print(f"done; best loss {best:.5f}; checkpoints in {args.out_dir}")


if __name__ == "__main__":
    main()
