#!/usr/bin/env python
"""Training CLI: `python train.py fit --config configs/<config>.yaml`.

Parses the same Lightning-style YAML schema as the reference train.py
(ref: train.py:8-12 + LightningCLI), but drives the TPU-native trainer.
"""

import argparse
import sys

import yaml


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)
    fit = sub.add_parser("fit", help="train a model from a YAML config")
    fit.add_argument("--config", required=True)
    fit.add_argument("--out-dir", default=None,
                     help="output directory (default: from config logger save_dir)")
    fit.add_argument("--max-batches", type=int, default=None,
                     help="stop after N batches (for smoke runs)")
    fit.add_argument("--seed", type=int, default=None)
    fit.add_argument("--resume", default=None, metavar="ORBAX_DIR",
                     help="resume a full train state (optimizers + step "
                          "counter) from an orbax checkpoint — the Lightning "
                          "crash-resume equivalent")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        config = yaml.safe_load(f)

    from wavtokenizer_tpu.train.trainer import (Trainer, resume_from_yaml,
                                                surgical_train_state,
                                                train_config_from_yaml)
    from wavtokenizer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    spec, tcfg, train_data, val_data = train_config_from_yaml(config)
    if train_data is None:
        print("config has no data.init_args.train_params", file=sys.stderr)
        return 2

    out_dir = args.out_dir
    if out_dir is None:
        out_dir = (config.get("trainer", {}).get("logger", {})
                   .get("init_args", {}).get("save_dir", "runs/default"))
    seed = args.seed if args.seed is not None else int(
        config.get("seed_everything", 3407))

    trainer = Trainer(spec, tcfg, train_data, val_data, out_dir=out_dir,
                      seed=seed)

    # YAML surgical resume (ref: decoder/experiment.py:398-445 honors the
    # config's resume/resume_config/resume_model keys): per-submodule reload
    # of a torch Lightning checkpoint, fresh optimizers.
    state = None
    resume_config, resume_model = resume_from_yaml(config)
    if resume_model and not args.resume:
        import torch
        sd = torch.load(resume_model, map_location="cpu", weights_only=False)
        sd = sd.get("state_dict", sd)
        sd = {k: v.numpy() if hasattr(v, "numpy") else v
              for k, v in sd.items()}
        surg_spec = spec
        if resume_config:
            with open(resume_config) as f:
                from wavtokenizer_tpu.api.config import spec_from_config_dict
                surg_spec = spec_from_config_dict(yaml.safe_load(f))
        state = surgical_train_state(surg_spec, tcfg, sd, seed=seed)

    trainer.fit(max_batches=args.max_batches, state=state,
                resume_path=args.resume)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
