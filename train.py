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
    args = parser.parse_args(argv)

    with open(args.config) as f:
        config = yaml.safe_load(f)

    from wavtokenizer_tpu.train.trainer import Trainer, train_config_from_yaml
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
    trainer.fit(max_batches=args.max_batches)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
