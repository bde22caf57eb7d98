#!/usr/bin/env python
"""Build training filelists: source_list.txt + speaker_pairs.txt.

Behavioral contract: reference tools/prepare_data_lists.py:3-40 — scan a
source dir for .wav files, emit one path per line, and pair each noisy
("LDV") recording with its clean counterpart by filename substitution,
warning (not failing) on missing targets.  Generalized: the noisy->clean
name mapping is a CLI flag instead of a hard-coded string pair.

Usage:
    python tools_tpu/prepare_data_lists.py \
        --source-dir data/train/source --target-dir data/train/target \
        --output-dir data/train [--pattern box_LDV:box_clean]
"""

from __future__ import annotations

import argparse
import os


def generate_file_lists(source_dir: str, target_dir: str, output_dir: str,
                        pattern: str = "box_LDV:box_clean",
                        source_prefix: str | None = None,
                        target_prefix: str | None = None) -> tuple[int, int]:
    """Write source_list.txt and speaker_pairs.txt ("noisy|clean" lines).

    Returns (n_source, n_pairs).
    """
    os.makedirs(output_dir, exist_ok=True)
    src_token, dst_token = pattern.split(":", 1)
    source_prefix = source_prefix if source_prefix is not None else source_dir
    target_prefix = target_prefix if target_prefix is not None else target_dir

    names = sorted(n for n in os.listdir(source_dir) if n.endswith(".wav"))

    with open(os.path.join(output_dir, "source_list.txt"), "w") as f:
        for name in names:
            f.write(os.path.join(source_prefix, name) + "\n")

    n_pairs = 0
    with open(os.path.join(output_dir, "speaker_pairs.txt"), "w") as f:
        for name in names:
            target_name = name.replace(src_token, dst_token)
            if os.path.exists(os.path.join(target_dir, target_name)):
                f.write(os.path.join(source_prefix, name) + "|" +
                        os.path.join(target_prefix, target_name) + "\n")
                n_pairs += 1
            else:
                print(f"Warning: no matching target for {name}")
    return len(names), n_pairs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source-dir", required=True)
    ap.add_argument("--target-dir", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--pattern", default="box_LDV:box_clean",
                    help="noisy:clean filename substitution (src:dst)")
    args = ap.parse_args(argv)
    n_src, n_pairs = generate_file_lists(args.source_dir, args.target_dir,
                                         args.output_dir, args.pattern)
    print(f"{n_src} source files, {n_pairs} pairs")


if __name__ == "__main__":
    main()
