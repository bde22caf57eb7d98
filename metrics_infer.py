#!/usr/bin/env python
"""Offline evaluation harness over a (ground-truth dir, prediction dir) pair
(ref: metrics/infer.py:17-116): STOI @ native sr, PESQ-wb @16k (when the
pesq package exists), UTMOS (when its checkpoint exists), periodicity /
pitch / voicing-F1 @16k, plus SNR / mel distance / envelope similarity.
"""

import argparse
import json
import os
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--gt-dir", required=True)
    parser.add_argument("--pred-dir", required=True)
    parser.add_argument("--out", default=None, help="write JSON summary here")
    args = parser.parse_args(argv)

    from wavtokenizer_tpu.metrics.objective import (envelope_similarity,
                                                    mel_spectral_distance,
                                                    pesq_wb, snr_db, stoi,
                                                    utmos_score)
    from wavtokenizer_tpu.metrics.periodicity import calculate_periodicity_metrics
    from wavtokenizer_tpu.train.data import read_audio, resample_np

    gt_files = {p.name: p for p in Path(args.gt_dir).rglob("*.wav")}
    pred_files = {p.name: p for p in Path(args.pred_dir).rglob("*.wav")}
    common = sorted(set(gt_files) & set(pred_files))
    if not common:
        print("no matching filenames between dirs")
        return 1

    rows = []
    for name in common:
        ref, sr_r = read_audio(str(gt_files[name]))
        deg, sr_d = read_audio(str(pred_files[name]))
        if ref.ndim > 1:
            ref = ref.mean(axis=-1)
        if deg.ndim > 1:
            deg = deg.mean(axis=-1)
        if sr_d != sr_r:
            deg = resample_np(deg, sr_d, sr_r)
        ref16 = resample_np(ref, sr_r, 16000)
        deg16 = resample_np(deg, sr_r, 16000)
        # exact CREPE semantics when weights are on disk, NAC otherwise
        per_rmse, pitch_rmse, f1 = calculate_periodicity_metrics(
            ref16, deg16, use_crepe=bool(os.environ.get("WT_CREPE_CKPT")))
        u = utmos_score(deg16)
        rows.append({
            "file": name,
            "stoi": stoi(ref, deg, sr_r),
            "pesq_wb": pesq_wb(ref, deg, sr_r),
            "utmos": float(np.mean(u)) if u is not None else None,
            "snr_db": snr_db(ref, deg),
            "mel_dist": mel_spectral_distance(ref, deg, sr_r),
            "env_sim": envelope_similarity(ref, deg),
            "periodicity_rmse": per_rmse,
            "pitch_rmse_cents": pitch_rmse,
            "voiced_f1": f1,
        })

    def agg(key):
        vals = [r[key] for r in rows if r[key] is not None
                and not (isinstance(r[key], float) and np.isnan(r[key]))]
        return float(np.mean(vals)) if vals else None

    summary = {k: agg(k) for k in rows[0] if k != "file"}
    summary["num_files"] = len(rows)
    print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "files": rows}, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
