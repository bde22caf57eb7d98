#!/usr/bin/env python
"""Warm the persistent XLA compilation cache in SHORT-LIVED processes.

The full test suite runs cache-readonly (tests/conftest.py): XLA:CPU's
native ``executable.serialize()`` segfaults in long-lived processes
(~150 tests into a one-process run — utils/cache.py guard 4), while the
same programs serialize fine from fresh processes.  After changing
compile-relevant code (train/step.py, models/, ops/, parallel/), run this
to re-populate ``.jax_cache`` so the next full-suite run stays fast:

    python tools_tpu/warm_cache.py            # heavy files, one proc each
    python tools_tpu/warm_cache.py tests/test_train.py   # just one file

Each test file runs in its own pytest subprocess with cache writes forced
on (WT_JAX_CACHE_READONLY=0 beats the conftest readonly default); a
subprocess failure is reported but doesn't stop the remaining files.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The suite's heavy in-process compiles, heaviest first: full-width
# discriminator train steps (test_train), the 8-device fit loops
# (test_trainer_fit, test_resume), TP/DP train steps (test_parallel).
HEAVY_FILES = (
    "tests/test_train.py",
    "tests/test_trainer_fit.py",
    "tests/test_resume.py",
    "tests/test_parallel.py",
    "tests/test_graft_entry.py",
    "tests/test_mixed_precision.py",
)


def main(argv: list[str]) -> int:
    files = argv or list(HEAVY_FILES)
    env = dict(os.environ)
    env["WT_JAX_CACHE_READONLY"] = "0"
    rc = 0
    for f in files:
        t0 = time.perf_counter()
        print(f"[warm_cache] {f} ...", flush=True)
        proc = subprocess.run(
            [sys.executable, "-u", "-m", "pytest", f, "-q"], cwd=REPO, env=env)
        wall = time.perf_counter() - t0
        status = "ok" if proc.returncode == 0 else f"FAILED rc={proc.returncode}"
        print(f"[warm_cache] {f}: {status} ({wall:.0f}s)", flush=True)
        rc = rc or proc.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
