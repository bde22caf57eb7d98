#!/usr/bin/env python
"""(Re)generate tests/golden/bench_tokens.npz on XLA:CPU.

The committed golden token ids are the on-chip bit-exactness gate for
bench.py (utils/golden.py).  They are generated on CPU because that is the
backend where torch parity is independently proven (tests/test_api.py) —
the chip must then match the CPU, closing TPU-vs-CPU.

Only rerun this when the model/config definitions legitimately change, and
re-verify torch parity first (tests/test_api.py) — regenerating to paper
over a codes mismatch defeats the gate.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wavtokenizer_tpu.utils.golden import write_golden  # noqa: E402


if __name__ == "__main__":
    path = write_golden(sys.argv[1] if len(sys.argv) > 1 else None)
    print(f"wrote {path}")
