"""Golden-token plumbing: the committed bench_tokens.npz must match a fresh
XLA:CPU recompute for every config (utils/golden.py; VERDICT r3 missing #2).

This pins (a) the golden file is in sync with the model code, (b) the CPU
side of the TPU-vs-CPU bit-exactness gate that bench.py asserts on the real
chip, and (c) the loud-failure path on corruption.
"""

import numpy as np
import pytest

from wavtokenizer_tpu.utils import golden


def test_golden_file_matches_cpu_recompute():
    stored = golden.load_golden()
    specs = golden.golden_specs()
    assert set(stored) == set(specs)
    for label in specs:
        # CPU contract: bit-identical, zero flips allowed.
        assert golden.check_codes(label) == 0, label
        assert stored[label].dtype == np.int32
        assert stored[label].shape[0] == 1  # n_q=1 infer path
        assert stored[label].shape[1] == golden.GOLDEN_BATCH


def test_golden_mismatch_raises(tmp_path):
    stored = golden.load_golden()
    bad = dict(stored)
    bad["small320"] = stored["small320"].copy()
    bad["small320"][0, 0, 0] += 1
    p = tmp_path / "bad_tokens.npz"
    np.savez(p, **bad)
    with pytest.raises(RuntimeError, match="GOLDEN TOKEN MISMATCH"):
        golden.check_codes("small320", str(p))


def test_golden_missing_key_raises(tmp_path):
    p = tmp_path / "empty_tokens.npz"
    np.savez(p, nothing=np.zeros(1, np.int32))
    with pytest.raises(KeyError, match="no golden tokens"):
        golden.check_codes("small320", str(p))
