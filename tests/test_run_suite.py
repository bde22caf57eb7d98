"""run_suite.py summary parsing: pytest -q summary lines with warnings /
xfail segments must not break the counts (v1 regression: '2 warnings'
made whole files parse as 0 tests)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools_tpu"))

from run_suite import _parse_counts  # noqa: E402


def test_plain():
    assert _parse_counts("12 passed in 3.2s")["passed"] == 12


def test_warnings_segment():
    c = _parse_counts("45 passed, 2 warnings in 20.1s")
    assert c == {"passed": 45, "skipped": 0, "failed": 0, "errors": 0}


def test_failed_and_duration_suffix():
    c = _parse_counts("1 failed, 4 passed in 300.27s (0:05:00)")
    assert c["failed"] == 1 and c["passed"] == 4


def test_xfail_ignored():
    c = _parse_counts("3 xfailed, 5 passed in 10s")
    assert c == {"passed": 5, "skipped": 0, "failed": 0, "errors": 0}


def test_errors():
    assert _parse_counts("2 errors in 5.0s")["errors"] == 2


def test_takes_last_summary_line():
    out = "5 passed in 1.0s\nnoise\n7 passed, 1 failed in 2.0s\n"
    c = _parse_counts(out)
    assert c["passed"] == 7 and c["failed"] == 1
