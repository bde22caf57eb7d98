"""Driver-contract regression tests for __graft_entry__.py.

Round-1 lesson (VERDICT.md Weak #1): the driver does
``import __graft_entry__; __graft_entry__.dryrun_multichip(8)`` from a
process whose jax backend is already latched to ONE device — a path no
test exercised, so a red ``MULTICHIP_r01.json`` slipped past a green
suite.  This test reproduces that exact calling convention in a
subprocess: latch a 1-device backend first, then import-and-call, and
require the self-bootstrapping re-exec to produce a green dryrun.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_driver_style():
    env = dict(os.environ)
    # Mimic the driver: a backend latched with ONE device before the call.
    # (CPU instead of axon so the test never touches the real chip; the
    # bootstrap logic only sees "1 device < 8" either way.)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", "")).strip()
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "assert len(jax.devices()) == 1, jax.devices();"
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-u", "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=3600)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "dryrun_multichip ok" in proc.stdout
