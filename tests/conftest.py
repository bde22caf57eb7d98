"""Test configuration: force CPU with 8 virtual devices (sharding tests run on
a fake mesh; TPU bench runs live outside pytest via bench.py)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA:CPU's in-process collectives SIGABRT (rendezvous.cc) when device
# threads skew past the default 20 s/40 s stuck-detection timeouts — routine
# when 8 virtual devices timeshare this box's ONE core (e.g. the trainer
# mesh tests).  Match __graft_entry__.py and effectively disable them.
if "collective_call_warn_stuck" not in xla_flags:
    xla_flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=3600"
                  " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
                  " --xla_cpu_collective_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = xla_flags

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already latched, so the env var alone is not enough —
# override through the config API before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

from wavtokenizer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
