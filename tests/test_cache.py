"""Guards of utils/cache.py (see its module docstring).

Each case runs in a fresh subprocess: cache behavior depends on
process-global jax config and monkeypatches, and the readonly guard exists
precisely because cache writes are only safe in short-lived processes.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Compile one tiny jitted program with the persistent cache at CACHE_DIR.
# min_compile_time is dropped to 0 so even a toy compile is write-eligible.
_COMPILE = """
import os, sys
import jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from wavtokenizer_tpu.utils.cache import enable_compilation_cache
d = enable_compilation_cache(readonly={readonly})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
x = jax.jit(lambda a: jnp.tanh(a) @ a.T)(jnp.ones((64, 64)))
x.block_until_ready()
entries = [n for n in os.listdir(d) if n.endswith("-cache")]
print("ENTRIES", len(entries))
"""


def _run(tmp_path, readonly: str, env_readonly: str | None = None) -> str:
    env = dict(os.environ)
    env["WT_JAX_CACHE_DIR"] = str(tmp_path)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("WT_JAX_CACHE_READONLY", None)
    if env_readonly is not None:
        env["WT_JAX_CACHE_READONLY"] = env_readonly
    proc = subprocess.run(
        [sys.executable, "-c", _COMPILE.format(readonly=readonly)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    return proc.stdout


def _entries(out: str) -> int:
    return int(out.split("ENTRIES")[-1].split()[0])


def test_cache_writes_by_default(tmp_path):
    assert _entries(_run(tmp_path, readonly="False")) >= 1


def test_cache_readonly_skips_writes(tmp_path):
    assert _entries(_run(tmp_path, readonly="True")) == 0


def test_cache_env_var_beats_readonly_param(tmp_path):
    """WT_JAX_CACHE_READONLY=0 must force writes through a readonly=True
    call — this is how tools_tpu/warm_cache.py warms the cache past the
    conftest readonly default."""
    assert _entries(_run(tmp_path, readonly="True", env_readonly="0")) >= 1


def test_corrupt_recent_entry_swept(tmp_path):
    """A truncated/garbage entry newer than the sweep marker is deleted on
    the next enable (guard 3: the r2 judge's SIGSEGV came from
    deserializing a mid-write-killed blob)."""
    code = """
import os
import jax
jax.config.update("jax_platforms", "cpu")
from wavtokenizer_tpu.utils.cache import enable_compilation_cache
d = enable_compilation_cache()
bad = os.path.join(d, "deadbeef-cache")
with open(bad, "wb") as f:
    f.write(b"not a zstd stream at all")
os.utime(d and os.path.join(d, ".last_sweep"), (0, 0))
enable_compilation_cache()
print("SWEPT", not os.path.exists(bad))
"""
    env = dict(os.environ)
    env["WT_JAX_CACHE_DIR"] = str(tmp_path)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "SWEPT True" in proc.stdout, proc.stdout


def test_read_age_gate(tmp_path):
    """Guard 5: in readonly mode, cache reads stop after the hit limit —
    the compile still succeeds (as a miss), the process does not touch the
    native deserialize path again (the r2/r3 aged-process SIGSEGV site)."""
    code = """
import os
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from wavtokenizer_tpu.utils.cache import enable_compilation_cache

# Pass 1 (writes on): compile two programs into the cache.
os.environ["WT_JAX_CACHE_READONLY"] = "0"
enable_compilation_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
f = jax.jit(lambda x: (x @ x).sum() * 2)
g = jax.jit(lambda x: (x @ x).sum() * 3)
x = jnp.ones((64, 64), jnp.float32)
print("p1", float(f(x)), float(g(x)))
"""
    code2 = """
import os
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax._src import compilation_cache as _cc
from wavtokenizer_tpu.utils.cache import enable_compilation_cache

# Pass 2 (readonly, limit 1): first program is served from cache (1 hit),
# the second read is GATED (miss -> fresh in-process compile, no write).
os.environ["WT_JAX_CACHE_READONLY"] = "1"
os.environ["WT_JAX_CACHE_READ_LIMIT"] = "1"
enable_compilation_cache(readonly=True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
f = jax.jit(lambda x: (x @ x).sum() * 2)
g = jax.jit(lambda x: (x @ x).sum() * 3)
x = jnp.ones((64, 64), jnp.float32)
v1, v2 = float(f(x)), float(g(x))
st = _cc._wt_read_gate_state
print("GATE", st["n"], st["limit"], v1, v2)
assert st["n"] == st["limit"] == 1, st
"""
    env = dict(os.environ)
    env["WT_JAX_CACHE_DIR"] = str(tmp_path)
    env["JAX_PLATFORMS"] = "cpu"
    # min-compile-time gate: make sure our tiny programs are cached at all
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
    for c in (code, code2):
        proc = subprocess.run([sys.executable, "-c", c], cwd=REPO, env=env,
                              capture_output=True, text=True, timeout=300)
        assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "GATE 1 1 524288.0 786432.0" in proc.stdout, proc.stdout
