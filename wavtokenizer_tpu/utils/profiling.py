"""Profiling & tracing utilities.

The reference's observability is logging-only (SURVEY.md §5); its closest
artifacts are GradNormCallback and ad-hoc GPU monitors (try3.py:876-934).
Here profiling is a first-class subsystem:

* ``stage_timings`` — robust per-stage wall timing on TPU.  Through the
  remote (axon) runtime ``block_until_ready`` is unreliable and fetching
  large outputs pollutes timings, so every stage is reduced to a scalar
  inside jit and a tiny host fetch is the completion barrier; the minimum
  over repeats removes queueing noise.
* ``xla_trace`` — context manager around ``jax.profiler.trace`` producing a
  TensorBoard-loadable XLA trace.
* ``pipeline_stages`` — the canonical encode/decode stage map of the
  flagship model, used by tools_tpu/profile.py and perf work.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np


def stage_timings(stages: dict[str, tuple[Callable, tuple]], iters: int = 20,
                  repeats: int = 3) -> dict[str, float]:
    """Time each ``name -> (fn, args)`` stage; returns milliseconds.

    Each fn is jit-wrapped with a jnp.sum reduction so the device-to-host
    fetch (the only reliable barrier over remote runtimes) is O(1).
    """
    import jax
    import jax.numpy as jnp

    out = {}
    for name, (fn, args) in stages.items():
        f = jax.jit(lambda *a, _fn=fn: _reduce_to_scalar(_fn(*a)))
        np.asarray(f(*args))  # compile + settle
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            r = None
            for _ in range(iters):
                r = f(*args)
            np.asarray(r)
            best = min(best, (time.perf_counter() - t0) / iters)
        out[name] = best * 1e3
    return out


# Peak dense-matmul throughput per chip, bf16 (the TPU roofline; f32 convs
# lower through the same MXU).  Keyed by jax device_kind.
PEAK_FLOPS = {
    "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v4": 275e12, "TPU v4 lite": 137e12,
    "TPU v3": 123e12, "TPU v6 lite": 918e12, "TPU v6e": 918e12,
}


def device_peak_flops() -> float | None:
    import jax
    return PEAK_FLOPS.get(jax.devices()[0].device_kind)


def stage_flops(stages: dict[str, tuple[Callable, tuple]]) -> dict[str, float]:
    """XLA cost-analysis FLOPs per stage (0.0 when the backend reports
    none, e.g. XLA:CPU).  Combine with stage_timings for per-stage MFU:
    the roofline attribution that picks the next kernel to optimize
    (VERDICT r2 Next #10)."""
    import jax

    out = {}
    for name, (fn, args) in stages.items():
        try:
            compiled = jax.jit(fn).lower(*args).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            out[name] = flops if np.isfinite(flops) and flops > 0 else 0.0
        except Exception:
            out[name] = 0.0
    return out


def _reduce_to_scalar(tree):
    import jax
    import jax.numpy as jnp
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    acc = 0.0
    for l in leaves:
        acc = acc + jnp.sum(jnp.asarray(l, jnp.float32))
    return acc


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def pipeline_stages(params, spec, audio) -> dict:
    """Stage map for the flagship encode->VQ->decode pipeline."""
    import jax.numpy as jnp

    from ..models import wavtokenizer as wt
    from ..models.quantize import vq_infer
    from ..models.seanet import seanet_encode
    from ..models.vocos import istft_head, vocos_backbone

    emb_fn = lambda p, a: seanet_encode(p["encoder"], spec.seanet, a[:, :, None])
    emb = None  # filled lazily below via jit in stage_timings caller

    def full_encode(p, a):
        return wt.encode_infer(p, spec, a)

    def full_decode(p, f):
        return wt.decode(p, spec, f, 0)

    def roundtrip(p, a):
        f, c = wt.encode_infer(p, spec, a)
        return wt.decode(p, spec, f, 0)

    import jax
    emb = jax.jit(emb_fn)(params, audio)
    feats = jnp.swapaxes(jax.jit(
        lambda p, e: vq_infer(p["quantizer"], spec.vq, e)[0])(params, emb), 1, 2)
    hidden = jax.jit(lambda p, f: vocos_backbone(
        p["backbone"], spec.backbone, jnp.swapaxes(f, 1, 2),
        bandwidth_id=0))(params, feats)

    return {
        "encoder": (emb_fn, (params, audio)),
        "vq": (lambda p, e: vq_infer(p["quantizer"], spec.vq, e)[1],
               (params, emb)),
        "backbone": (lambda p, f: vocos_backbone(
            p["backbone"], spec.backbone, jnp.swapaxes(f, 1, 2),
            bandwidth_id=0), (params, feats)),
        "head": (lambda p, h: istft_head(p["head"], spec.head, h),
                 (params, hidden)),
        "encode_total": (full_encode, (params, audio)),
        "decode_total": (full_decode, (params, feats)),
        "roundtrip": (roundtrip, (params, audio)),
    }
