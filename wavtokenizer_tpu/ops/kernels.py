"""Pallas TPU kernels for the hot ops.

Two fused kernels cover the inference roofline (SURVEY.md §2.4 "TPU-native
equivalent to build"):

* ``convnext_block_fused`` — the decoder hot loop (ref: decoder/modules.py:8-60,
  12 blocks per decode).  One VMEM-resident pass per batch row fuses
  depthwise-conv(k=7) -> (Ada)LayerNorm -> Linear -> GELU -> Linear ->
  layer-scale -> residual.  The unfused XLA graph round-trips the
  (B*T, 2304) intermediate and ~6 elementwise tensors through HBM per
  block; fused traffic is read-x + write-out + one 7 MB weight stream.
  Matmuls run bf16 x bf16 -> f32-accumulate on the MXU — numerically the
  same contract as XLA's DEFAULT f32 matmul lowering on TPU.

* ``vq_nearest_fused`` — the tokenizer hot op (ref:
  encoder/quantization/core_vq.py:175-183).  Distance matmul + argmax in
  one kernel: the (B*T, 4096) f32 distance matrix lives only in VMEM,
  never in HBM.  Distances are computed in full f32 (HIGHEST) with the
  exact reference formula so discrete codes stay bit-exact.

Both kernels are shape-specialized under jit (static T/C) and carry an
``interpret=`` flag so the same code paths are unit-tested on the CPU mesh.
Dispatch policy lives in ``use_pallas()``: on by default on TPU backends,
off elsewhere, override with WT_TPU_PALLAS=0/1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.cache
def use_pallas() -> bool:
    """True when the fused kernels should be used (TPU backend, not opted out)."""
    env = os.environ.get("WT_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # backend init failure -> stay on the XLA path
        return False


# ---------------------------------------------------------------------------
# Fused ConvNeXt block
# ---------------------------------------------------------------------------

def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7) — Mosaic has no
    erf/erfc lowering; exp is on the VPU's transcendental menu."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _convnext_kernel(x_ref, dw_ref, dwb_ref, scale_ref, shift_ref,
                     w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, out_ref):
    x = x_ref[0]                                   # (T, C) f32
    T, C = x.shape

    # Depthwise conv k=7, zero-padded (3, 3): seven shifted multiply-adds on
    # the VPU against a zero-padded copy.
    xp = jnp.concatenate(
        [jnp.zeros((3, C), dtype=x.dtype), x, jnp.zeros((3, C), dtype=x.dtype)],
        axis=0)
    h = dwb_ref[:].reshape(1, C) + xp[0:T, :] * dw_ref[0, :].reshape(1, C)
    for k in range(1, 7):
        h = h + xp[k:k + T, :] * dw_ref[k, :].reshape(1, C)

    # (Ada)LayerNorm with pre-resolved scale/shift vectors.
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mean) * (h - mean), axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + 1e-6)
    h = h * scale_ref[:].reshape(1, C) + shift_ref[:].reshape(1, C)

    # MLP: bf16 operands, f32 accumulation (== XLA DEFAULT f32 matmul).
    inter = jax.lax.dot_general(
        h.astype(jnp.bfloat16), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[:].reshape(1, -1)
    # Exact GELU: 0.5 * x * (1 + erf(x / sqrt(2))).
    inter = 0.5 * inter * (1.0 + _erf(inter * (2.0 ** -0.5)))
    y = jax.lax.dot_general(
        inter.astype(jnp.bfloat16), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[:].reshape(1, C)

    out_ref[0] = x + gamma_ref[:].reshape(1, C) * y


def convnext_block_fused(x: jnp.ndarray, dw: jnp.ndarray, dwb: jnp.ndarray,
                         scale: jnp.ndarray, shift: jnp.ndarray,
                         w1: jnp.ndarray, b1: jnp.ndarray,
                         w2: jnp.ndarray, b2: jnp.ndarray,
                         gamma: jnp.ndarray, *,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused ConvNeXt block (ref: decoder/modules.py:8-60).

    x: (B, T, C) f32; dw: (7, C) depthwise taps; scale/shift: resolved
    (Ada)LN affine vectors (C,); w1: (C, I); w2: (I, C); gamma: (C,).
    """
    B, T, C = x.shape
    I = w1.shape[1]
    grid = (B,)
    row = lambda i: (i, 0, 0)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _convnext_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, C), row, memory_space=pltpu.VMEM),
            full(7, C), full(C), full(C), full(C),
            full(C, I), full(I), full(I, C), full(C), full(C),
        ],
        out_specs=pl.BlockSpec((1, T, C), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * C * I * 2, transcendentals=B * T * I,
            bytes_accessed=2 * B * T * C * 4 + 2 * C * I * 2),
        interpret=interpret,
    )(x, dw, dwb, scale, shift,
      w1.astype(jnp.bfloat16), b1, w2.astype(jnp.bfloat16), b2, gamma)


# ---------------------------------------------------------------------------
# Fused VQ nearest-neighbor (distance + argmax)
# ---------------------------------------------------------------------------

def _vq_kernel(x_ref, e_ref, esq_ref, out_ref):
    x = x_ref[:]                                    # (TN, D) f32
    xsq = jnp.sum(x * x, axis=1, keepdims=True)     # (TN, 1)
    xe = jax.lax.dot_general(
        x, e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)        # (TN, C)
    dist = -(xsq - 2.0 * xe + esq_ref[:])           # exact reference formula
    out_ref[:] = jnp.argmax(dist, axis=1, keepdims=True).astype(jnp.int32)


def vq_nearest_fused(x: jnp.ndarray, embed: jnp.ndarray, *,
                     tile_n: int = 256, interpret: bool = False) -> jnp.ndarray:
    """Fused nearest-codebook search (ref: core_vq.py:175-183).

    x: (N, D) f32 vectors; embed: (C, D) codebook.  Returns (N,) int32.
    The (N, C) distance matrix exists only tile-by-tile in VMEM; distances
    use full-f32 MXU passes so codes match the XLA/torch path bit-exactly.
    """
    N, D = x.shape
    C = embed.shape[0]
    n_pad = (-N) % tile_n
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    Np = N + n_pad
    esq = jnp.sum(embed.astype(jnp.float32) ** 2, axis=1)[None, :]  # (1, C)
    idx = pl.pallas_call(
        _vq_kernel,
        grid=(Np // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * C * D, transcendentals=0,
            bytes_accessed=Np * D * 4 + C * D * 4 + Np * 4),
        interpret=interpret,
    )(x.astype(jnp.float32), embed.astype(jnp.float32), esq)
    return idx[:N, 0]
