"""Pallas kernel parity tests (interpret mode on the CPU mesh).

The fused kernels must match the XLA reference paths they replace:
* vq_nearest_fused == nearest_codebook_indices (bit-exact int codes),
* convnext_block_fused == convnext_block within bf16-matmul tolerance,
* istft matmul method == fft method to float tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wavtokenizer_tpu.models.vocos import convnext_block
from wavtokenizer_tpu.ops.kernels import convnext_block_fused, vq_nearest_fused
from wavtokenizer_tpu.ops.spectral import istft_same
from wavtokenizer_tpu.ops.vq import nearest_codebook_indices


def test_vq_nearest_fused_bitexact(rng):
    x = jnp.asarray(rng.normal(size=(1000, 64)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(256, 64)).astype(np.float32))
    ref = np.asarray(nearest_codebook_indices(x, emb, fused=False))
    got = np.asarray(vq_nearest_fused(x, emb, interpret=True))
    assert got.shape == ref.shape and got.dtype == np.int32
    np.testing.assert_array_equal(got, ref)


def test_vq_nearest_fused_unaligned_n(rng):
    # N not a multiple of the tile: padding rows must not leak into output.
    x = jnp.asarray(rng.normal(size=(77, 32)).astype(np.float32))
    emb = jnp.asarray(rng.normal(size=(128, 32)).astype(np.float32))
    ref = np.asarray(nearest_codebook_indices(x, emb, fused=False))
    got = np.asarray(vq_nearest_fused(x, emb, tile_n=64, interpret=True))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("adanorm", [False, True])
def test_convnext_block_fused_parity(rng, adanorm):
    B, T, C, I = 3, 100, 128, 384
    f32 = lambda *s, scale=0.1: jnp.asarray(
        rng.normal(size=s).astype(np.float32) * scale)
    p = {
        "dwconv": {"kernel": f32(7, 1, C), "bias": f32(C)},
        "pwconv1": {"weight": f32(C, I, scale=0.05), "bias": f32(I)},
        "pwconv2": {"weight": f32(I, C, scale=0.05), "bias": f32(C)},
        "gamma": f32(C, scale=0.3),
    }
    if adanorm:
        p["adanorm"] = {"scale": 1.0 + f32(4, C), "shift": f32(4, C)}
        scale, shift = p["adanorm"]["scale"][1], p["adanorm"]["shift"][1]
        cond = 1
    else:
        p["norm"] = {"weight": 1.0 + f32(C), "bias": f32(C)}
        scale, shift = p["norm"]["weight"], p["norm"]["bias"]
        cond = None
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    ref = convnext_block(p, x, cond_id=cond, fused=False)
    got = convnext_block_fused(
        x, p["dwconv"]["kernel"][:, 0, :], p["dwconv"]["bias"], scale, shift,
        p["pwconv1"]["weight"], p["pwconv1"]["bias"],
        p["pwconv2"]["weight"], p["pwconv2"]["bias"], p["gamma"],
        interpret=True)
    rel = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    assert rel < 2e-2, rel  # bf16 matmul operands


@pytest.mark.parametrize("n_fft,hop", [(1280, 320), (2400, 600)])
def test_istft_matmul_matches_fft(rng, n_fft, hop):
    T, N = 50, n_fft // 2 + 1
    sr = jnp.asarray(rng.normal(size=(2, T, N)).astype(np.float32))
    si = jnp.asarray(rng.normal(size=(2, T, N)).astype(np.float32))
    a = istft_same(sr, si, n_fft, hop, method="fft")
    b = istft_same(sr, si, n_fft, hop, method="matmul")
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    assert rel < 5e-6, rel
