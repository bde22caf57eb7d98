"""Fused encoder-front Pallas kernel: value parity with the plain path.

The kernel (ops/encoder_front.py) is a measured DEAD END on v5e (slower
than XLA's HIGH conv path — see its module docstring) and ships default
OFF, but it stays correct and opt-in (WT_ENCODER_FRONT=1), so these tests
pin, on the CPU mesh in interpreter mode:

* fused front == plain layers 0-6 at the HIGH pin (single- and
  multi-block, including both spliced edges),
* the full seanet_encode dispatch path (env opt-in) gives identical
  discrete codes after VQ,
* the geometry gate rejects what the kernel cannot serve,
* the straddling right-edge splice (last block holding < 8 valid rows)
  stays value-correct.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from wavtokenizer_tpu import WavTokenizerSpec
from wavtokenizer_tpu.models.init import init_wavtokenizer
from wavtokenizer_tpu.models.quantize import vq_infer
from wavtokenizer_tpu.models.seanet import (SEANetConfig, _plain_front,
                                            encoder_layer_specs,
                                            seanet_encode)
from wavtokenizer_tpu.ops import encoder_front as ef


@pytest.fixture(scope="module")
def small320():
    spec = WavTokenizerSpec()
    params = init_wavtokenizer(spec, random_codebook=True)
    return spec, params, encoder_layer_specs(spec.seanet)


def _audio(B, T, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.normal(size=(B, T)).astype(np.float32) * 0.1)[:, :, None]


@pytest.mark.parametrize("T,block_n", [
    (2048, 256),    # single block
    (6144, 256),    # 3 blocks: interior halos + both edges
    (6144, 512),    # partial last block (T8 % N = 256)
])
def test_front_matches_plain(small320, T, block_n):
    spec, params, specs = small320
    audio = _audio(2, T)
    assert ef.front_geometry_matches(specs, params["encoder"], T)
    ref = np.asarray(_plain_front(params["encoder"], specs, audio))
    got = np.asarray(ef.encoder_front_fused(
        params["encoder"], specs, audio, block_n=block_n, interpret=True,
        edge_fn=_plain_front))
    assert got.shape == ref.shape == (2, T // 8, 128)
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)
    # The spliced edge frames are the plain path's values EXACTLY.
    np.testing.assert_array_equal(got[:, :ef._EDGE], ref[:, :ef._EDGE])
    np.testing.assert_array_equal(got[:, -ef._EDGE:], ref[:, -ef._EDGE:])


def test_front_block_shrink_fallback(small320):
    """T8 % N < 8 makes the right-edge splice straddle the last block
    boundary (split across two pl.when writes) — values unaffected."""
    spec, params, specs = small320
    T = 8224                      # T8 = 1028; 1028 % 512 = 4 < _EDGE
    audio = _audio(1, T, seed=3)
    ref = np.asarray(_plain_front(params["encoder"], specs, audio))
    got = np.asarray(ef.encoder_front_fused(
        params["encoder"], specs, audio, block_n=512, interpret=True,
        edge_fn=_plain_front))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)


def test_dispatch_and_codes(small320, monkeypatch):
    """WT_ENCODER_FRONT=1 routes seanet_encode through the kernel; the
    discrete codes after VQ must match the plain path exactly."""
    spec, params, specs = small320
    audio = _audio(2, 12000, seed=1)

    monkeypatch.setenv("WT_ENCODER_FRONT", "1")
    ef.use_encoder_front.cache_clear()
    try:
        e_fused = np.asarray(
            seanet_encode(params["encoder"], spec.seanet, audio))
    finally:
        monkeypatch.setenv("WT_ENCODER_FRONT", "0")
        ef.use_encoder_front.cache_clear()
    e_plain = np.asarray(seanet_encode(params["encoder"], spec.seanet, audio))
    # Full-encoder divergence is summation-order noise only.
    np.testing.assert_allclose(e_fused, e_plain, rtol=0, atol=1e-5)
    _, c_f, _ = vq_infer(params["quantizer"], spec.vq, jnp.asarray(e_fused))
    _, c_p, _ = vq_infer(params["quantizer"], spec.vq, jnp.asarray(e_plain))
    np.testing.assert_array_equal(np.asarray(c_f), np.asarray(c_p))
    ef.use_encoder_front.cache_clear()


def test_geometry_gate(small320):
    spec, params, specs = small320
    enc = params["encoder"]
    assert ef.front_geometry_matches(specs, enc, 72000)
    # length conditions
    assert not ef.front_geometry_matches(specs, enc, 72004)   # % 8 != 0
    assert not ef.front_geometry_matches(specs, enc, 512)     # too short
    # small600 geometry (ratios (6,5,5,4) -> strides 4,5 up front)
    cfg600 = SEANetConfig(ratios=(6, 5, 5, 4))
    specs600 = encoder_layer_specs(cfg600)
    params600 = init_wavtokenizer(
        WavTokenizerSpec(seanet=cfg600), random_codebook=True)["encoder"]
    assert not ef.front_geometry_matches(specs600, params600, 72000)
    # causal variant
    cfgc = SEANetConfig(causal=True)
    specsc = encoder_layer_specs(cfgc)
    paramsc = init_wavtokenizer(
        WavTokenizerSpec(seanet=cfgc), random_codebook=True)["encoder"]
    assert not ef.front_geometry_matches(specsc, paramsc, 72000)


def test_default_off():
    """The kernel is a measured dead end: it must NOT engage by default."""
    old = os.environ.pop("WT_ENCODER_FRONT", None)
    ef.use_encoder_front.cache_clear()
    try:
        assert ef.use_encoder_front() is False
    finally:
        if old is not None:
            os.environ["WT_ENCODER_FRONT"] = old
        ef.use_encoder_front.cache_clear()
