"""Sharded inference over the virtual 8-device CPU mesh.

The training path is exercised by __graft_entry__.dryrun_multichip; these
tests cover the inference shardings: dp (batch over 'data') and tp
(ConvNeXt MLP weights over 'model') must produce the same numbers as the
unsharded single-device run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, VQConfig,
                              VocosBackboneConfig, WavTokenizerSpec)
from wavtokenizer_tpu.models import wavtokenizer as wt
from wavtokenizer_tpu.models.init import init_wavtokenizer
from wavtokenizer_tpu.parallel.mesh import (make_mesh, replicate, shard_batch,
                                            shard_generator_params)

TINY = WavTokenizerSpec(
    seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)),
    vq=VQConfig(dimension=16, bins=32),
    backbone=VocosBackboneConfig(input_channels=16, dim=32,
                                 intermediate_dim=64, num_layers=2,
                                 adanorm_num_embeddings=4),
    head=ISTFTHeadConfig(dim=32, n_fft=1280, hop_length=320),
)

needs_8dev = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup(rng):
    params = init_wavtokenizer(TINY, seed=0, random_codebook=True)
    audio = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 24000)).astype(np.float32) * 0.1)
    ref_codes, ref_wav = jax.jit(_roundtrip)(params, audio)
    return params, audio, np.asarray(ref_codes), np.asarray(ref_wav)


def _roundtrip(params, audio):
    feats, codes = wt.encode_infer(params, TINY, audio)
    return codes, wt.decode(params, TINY, feats, 0)


@needs_8dev
def test_dp_sharded_inference_matches(setup):
    params, audio, ref_codes, ref_wav = setup
    mesh = make_mesh(8, model_parallel=1)
    p = replicate(mesh, params)
    a = shard_batch(mesh, audio)
    codes, wav = jax.jit(_roundtrip)(p, a)
    np.testing.assert_array_equal(np.asarray(codes), ref_codes)
    np.testing.assert_allclose(np.asarray(wav), ref_wav, atol=1e-5)


@needs_8dev
def test_tp_sharded_decode_matches(setup):
    params, audio, ref_codes, ref_wav = setup
    mesh = make_mesh(8, model_parallel=4)
    p = shard_generator_params(mesh, replicate(mesh, params))
    a = shard_batch(mesh, audio)
    codes, wav = jax.jit(_roundtrip)(p, a)
    np.testing.assert_array_equal(np.asarray(codes), ref_codes)
    # tp changes the MLP reduction order -> float tolerance, not bit-exact
    np.testing.assert_allclose(np.asarray(wav), ref_wav, atol=1e-4)
    # the MLP weights really are sharded over 'model'
    w = p["backbone"]["convnext"][0]["pwconv1"]["weight"]
    assert len(w.sharding.device_set) == 8 or not w.sharding.is_fully_replicated


@needs_8dev
def test_sharded_bulk_extraction(setup):
    """BASELINE config #5 path: dp-sharded raw feature extraction."""
    from wavtokenizer_tpu.models.seanet import seanet_encode
    params, audio, _, _ = setup
    mesh = make_mesh(8)
    p = replicate(mesh, params)
    a = shard_batch(mesh, audio)
    fn = jax.jit(lambda p, a: seanet_encode(p["encoder"], TINY.seanet,
                                            a[:, :, None]))
    ref = fn(params, audio)
    out = fn(p, a)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
