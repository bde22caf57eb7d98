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


@needs_8dev
def test_tp_shards_optimizer_moments():
    """shard_train_state must place the AdamW moments of the TP ConvNeXt
    MLP weights over 'model' — not just the params — so tensor parallelism
    actually saves optimizer memory (r1 weak #6: 'left to jit propagation'
    kept them replicated)."""
    from wavtokenizer_tpu.parallel.mesh import shard_train_state
    from wavtokenizer_tpu.train.step import TrainConfig, create_train_state

    mesh = make_mesh(8, model_parallel=2)
    state = create_train_state(TINY, TrainConfig(), seed=0)
    state = shard_train_state(mesh, state)

    def pwconv1_sharding(tree):
        return tree["backbone"]["convnext"][0]["pwconv1"]["weight"].sharding

    # params sharded over 'model'
    p_sh = pwconv1_sharding(state["gen"])
    assert isinstance(p_sh, NamedSharding)
    assert p_sh.spec == P(None, "model"), p_sh.spec
    # find the AdamW moment subtrees inside opt_gen and assert the same
    import jax.tree_util as jtu
    gen_struct = jtu.tree_structure(state["gen"])
    moments = []

    def walk(node):
        try:
            if jtu.tree_structure(node) == gen_struct:
                moments.append(node)
                return
        except Exception:
            pass
        if isinstance(node, tuple):
            for c in node:
                walk(c)
        elif isinstance(node, list):
            for c in node:
                walk(c)
        elif isinstance(node, dict):
            for c in node.values():
                walk(c)

    walk(state["opt_gen"])
    assert len(moments) >= 2, "expected AdamW mu and nu mirroring gen"
    for m in moments:
        m_sh = pwconv1_sharding(m)
        assert m_sh.spec == P(None, "model"), m_sh.spec
        assert not m_sh.is_fully_replicated
    # discriminator state stays replicated
    d_leaf = jax.tree.leaves(state["disc"])[0]
    assert d_leaf.sharding.is_fully_replicated


@needs_8dev
def test_tp_train_step_matches_dp():
    """One full GAN train step on a 4(data)x2(model) mesh produces the same
    losses (and equivalently updated params) as pure 8-way DP — TP is an
    implementation detail of layout, not semantics."""
    from wavtokenizer_tpu.parallel.mesh import shard_train_state
    from wavtokenizer_tpu.train.step import (TrainConfig, create_train_state,
                                             train_step)

    tcfg = TrainConfig()
    audio = jnp.asarray(
        np.random.default_rng(3).normal(size=(8, 3200)).astype(np.float32)
        * 0.3)
    key = jax.random.PRNGKey(0)

    results = {}
    for name, mp in (("dp", 1), ("tp", 2)):
        mesh = make_mesh(8, model_parallel=mp)
        state = shard_train_state(mesh, create_train_state(TINY, tcfg, seed=0))
        a = shard_batch(mesh, audio)
        new_state, metrics = train_step(state, a, key, TINY, tcfg)
        results[name] = (new_state, {k: float(v) for k, v in metrics.items()})

    m_dp, m_tp = results["dp"][1], results["tp"][1]
    for k in m_dp:
        np.testing.assert_allclose(m_tp[k], m_dp[k], rtol=2e-3, atol=1e-4,
                                   err_msg=k)
    w_dp = np.asarray(results["dp"][0]["gen"]["backbone"]["convnext"][0]
                      ["pwconv1"]["weight"])
    w_tp = np.asarray(results["tp"][0]["gen"]["backbone"]["convnext"][0]
                      ["pwconv1"]["weight"])
    np.testing.assert_allclose(w_tp, w_dp, atol=5e-5)
