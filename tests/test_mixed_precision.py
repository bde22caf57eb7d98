"""Mixed-precision (bf16) discriminator compute path.

TrainConfig.disc_compute_dtype="bfloat16" runs the three discriminator
families' conv stacks in bf16 (≈80% of the GAN step's FLOPs; f32 matmuls
run at half the bf16 MXU rate on TPU) while master params, loss
reductions, and grads stay f32.  These tests pin:

* value parity — every fused loss matches its f32 value closely (the
  stacks are shallow; bf16 rounding stays small),
* gradient direction — bf16 grads point the same way as f32 grads,
* dtype hygiene — losses and grads come back f32 regardless of the
  compute dtype (master-weight contract).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavtokenizer_tpu.train.discriminators import init_discriminators
from wavtokenizer_tpu.train.losses import (dac_disc_loss_fused,
                                           dac_gen_loss_fused,
                                           vocos_disc_loss_fused,
                                           vocos_gen_loss_fused)

B, T = 2, 8192


@pytest.fixture(scope="module")
def disc():
    return jax.tree.map(jnp.asarray,
                        init_discriminators(seed=7, channels_scale=0.125))


@pytest.fixture(scope="module")
def audio():
    r = np.random.default_rng(0)
    y = jnp.asarray(r.normal(size=(B, T)).astype(np.float32) * 0.1)
    y_hat = jnp.asarray(r.normal(size=(B, T)).astype(np.float32) * 0.1)
    return y, y_hat


def _flat(tree):
    return jnp.concatenate([jnp.ravel(l) for l in jax.tree.leaves(tree)])


def _cos(a, b):
    a, b = _flat(a), _flat(b)
    return float(jnp.vdot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))


@pytest.mark.parametrize("family", ["mpd", "mrd"])
def test_vocos_disc_loss_bf16_matches_f32(disc, audio, family):
    y, y_hat = audio

    def loss(p, dt):
        return vocos_disc_loss_fused(p, family, y, y_hat, bandwidth_id=1,
                                     compute_dtype=dt)

    f32 = jax.jit(lambda p: loss(p, None))(disc[family])
    bf16 = jax.jit(lambda p: loss(p, jnp.bfloat16))(disc[family])
    assert f32.dtype == jnp.float32 and bf16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32),
                               rtol=0.03, atol=0.02)


@pytest.mark.parametrize("family", ["mpd", "mrd"])
def test_vocos_gen_loss_bf16_matches_f32(disc, audio, family):
    y, y_hat = audio

    def loss(p, dt):
        lg, lfm = vocos_gen_loss_fused(p, family, y, y_hat, bandwidth_id=0,
                                       compute_dtype=dt)
        return lg, lfm

    lg32, lfm32 = jax.jit(lambda p: loss(p, None))(disc[family])
    lg16, lfm16 = jax.jit(lambda p: loss(p, jnp.bfloat16))(disc[family])
    np.testing.assert_allclose(np.asarray(lg16), np.asarray(lg32),
                               rtol=0.03, atol=0.02)
    np.testing.assert_allclose(np.asarray(lfm16), np.asarray(lfm32),
                               rtol=0.05, atol=0.02)


def test_dac_losses_bf16_match_f32(disc, audio):
    y, y_hat = audio

    d32 = jax.jit(lambda p: dac_disc_loss_fused(p, y_hat, y))(disc)
    d16 = jax.jit(lambda p: dac_disc_loss_fused(
        p, y_hat, y, compute_dtype=jnp.bfloat16))(disc)
    np.testing.assert_allclose(np.asarray(d16), np.asarray(d32),
                               rtol=0.03, atol=0.05)

    g32 = jax.jit(lambda p: dac_gen_loss_fused(p, y_hat, y))(disc)
    g16 = jax.jit(lambda p: dac_gen_loss_fused(
        p, y_hat, y, compute_dtype=jnp.bfloat16))(disc)
    for a, b in zip(g16, g32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.05, atol=0.05)


def test_bf16_grads_point_the_same_way(disc, audio):
    """Grad direction through the bf16 stacks tracks f32 (master-weight
    mixed precision: the cast transposes back to f32 grads)."""
    y, y_hat = audio

    def total(p, dt):
        l = dac_disc_loss_fused(p, y_hat, y, compute_dtype=dt)
        l = l + vocos_disc_loss_fused(p["mpd"], "mpd", y, y_hat, 1,
                                      compute_dtype=dt)
        l = l + vocos_disc_loss_fused(p["mrd"], "mrd", y, y_hat, 1,
                                      compute_dtype=dt)
        return l

    g32 = jax.jit(jax.grad(lambda p: total(p, None)))(disc)
    g16 = jax.jit(jax.grad(lambda p: total(p, jnp.bfloat16)))(disc)
    for l32, l16 in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        assert l16.dtype == jnp.float32
    # Hinge/LS losses gate grads on activation-boundary comparisons
    # (maximum(1-r, 0), leaky-relu kinks); bf16 rounding flips a few
    # boundary units, so exact agreement is impossible by construction.
    # Measured 0.960 at these shapes (1/8-width, random audio) — assert a
    # margin below that; a real precision bug (e.g. bf16 loss reductions)
    # drops the cosine far further.
    assert _cos(g32, g16) > 0.9


def test_train_step_accepts_disc_compute_dtype():
    """The TrainConfig knob reaches the jitted step (tiny widths, 2 steps:
    bf16 produces finite losses and f32 state)."""
    from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, VQConfig,
                                  VocosBackboneConfig, WavTokenizerSpec)
    from wavtokenizer_tpu.train.step import (TrainConfig, create_train_state,
                                             train_step)

    spec = WavTokenizerSpec(
        seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)),
        vq=VQConfig(dimension=16, bins=32, kmeans_iters=2),
        backbone=VocosBackboneConfig(input_channels=16, dim=32,
                                     intermediate_dim=64, num_layers=1,
                                     adanorm_num_embeddings=4),
        head=ISTFTHeadConfig(dim=32, n_fft=1280, hop_length=320),
    )
    tcfg = TrainConfig(max_steps=10, disc_channels_scale=0.0625,
                       disc_compute_dtype="bfloat16")
    state = create_train_state(spec, tcfg, seed=0)
    r = np.random.default_rng(1)
    audio = jnp.asarray(
        r.normal(size=(2, spec.seanet.hop_length * 16)).astype(np.float32)
        * 0.1)
    key = jax.random.PRNGKey(0)
    for i in range(2):
        state, metrics = train_step(state, audio, jax.random.fold_in(key, i),
                                    spec, tcfg)
    for name in ("disc_total", "gen_total", "mel_loss"):
        v = np.asarray(metrics[name])
        assert np.isfinite(v), (name, v)
    for leaf in jax.tree.leaves(state["gen"]):
        assert leaf.dtype == jnp.float32


def test_train_step_accepts_gen_compute_dtype():
    """TrainConfig.gen_compute_dtype="bfloat16" runs the backbone+head in
    bf16 inside the jitted step: finite losses, f32 master state, and the
    mel loss stays close to the f32 step's (the encoder/VQ path is never
    cast, so the drift comes only from the decode side)."""
    from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, VQConfig,
                                  VocosBackboneConfig, WavTokenizerSpec)
    from wavtokenizer_tpu.train.step import (TrainConfig, create_train_state,
                                             train_step)

    spec = WavTokenizerSpec(
        seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)),
        vq=VQConfig(dimension=16, bins=32, kmeans_iters=2),
        backbone=VocosBackboneConfig(input_channels=16, dim=32,
                                     intermediate_dim=64, num_layers=1,
                                     adanorm_num_embeddings=4),
        head=ISTFTHeadConfig(dim=32, n_fft=1280, hop_length=320),
    )
    r = np.random.default_rng(1)
    audio = jnp.asarray(
        r.normal(size=(2, spec.seanet.hop_length * 16)).astype(np.float32)
        * 0.1)
    key = jax.random.PRNGKey(0)

    def run(gen_dtype):
        tcfg = TrainConfig(max_steps=10, disc_channels_scale=0.0625,
                           pos_dropout=0.0, gen_compute_dtype=gen_dtype)
        state = create_train_state(spec, tcfg, seed=0)
        for i in range(2):
            state, metrics = train_step(state, audio,
                                        jax.random.fold_in(key, i),
                                        spec, tcfg)
        return state, metrics

    state16, m16 = run("bfloat16")
    state32, m32 = run("float32")
    for name in ("disc_total", "gen_total", "mel_loss"):
        assert np.isfinite(np.asarray(m16[name])), name
    for leaf in jax.tree.leaves(state16["gen"]):
        assert leaf.dtype == jnp.float32
    # Decode-side bf16 rounding only: mel loss tracks the f32 step.
    np.testing.assert_allclose(np.asarray(m16["mel_loss"]),
                               np.asarray(m32["mel_loss"]),
                               rtol=0.05, atol=0.05)


def test_remat_disc_off_matches_default():
    """TrainConfig.remat_disc=False (store discriminator activations
    instead of the per-scalar remat recompute — the r5 train-attribution
    lever, +31% measured f32 at batch 40) is semantically a no-op: one
    full train_step must produce the same metrics and state to f32
    scheduling tolerance."""
    from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, VQConfig,
                                  VocosBackboneConfig, WavTokenizerSpec)
    from wavtokenizer_tpu.train.step import (TrainConfig, create_train_state,
                                             train_step)

    spec = WavTokenizerSpec(
        seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)),
        vq=VQConfig(dimension=16, bins=32, kmeans_iters=2),
        backbone=VocosBackboneConfig(input_channels=16, dim=32,
                                     intermediate_dim=64, num_layers=1,
                                     adanorm_num_embeddings=4),
        head=ISTFTHeadConfig(dim=32, n_fft=1280, hop_length=320),
    )
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(2, 3840)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(0)

    outs = {}
    for remat_disc in (True, False, "store_dac"):
        tcfg = TrainConfig(max_steps=100, disc_channels_scale=1 / 16,
                           remat_disc=remat_disc, pos_dropout=0.0)
        state = create_train_state(spec, tcfg, seed=0)
        new_state, metrics = train_step(state, audio, key, spec, tcfg,
                                        jnp.asarray(45.0))
        outs[remat_disc] = (jax.device_get(new_state), jax.device_get(metrics))

    (st_a, m_a) = outs[True]
    for variant in (False, "store_dac"):
        st_b, m_b = outs[variant]
        for k in m_a:
            np.testing.assert_allclose(m_a[k], m_b[k], rtol=2e-4, atol=2e-4,
                                       err_msg=f"{variant}:{k}")
        for la, lb in zip(jax.tree_util.tree_leaves(st_a),
                          jax.tree_util.tree_leaves(st_b)):
            # AdamW's m/(sqrt(v)+eps) is ill-conditioned for the near-zero
            # grads of step 1, so identical math can yield updates differing
            # by up to the lr under f32 reassociation; bound the DISTANCE by
            # one update (2e-4) instead of demanding elementwise closeness.
            np.testing.assert_allclose(la, lb, rtol=0, atol=5e-4)
