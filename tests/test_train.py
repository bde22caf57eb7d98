"""Training-component parity tests: discriminators, losses, VQ-EMA, schedule."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_utils as R

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")


def _to_jax_disc_params(sd, prefix_convs, n_convs, prefix_post, emb_key=None):
    """Build our (v,g,bias) conv2d dicts from a torch discriminator state_dict.
    torch conv2d weight (O, I, Kh, Kw) -> our v (Kh, Kw, I, O); g (O,1,1)->(1,1,1,O)."""
    def conv(p):
        v = sd[f"{p}.weight_v"].transpose(2, 3, 1, 0)
        g = sd[f"{p}.weight_g"].reshape(1, 1, 1, -1)
        return {"v": jnp.asarray(v), "g": jnp.asarray(g),
                "bias": jnp.asarray(sd[f"{p}.bias"])}
    out = {"convs": [conv(f"{prefix_convs}.{i}") for i in range(n_convs)],
           "conv_post": conv(prefix_post)}
    if emb_key and f"{emb_key}.weight" in sd:
        out["emb"] = jnp.asarray(sd[f"{emb_key}.weight"])
    return out


@needs_ref
@pytest.mark.parametrize("period", [2, 3, 5])
def test_discriminator_p_parity(period):
    import torch
    from decoder.discriminators import DiscriminatorP

    R.seed_all(20)
    m = DiscriminatorP(period=period, num_embeddings=4)
    m.eval()
    x = torch.randn(2, 3000)
    bw = torch.tensor(1)
    with torch.no_grad():
        logits_ref, fmap_ref = m(x, cond_embedding_id=bw)

    from wavtokenizer_tpu.train.discriminators import discriminator_p
    sd = R.state_dict_numpy(m)
    params = _to_jax_disc_params(sd, "convs", 5, "conv_post", "emb")
    logits, fmap = discriminator_p(params, period, jnp.asarray(x.numpy()), 1)
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(),
                               atol=1e-4, rtol=1e-3)
    assert len(fmap) == len(fmap_ref)
    # fmaps are NHWC vs torch NCHW
    for f, fr in zip(fmap, fmap_ref):
        np.testing.assert_allclose(np.asarray(f).transpose(0, 3, 1, 2),
                                   fr.numpy(), atol=1e-4, rtol=1e-3)


@needs_ref
@pytest.mark.parametrize("resolution", [(1024, 256, 1024), (512, 128, 512)])
def test_discriminator_r_parity(resolution):
    import torch
    from decoder.discriminators import DiscriminatorR

    R.seed_all(21)
    m = DiscriminatorR(resolution=resolution, num_embeddings=4)
    m.eval()
    x = torch.randn(2, 6000)
    bw = torch.tensor(2)
    with torch.no_grad():
        logits_ref, fmap_ref = m(x, cond_embedding_id=bw)

    from wavtokenizer_tpu.train.discriminators import discriminator_r
    sd = R.state_dict_numpy(m)
    params = _to_jax_disc_params(sd, "convs", 5, "conv_post", "emb")
    logits, fmap = discriminator_r(params, resolution, jnp.asarray(x.numpy()), 2)
    np.testing.assert_allclose(np.asarray(logits), logits_ref.numpy(),
                               atol=1e-3, rtol=1e-2)
    assert len(fmap) == len(fmap_ref)


@needs_ref
def test_dac_discriminator_parity():
    import torch
    from decoder.discriminator_dac import DACDiscriminator

    R.seed_all(22)
    m = DACDiscriminator()
    m.eval()
    x = torch.randn(2, 1, 4000)
    with torch.no_grad():
        fmaps_ref = m(x)

    from wavtokenizer_tpu.train.discriminators import (DAC_FFT_SIZES,
                                                       DAC_PERIODS,
                                                       dac_discriminator)
    sd = R.state_dict_numpy(m)

    def conv(p):
        v = sd[f"{p}.weight_v"].transpose(2, 3, 1, 0)
        g = sd[f"{p}.weight_g"].reshape(1, 1, 1, -1)
        return {"v": jnp.asarray(v), "g": jnp.asarray(g),
                "bias": jnp.asarray(sd[f"{p}.bias"])}

    params = {"dac_mpd": [], "dac_mrd": []}
    for i in range(len(DAC_PERIODS)):
        p = f"discriminators.{i}"
        params["dac_mpd"].append(
            {"convs": [conv(f"{p}.convs.{j}.0") for j in range(5)],
             "conv_post": conv(f"{p}.conv_post")})
    for i in range(len(DAC_FFT_SIZES)):
        p = f"discriminators.{len(DAC_PERIODS) + i}"
        bands = [[conv(f"{p}.band_convs.{b}.{j}.0") for j in range(5)]
                 for b in range(5)]
        params["dac_mrd"].append({"bands": bands,
                                  "conv_post": conv(f"{p}.conv_post")})

    fmaps = dac_discriminator(params, jnp.asarray(x.numpy()[:, 0, :]))
    assert len(fmaps) == len(fmaps_ref)
    for fm, fm_ref in zip(fmaps, fmaps_ref):
        assert len(fm) == len(fm_ref)
        # compare the discriminator outputs (last fmap entry, used in losses)
        ours = np.asarray(fm[-1]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ours, fm_ref[-1].numpy(), atol=2e-3,
                                   rtol=1e-2)


@needs_ref
def test_mel_loss_parity():
    """Our mel loss vs the reference MelSpecReconstructionLoss recomputed
    with torch.stft (torchaudio absent -> rebuild its MelSpectrogram via
    torch.stft + our filterbank, validated against torch exactly)."""
    import torch

    R.seed_all(23)
    y = torch.randn(2, 24000)
    y_hat = torch.randn(2, 24000)

    # torch-side mel: stft(center, reflect), |.|, htk mel fb, safe_log L1
    from wavtokenizer_tpu.ops.spectral import mel_filterbank
    win = torch.hann_window(1024)
    def torch_mel(x):
        s = torch.stft(x, 1024, 256, window=win, center=True,
                       pad_mode="reflect", return_complex=True, onesided=True)
        mag = s.abs()
        fb = torch.from_numpy(mel_filterbank(24000, 1024, 100))
        return torch.matmul(fb.t(), mag)
    ref = torch.nn.functional.l1_loss(
        torch.log(torch.clip(torch_mel(y), min=1e-7)),
        torch.log(torch.clip(torch_mel(y_hat), min=1e-7)))

    from wavtokenizer_tpu.train.losses import mel_loss
    ours = mel_loss(jnp.asarray(y_hat.numpy()), jnp.asarray(y.numpy()))
    np.testing.assert_allclose(float(ours), float(ref), atol=1e-4)


@needs_ref
def test_lr_schedule_matches_transformers():
    import torch
    import transformers

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=2e-4)
    sched = transformers.get_cosine_schedule_with_warmup(
        opt, num_warmup_steps=100, num_training_steps=1000)
    ref = []
    for _ in range(1000):
        ref.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()

    from wavtokenizer_tpu.train.step import cosine_schedule_with_warmup
    ours = cosine_schedule_with_warmup(2e-4, 100, 1000)
    got = [float(ours(i)) for i in range(1000)]
    np.testing.assert_allclose(got, ref, atol=1e-9)


def test_vq_train_forward_behavior():
    """k-means init fires once; EMA moves the codebook; straight-through
    passes gradients; commit loss is nonnegative."""
    from wavtokenizer_tpu.models.quantize import VQConfig
    from wavtokenizer_tpu.models.init import init_quantizer
    from wavtokenizer_tpu.train.vq_train import vq_train_forward

    cfg = VQConfig(dimension=8, bins=16, kmeans_iters=4)
    params = {k: jnp.asarray(v) for k, v in init_quantizer(np.random.default_rng(0), cfg).items()}
    assert float(params["inited"][0, 0]) == 0.0
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 50, 8)).astype(np.float32))

    q, codes, commit, new_params = vq_train_forward(params, cfg, x,
                                                    jax.random.PRNGKey(0))
    assert float(new_params["inited"][0, 0]) == 1.0
    assert codes.shape == (1, 2, 50)
    assert float(commit) >= 0.0
    # straight-through: grad wrt x of sum(quantized) should be ones
    g = jax.grad(lambda x: jnp.sum(vq_train_forward(params, cfg, x,
                                                    jax.random.PRNGKey(0))[0]))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), atol=1e-6)
    # second call with inited params: EMA moves embed
    q2, _, _, p2 = vq_train_forward(new_params, cfg, x, jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(p2["embed"]), np.asarray(new_params["embed"]))


def test_weight_norm_fold_roundtrip():
    from wavtokenizer_tpu.train.wnorm import fold_tree, weight_norm_conv
    rng = np.random.default_rng(0)
    kernel = rng.normal(size=(7, 4, 8)).astype(np.float32)
    p = weight_norm_conv({"kernel": kernel, "bias": np.zeros(8, np.float32)})
    folded = fold_tree({"c": p})["c"]
    np.testing.assert_allclose(np.asarray(folded["kernel"]), kernel, atol=1e-5)


def test_train_checkpoint_to_inference_roundtrip(tmp_path):
    """Trainer orbax checkpoint -> from_train_checkpoint-style assembly:
    save/load roundtrip preserves the state and the assembled inference
    params run the full pipeline."""
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, VQConfig,
                                  VocosBackboneConfig, WavTokenizerSpec)
    from wavtokenizer_tpu.models import wavtokenizer as wt
    from wavtokenizer_tpu.train.step import (TrainConfig, create_train_state,
                                             state_to_inference_params)
    from wavtokenizer_tpu.train.trainer import load_checkpoint, save_checkpoint

    spec = WavTokenizerSpec(
        seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)),
        vq=VQConfig(dimension=16, bins=32),
        backbone=VocosBackboneConfig(input_channels=16, dim=32,
                                     intermediate_dim=64, num_layers=1,
                                     adanorm_num_embeddings=4),
        head=ISTFTHeadConfig(dim=32, n_fft=1280, hop_length=320),
    )
    state = create_train_state(spec, TrainConfig(), seed=0)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, jax.device_get(state))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    params = state_to_inference_params(restored, spec)
    audio = jnp.asarray(np.random.default_rng(0)
                        .normal(size=(1, 24000)).astype(np.float32) * 0.1)
    feats, codes = wt.encode_infer(params, spec, audio)
    wav = wt.decode(params, spec, feats, 0)
    assert codes.shape == (1, 1, 75) and wav.shape == (1, 24000)
    assert np.isfinite(np.asarray(wav)).all()


@needs_ref
def test_msstft_discriminator_parity():
    """Our MS-STFT discriminator vs the reference MultiScaleSTFTDiscriminator
    (encoder/msstftd.py; Spectrogram rebuilt in the torchaudio stub)."""
    import torch
    from encoder.msstftd import MultiScaleSTFTDiscriminator

    R.seed_all(31)
    m = MultiScaleSTFTDiscriminator(filters=32)
    m.eval()
    x = torch.randn(2, 1, 24000)
    with torch.no_grad():
        logits_ref, fmaps_ref = m(x)

    from wavtokenizer_tpu.train.discriminators import (MSSTFT_SCALES,
                                                       msstft_discriminator)
    sd = R.state_dict_numpy(m)

    def conv_wn(p):
        v = sd[f"{p}.weight_v"].transpose(2, 3, 1, 0)
        g = sd[f"{p}.weight_g"].reshape(1, 1, 1, -1)
        return {"v": jnp.asarray(v), "g": jnp.asarray(g),
                "bias": jnp.asarray(sd[f"{p}.bias"])}

    params = []
    for s in range(len(MSSTFT_SCALES)):
        p = f"discriminators.{s}"
        # first conv is plain (no weight_norm — ref msstftd.py:69-71)
        convs = [{"kernel": jnp.asarray(
                      sd[f"{p}.convs.0.conv.weight"].transpose(2, 3, 1, 0)),
                  "bias": jnp.asarray(sd[f"{p}.convs.0.conv.bias"])}]
        convs += [conv_wn(f"{p}.convs.{i}.conv") for i in range(1, 5)]
        params.append({"convs": convs, "conv_post": conv_wn(f"{p}.conv_post.conv")})

    logits, fmaps = msstft_discriminator(params, jnp.asarray(x.numpy()[:, 0, :]))
    assert len(logits) == len(logits_ref) == 3
    for ours, ref, fm, fm_ref in zip(logits, logits_ref, fmaps, fmaps_ref):
        np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2),
                                   ref.numpy(), atol=2e-4, rtol=1e-3)
        assert len(fm) == len(fm_ref) == 5
        for f, fr in zip(fm, fm_ref):
            np.testing.assert_allclose(np.asarray(f).transpose(0, 3, 1, 2),
                                       fr.numpy(), atol=2e-4, rtol=1e-3)


def test_msstft_init_smoke():
    from wavtokenizer_tpu.train.discriminators import (
        init_msstft_discriminator, msstft_discriminator)
    params = init_msstft_discriminator(seed=3)
    logits, fmaps = msstft_discriminator(params, jnp.zeros((1, 8192)))
    assert len(logits) == 3 and all(l.shape[-1] == 1 for l in logits)
    assert all(len(f) == 5 for f in fmaps)


def test_remat_and_dropout_training_invariants():
    """Rematerialization must not change training numerics (jax.checkpoint
    is mathematically a no-op), and pos-net dropout must be keyed
    deterministically and vanish at rate 0."""
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, VQConfig,
                                  VocosBackboneConfig, WavTokenizerSpec)
    from wavtokenizer_tpu.train.step import (TrainConfig, create_train_state,
                                             train_step)

    spec = WavTokenizerSpec(
        seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)),
        vq=VQConfig(dimension=16, bins=32),
        backbone=VocosBackboneConfig(input_channels=16, dim=32,
                                     intermediate_dim=64, num_layers=1,
                                     adanorm_num_embeddings=4),
        head=ISTFTHeadConfig(dim=32, n_fft=1280, hop_length=320),
    )
    audio = jnp.asarray(np.random.default_rng(1)
                        .normal(size=(2, 24000)).astype(np.float32) * 0.1)
    key = jax.random.PRNGKey(7)

    def run(tcfg):
        state = create_train_state(spec, tcfg, seed=0)
        _, metrics = train_step(state, audio, key, spec, tcfg)
        return {k: float(v) for k, v in metrics.items()}

    base = run(TrainConfig(remat=True, pos_dropout=0.0))

    # remat off == remat on (bitwise-identical program semantics; allow
    # tiny reassociation slack from differing fusion decisions)
    no_remat = run(TrainConfig(remat=False, pos_dropout=0.0))
    for k in base:
        np.testing.assert_allclose(no_remat[k], base[k], rtol=2e-4,
                                   atol=1e-5, err_msg=k)

    # dropout changes the losses but is deterministic in the key
    drop1 = run(TrainConfig(remat=True, pos_dropout=0.5))
    drop2 = run(TrainConfig(remat=True, pos_dropout=0.5))
    assert drop1 == drop2
    assert any(abs(drop1[k] - base[k]) > 1e-6 for k in base)


def test_fused_losses_match_list_level_primitives():
    """The scalar-output fused per-sub-discriminator losses (the remat
    granularity train_step uses) must equal the list-level primitive
    formulas exactly, with and without jax.checkpoint."""
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu.train.discriminators import (
        init_discriminators, multi_period_discriminator,
        multi_resolution_discriminator)
    from wavtokenizer_tpu.train.losses import (
        dac_disc_loss_fused, dac_discriminator_loss, dac_gen_loss_fused,
        dac_generator_loss, feature_matching_loss, hinge_discriminator_loss,
        hinge_generator_loss, vocos_disc_loss_fused, vocos_gen_loss_fused)

    rng = np.random.default_rng(0)
    disc = jax.tree.map(jnp.asarray, init_discriminators(seed=3))
    y = jnp.asarray(rng.normal(size=(2, 9600)).astype(np.float32) * 0.1)
    y_hat = jnp.asarray(rng.normal(size=(2, 9600)).astype(np.float32) * 0.1)
    bw = jnp.asarray(1)

    # list-level ground truth
    r_mp, g_mp, fr_mp, fg_mp = multi_period_discriminator(disc["mpd"], y,
                                                          y_hat, bw)
    r_mrd, g_mrd, fr_mrd, fg_mrd = multi_resolution_discriminator(
        disc["mrd"], y, y_hat, bw)
    want = {
        "disc_mp": hinge_discriminator_loss(r_mp, g_mp) / len(r_mp),
        "disc_mrd": hinge_discriminator_loss(r_mrd, g_mrd) / len(r_mrd),
        "gen_mp": hinge_generator_loss(g_mp) / len(g_mp),
        "gen_mrd": hinge_generator_loss(g_mrd) / len(g_mrd),
        "fm_mp": feature_matching_loss(fr_mp, fg_mp) / len(fr_mp),
        "fm_mrd": feature_matching_loss(fr_mrd, fg_mrd) / len(fr_mrd),
        "dac_disc": dac_discriminator_loss(disc, y_hat, y),
    }
    want["dac_gen"], want["dac_feat"] = dac_generator_loss(disc, y_hat, y)

    for remat in (False, True):
        got = {
            "disc_mp": vocos_disc_loss_fused(disc["mpd"], "mpd", y, y_hat,
                                             bw, remat=remat),
            "disc_mrd": vocos_disc_loss_fused(disc["mrd"], "mrd", y, y_hat,
                                              bw, remat=remat),
            "dac_disc": dac_disc_loss_fused(disc, y_hat, y, remat=remat),
        }
        got["gen_mp"], got["fm_mp"] = vocos_gen_loss_fused(
            disc["mpd"], "mpd", y, y_hat, bw, remat=remat)
        got["gen_mrd"], got["fm_mrd"] = vocos_gen_loss_fused(
            disc["mrd"], "mrd", y, y_hat, bw, remat=remat)
        got["dac_gen"], got["dac_feat"] = dac_gen_loss_fused(disc, y_hat, y,
                                                             remat=remat)
        for k in want:
            np.testing.assert_allclose(float(got[k]), float(want[k]),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"{k} remat={remat}")
