"""Parity tests for alternative components: ResBlock1, IMDCT heads,
streaming transformer / LM model."""

import numpy as np
import pytest

import jax.numpy as jnp

import ref_utils as R

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")


@needs_ref
def test_resblock1_parity():
    import torch
    from decoder.modules import ResBlock1

    R.seed_all(30)
    m = ResBlock1(dim=16, layer_scale_init_value=0.5)
    m.eval()
    x = torch.randn(2, 16, 50)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from wavtokenizer_tpu.checkpoint.convert import conv1d_params
    from wavtokenizer_tpu.models.alt_components import res_block1
    sd = R.state_dict_numpy(m)
    p = {"convs1": [conv1d_params(sd, f"convs1.{i}") for i in range(3)],
         "convs2": [conv1d_params(sd, f"convs2.{i}") for i in range(3)],
         "gamma": [jnp.asarray(sd[f"gamma.{i}"].reshape(-1)) for i in range(3)]}
    y = res_block1(p, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               atol=1e-5, rtol=1e-4)


@needs_ref
@pytest.mark.parametrize("padding", ["same", "center"])
def test_imdct_parity(padding):
    import torch
    from decoder.spectral_ops import IMDCT, MDCT

    R.seed_all(31)
    frame_len = 64
    im = IMDCT(frame_len=frame_len, padding=padding)
    X = torch.randn(2, 20, 32)
    with torch.no_grad():
        y_ref = im(X).numpy()
    from wavtokenizer_tpu.ops.spectral import imdct, mdct
    y = imdct(jnp.asarray(X.numpy()), frame_len, padding)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-3)

    md = MDCT(frame_len=frame_len, padding=padding)
    audio = torch.randn(2, 640)
    with torch.no_grad():
        s_ref = md(audio).numpy()
    s = mdct(jnp.asarray(audio.numpy()), frame_len, padding)
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=1e-4, rtol=1e-3)


@needs_ref
def test_imdct_symexp_head_parity():
    import torch
    from decoder.heads import IMDCTSymExpHead

    R.seed_all(32)
    m = IMDCTSymExpHead(dim=32, mdct_frame_len=64, padding="same",
                        sample_rate=24000)
    m.eval()
    x = torch.randn(2, 20, 32)
    with torch.no_grad():
        y_ref = m(x).numpy()

    from wavtokenizer_tpu.checkpoint.convert import linear_params
    from wavtokenizer_tpu.models.alt_components import (IMDCTHeadConfig,
                                                        imdct_symexp_head)
    sd = R.state_dict_numpy(m)
    params = {"out": linear_params(sd, "out")}
    cfg = IMDCTHeadConfig(dim=32, mdct_frame_len=64)
    y = imdct_symexp_head(params, cfg, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-3)


@needs_ref
def test_streaming_transformer_parity():
    import torch
    from encoder.modules.transformer import StreamingTransformerEncoder

    R.seed_all(33)
    m = StreamingTransformerEncoder(dim=32, num_heads=4, num_layers=2,
                                    past_context=16, dropout=0.0)
    m.eval()
    x = torch.randn(2, 10, 32)
    with torch.no_grad():
        y_ref, states_ref, off_ref = m(x)
        y2_ref, _, _ = m(torch.randn(0, 0, 0).new_zeros(2, 4, 32) + 0.5,
                         states_ref, off_ref)

    from wavtokenizer_tpu.models.lm import (StreamingTransformerConfig,
                                            streaming_transformer)
    sd = R.state_dict_numpy(m)
    cfg = StreamingTransformerConfig(dim=32, num_heads=4, num_layers=2,
                                     past_context=16)
    layers = []
    for i in range(2):
        p = f"layers.{i}"
        layers.append({
            "in_proj": {"weight": sd[f"{p}.self_attn.in_proj_weight"].T,
                        "bias": sd[f"{p}.self_attn.in_proj_bias"]},
            "out_proj": {"weight": sd[f"{p}.self_attn.out_proj.weight"].T,
                         "bias": sd[f"{p}.self_attn.out_proj.bias"]},
            "ln1": {"weight": sd[f"{p}.norm1.weight"], "bias": sd[f"{p}.norm1.bias"]},
            "ln2": {"weight": sd[f"{p}.norm2.weight"], "bias": sd[f"{p}.norm2.bias"]},
            "ff1": {"weight": sd[f"{p}.linear1.weight"].T, "bias": sd[f"{p}.linear1.bias"]},
            "ff2": {"weight": sd[f"{p}.linear2.weight"].T, "bias": sd[f"{p}.linear2.bias"]},
        })
    params = {"layers": layers,
              "norm_in": {"weight": sd["norm_in.weight"], "bias": sd["norm_in.bias"]}}
    params = jnp.tree_util.tree_map(jnp.asarray, params) if hasattr(jnp, "tree_util") else params
    import jax
    params = jax.tree.map(jnp.asarray, params)

    y, states, off = streaming_transformer(params, cfg, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=1e-3, rtol=1e-2)
    assert off == off_ref
    # streamed continuation
    x2 = np.full((2, 4, 32), 0.5, np.float32)
    y2, _, _ = streaming_transformer(params, cfg, jnp.asarray(x2),
                                     [jnp.asarray(s.numpy()) for s in states_ref],
                                     off)
    np.testing.assert_allclose(np.asarray(y2), y2_ref.numpy(), atol=1e-3,
                               rtol=1e-2)


def test_mel_features_shapes():
    from wavtokenizer_tpu.models.alt_components import MelFeaturesConfig, mel_features
    cfg = MelFeaturesConfig()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 24000)).astype(np.float32))
    mel = mel_features(cfg, x)
    assert mel.shape == (2, 100, 24000 // 256 + 1)
