"""Model-level parity tests: tiny-dim reference modules vs our pure functions."""

import numpy as np
import pytest

import jax.numpy as jnp

import ref_utils as R
from wavtokenizer_tpu.checkpoint import convert as C
from wavtokenizer_tpu.models import seanet as S
from wavtokenizer_tpu.models import vocos as V

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")

TINY_SEANET = dict(channels=1, dimension=32, n_filters=4, n_residual_layers=1,
                   ratios=[8, 5, 4, 2], norm="weight_norm", lstm=2,
                   causal=False, pad_mode="reflect", true_skip=False,
                   compress=2, kernel_size=7, residual_kernel_size=3,
                   last_kernel_size=7, dilation_base=2)


def tiny_seanet_cfg():
    return S.SEANetConfig(channels=1, dimension=32, n_filters=4,
                          n_residual_layers=1, ratios=(8, 5, 4, 2),
                          causal=False, pad_mode="reflect", true_skip=False,
                          compress=2, lstm=2)


@needs_ref
def test_seanet_encoder_parity():
    import torch

    R.seed_all(10)
    m = R.build_ref_seanet("encoder", **TINY_SEANET)
    x = torch.randn(2, 1, 7200)
    with torch.no_grad():
        y_ref = m(x).numpy()  # (B, D, T')

    cfg = tiny_seanet_cfg()
    sd = R.state_dict_numpy(m)
    params = C.seanet_params(sd, "", S.encoder_layer_specs(cfg))
    y = S.seanet_encode(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    y = np.asarray(y).transpose(0, 2, 1)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


@needs_ref
def test_seanet_decoder_parity():
    import torch

    R.seed_all(11)
    m = R.build_ref_seanet("decoder", **TINY_SEANET)
    z = torch.randn(2, 32, 23)
    with torch.no_grad():
        y_ref = m(z).numpy()  # (B, 1, T)

    cfg = tiny_seanet_cfg()
    sd = R.state_dict_numpy(m)
    params = C.seanet_params(sd, "", S.decoder_layer_specs(cfg))
    y = S.seanet_decode(params, cfg, jnp.asarray(z.numpy().transpose(0, 2, 1)))
    y = np.asarray(y).transpose(0, 2, 1)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-3)


TINY_BACKBONE = dict(input_channels=32, dim=64, intermediate_dim=192,
                     num_layers=3, adanorm_num_embeddings=4)


@needs_ref
def test_vocos_backbone_parity():
    import torch

    R.seed_all(12)
    m = R.build_ref_backbone(**TINY_BACKBONE)
    x = torch.randn(2, 32, 50)
    bw = torch.tensor(1)
    with torch.no_grad():
        y_ref = m(x, bandwidth_id=bw).numpy()  # (B, T, dim)

    cfg = V.VocosBackboneConfig(input_channels=32, dim=64, intermediate_dim=192,
                                num_layers=3, adanorm_num_embeddings=4)
    sd = R.state_dict_numpy(m)
    params = C.vocos_backbone_params(sd, "", cfg)
    y = V.vocos_backbone(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 1)),
                         bandwidth_id=1)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-3)


@needs_ref
def test_istft_head_parity():
    import torch

    R.seed_all(13)
    m = R.build_ref_istft_head(dim=64, n_fft=1280, hop_length=320, padding="same")
    x = torch.randn(2, 25, 64)
    with torch.no_grad():
        y_ref = m(x).numpy()  # (B, L)

    cfg = V.ISTFTHeadConfig(dim=64, n_fft=1280, hop_length=320, padding="same")
    sd = R.state_dict_numpy(m)
    params = C.istft_head_params(sd, "")
    y = V.istft_head(params, cfg, jnp.asarray(x.numpy()))
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-4, rtol=1e-3)


@needs_ref
def test_groupnorm_vs_torch():
    import torch

    R.seed_all(14)
    gn = torch.nn.GroupNorm(8, 64, eps=1e-6, affine=True)
    torch.nn.init.normal_(gn.weight)
    torch.nn.init.normal_(gn.bias)
    gn.eval()
    x = torch.randn(2, 64, 37)
    with torch.no_grad():
        y_ref = gn(x).numpy()
    y = V.group_norm(jnp.asarray(x.numpy().transpose(0, 2, 1)),
                     jnp.asarray(gn.weight.detach().numpy()),
                     jnp.asarray(gn.bias.detach().numpy()), 8)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), y_ref,
                               atol=1e-5, rtol=1e-4)
