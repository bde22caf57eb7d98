"""Plain-Vocos family: config parsing, checkpoint conversion, decode parity."""

import numpy as np
import pytest

import jax.numpy as jnp

import ref_utils as R

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")

VOCOS_CONFIG = {
    "model": {"init_args": {
        "feature_extractor": {
            "class_path": "decoder.feature_extractors.MelSpectrogramFeatures",
            "init_args": {"sample_rate": 24000, "n_fft": 1024,
                          "hop_length": 256, "n_mels": 100}},
        "backbone": {"class_path": "decoder.models.VocosBackbone",
                     "init_args": {"input_channels": 100, "dim": 128,
                                   "intermediate_dim": 384, "num_layers": 2}},
        "head": {"class_path": "decoder.heads.ISTFTHead",
                 "init_args": {"dim": 128, "n_fft": 1024, "hop_length": 256}},
    }}
}


def test_vocos_config_parsing():
    from wavtokenizer_tpu.api.config import vocos_spec_from_config_dict
    spec = vocos_spec_from_config_dict(VOCOS_CONFIG)
    assert spec.backbone_kind == "convnext" and spec.head_kind == "istft"
    assert spec.features.n_mels == 100 and spec.backbone.dim == 128
    assert spec.sample_rate == 24000

    cfg2 = {"feature_extractor": VOCOS_CONFIG["model"]["init_args"]["feature_extractor"],
            "backbone": {"class_path": "decoder.models.VocosResNetBackbone",
                         "init_args": {"input_channels": 100, "dim": 64,
                                       "num_blocks": 3}},
            "head": {"class_path": "decoder.heads.IMDCTSymExpHead",
                     "init_args": {"dim": 64, "mdct_frame_len": 512}}}
    spec2 = vocos_spec_from_config_dict(cfg2)
    assert spec2.backbone_kind == "resnet" and spec2.head_kind == "imdct_symexp"
    assert spec2.head.mdct_frame_len == 512


def test_vocos_forward_runs_all_variants(rng):
    from wavtokenizer_tpu.models.alt_components import (
        IMDCTHeadConfig, VocosResNetBackboneConfig)
    from wavtokenizer_tpu.models.init import init_vocos
    from wavtokenizer_tpu.models.vocos_model import VocosSpec, vocos_forward
    from wavtokenizer_tpu.models.vocos import VocosBackboneConfig, ISTFTHeadConfig

    audio = jnp.asarray(rng.normal(size=(2, 12000)).astype(np.float32) * 0.1)
    variants = [
        VocosSpec(backbone_kind="convnext",
                  backbone=VocosBackboneConfig(input_channels=100, dim=64,
                                               intermediate_dim=128,
                                               num_layers=1,
                                               adanorm_num_embeddings=None),
                  head_kind="istft",
                  head=ISTFTHeadConfig(dim=64, n_fft=1024, hop_length=256)),
        VocosSpec(backbone_kind="resnet",
                  backbone=VocosResNetBackboneConfig(input_channels=100, dim=64),
                  head_kind="imdct_cos",
                  head=IMDCTHeadConfig(dim=64, mdct_frame_len=512)),
    ]
    for spec in variants:
        y = vocos_forward(init_vocos(spec), spec, audio)
        assert y.ndim == 2 and y.shape[0] == 2 and np.isfinite(np.asarray(y)).all()


@needs_ref
def test_vocos_resnet_imdct_decode_parity():
    """Converted torch weights -> same decode output (ResNet + IMDCT path)."""
    import torch
    from decoder.heads import IMDCTSymExpHead
    from decoder.models import VocosResNetBackbone

    from wavtokenizer_tpu.api.pretrained import Vocos
    from wavtokenizer_tpu.models.alt_components import (
        IMDCTHeadConfig, VocosResNetBackboneConfig)
    from wavtokenizer_tpu.models.vocos_model import VocosSpec

    R.seed_all(21)
    bb = VocosResNetBackbone(input_channels=100, dim=64, num_blocks=3).eval()
    hd = IMDCTSymExpHead(dim=64, mdct_frame_len=512, padding="same").eval()
    sd = {**{f"backbone.{k}": v for k, v in R.state_dict_numpy(bb).items()},
          **{f"head.{k}": v for k, v in R.state_dict_numpy(hd).items()}}

    spec = VocosSpec(backbone_kind="resnet",
                     backbone=VocosResNetBackboneConfig(input_channels=100, dim=64),
                     head_kind="imdct_symexp",
                     head=IMDCTHeadConfig(dim=64, mdct_frame_len=512))
    model = Vocos.from_state_dict(sd, spec)

    feats = torch.randn(2, 100, 50)
    with torch.no_grad():
        ref = hd(bb(feats)).numpy()
    got = np.asarray(model.decode(jnp.asarray(feats.numpy())))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


@needs_ref
def test_vocos_convnext_istft_decode_parity():
    import torch
    from decoder.heads import ISTFTHead
    from decoder.models import VocosBackbone

    from wavtokenizer_tpu.api.config import vocos_spec_from_config_dict
    from wavtokenizer_tpu.api.pretrained import Vocos

    R.seed_all(22)
    bb = VocosBackbone(input_channels=100, dim=128, intermediate_dim=384,
                       num_layers=2).eval()
    hd = ISTFTHead(dim=128, n_fft=1024, hop_length=256, padding="same").eval()
    sd = {**{f"backbone.{k}": v for k, v in R.state_dict_numpy(bb).items()},
          **{f"head.{k}": v for k, v in R.state_dict_numpy(hd).items()}}

    spec = vocos_spec_from_config_dict(VOCOS_CONFIG)
    model = Vocos.from_state_dict(sd, spec)

    feats = torch.randn(2, 100, 50)
    with torch.no_grad():
        ref = hd(bb(feats)).numpy()
    got = np.asarray(model.decode(jnp.asarray(feats.numpy())))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
