"""End-to-end parity: full-size model, reference facade vs ours.

Builds the real small-320 architecture (512-dim SEANet, 4096x512 codebook,
768-dim backbone) with random weights, runs the torch reference pipeline and
the TPU-native pipeline on the same audio, and checks: bit-exact codes,
waveform tolerance, codes_to_features equivalence, and YAML config parsing
of the unchanged reference configs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import ref_utils as R

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")

FE_INIT = dict(encodec_model="encodec_24khz", bandwidths=[6.6, 6.6, 6.6, 6.6],
               train_codebooks=True, num_quantizers=1,
               dowmsamples=[8, 5, 4, 2], vq_bins=4096, vq_kmeans=200)
BB_INIT = dict(input_channels=512, dim=768, intermediate_dim=2304,
               num_layers=12, adanorm_num_embeddings=4)
HEAD_INIT = dict(dim=768, n_fft=1280, hop_length=320, padding="same")

CONFIG_DICT = {
    "model": {"init_args": {
        "sample_rate": 24000,
        "feature_extractor": {
            "class_path": "decoder.feature_extractors.EncodecFeatures",
            "init_args": FE_INIT},
        "backbone": {"class_path": "decoder.models.VocosBackbone",
                     "init_args": BB_INIT},
        "head": {"class_path": "decoder.heads.ISTFTHead",
                 "init_args": HEAD_INIT},
    }}
}


@pytest.fixture(scope="module")
def ref_model():
    import torch
    from decoder.pretrained import WavTokenizer as RefWavTokenizer

    fe = R.build_ref_encodec_features(FE_INIT, seed=42)
    bb = R.build_ref_backbone(**BB_INIT)
    hd = R.build_ref_istft_head(**HEAD_INIT)
    m = RefWavTokenizer(feature_extractor=fe, backbone=bb, head=hd)
    m.eval()
    return m


@pytest.fixture(scope="module")
def our_model(ref_model):
    from wavtokenizer_tpu import WavTokenizer, spec_from_config_dict
    spec = spec_from_config_dict(CONFIG_DICT)
    sd = R.state_dict_numpy(ref_model)
    return WavTokenizer.from_state_dict(sd, spec)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(7)
    # 0.4 s of "audio": tonal + noise, batch of 2
    t = np.arange(9600) / 24000.0
    a = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.normal(size=9600)
    b = 0.3 * np.sin(2 * np.pi * 555 * t) + 0.05 * rng.normal(size=9600)
    return np.stack([a, b]).astype(np.float32)


@needs_ref
def test_encode_infer_codes_bitexact(ref_model, our_model, audio):
    import torch
    bw = torch.tensor(0)
    with torch.no_grad():
        feats_ref, codes_ref = ref_model.encode_infer(torch.from_numpy(audio),
                                                      bandwidth_id=bw)
    feats, codes = our_model.encode_infer(audio, bandwidth_id=0)
    assert codes.shape == tuple(codes_ref.shape)
    match = (np.asarray(codes) == codes_ref.numpy()).mean()
    assert match == 1.0, f"token match {match:.4f} != 1.0"
    np.testing.assert_allclose(np.asarray(feats), feats_ref.numpy(),
                               atol=1e-4, rtol=1e-3)


@needs_ref
def test_decode_waveform_tolerance(ref_model, our_model, audio):
    import torch
    bw = torch.tensor(0)
    with torch.no_grad():
        feats_ref, _ = ref_model.encode_infer(torch.from_numpy(audio),
                                              bandwidth_id=bw)
        wav_ref = ref_model.decode(feats_ref, bandwidth_id=bw).numpy()
    wav = our_model.decode(feats_ref.numpy(), bandwidth_id=0)
    assert wav.shape == wav_ref.shape
    err = np.abs(np.asarray(wav) - wav_ref).max()
    scale = np.abs(wav_ref).max()
    assert err / scale < 2e-3, f"relative waveform error {err/scale:.2e}"


@needs_ref
def test_codes_to_features_parity(ref_model, our_model, audio):
    import torch
    bw = torch.tensor(0)
    with torch.no_grad():
        _, codes_ref = ref_model.encode_infer(torch.from_numpy(audio),
                                              bandwidth_id=bw)
        feats_ref = ref_model.codes_to_features(codes_ref).numpy()
    feats = our_model.codes_to_features(codes_ref.numpy())
    np.testing.assert_allclose(np.asarray(feats), feats_ref, atol=1e-5,
                               rtol=1e-4)


@needs_ref
def test_full_roundtrip_copy_synthesis(ref_model, our_model, audio):
    import torch
    bw = torch.tensor(0)
    with torch.no_grad():
        wav_ref = ref_model(torch.from_numpy(audio), bandwidth_id=bw).numpy()
    wav = our_model(audio, bandwidth_id=0)
    err = np.abs(np.asarray(wav) - wav_ref).max()
    scale = np.abs(wav_ref).max()
    assert err / scale < 2e-3, f"relative waveform error {err/scale:.2e}"


def test_parse_reference_configs():
    """The unchanged reference YAMLs must parse into specs."""
    import glob
    import os
    from wavtokenizer_tpu import spec_from_config
    cfgs = sorted(glob.glob("/root/reference/configs/*.yaml"))
    if not cfgs:
        pytest.skip("reference configs not available")
    parsed = 0
    for c in cfgs:
        name = os.path.basename(c)
        spec = spec_from_config(c)
        parsed += 1
        if "frame75" in name:
            assert spec.hop_length == 320
            assert spec.head.hop_length in (320,)
        if "frame40" in name:
            assert spec.hop_length == 600
        assert spec.vq.bins in (4096, 16384)
    assert parsed >= 2
