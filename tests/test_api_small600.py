"""Parity for the 40 tok/s config family (WavTokenizer-small-600-24k-4096).

test_api.py pins the 75 tok/s (hop 320) architecture; this pins the second
shipped family — ratios (6,5,5,4) -> hop 600, ISTFT n_fft 2400/hop 600
(ref configs/wavtokenizer_smalldata_frame40_3s_nq1_code4096_dim512_
kmeans200_attn.yaml:46,62-64) — bit-exact codes and waveform tolerance
against the torch reference on the same random weights."""

import numpy as np
import pytest

import ref_utils as R

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")

FE_INIT = dict(encodec_model="encodec_24khz", bandwidths=[6.6, 6.6, 6.6, 6.6],
               train_codebooks=True, num_quantizers=1,
               dowmsamples=[6, 5, 5, 4], vq_bins=4096, vq_kmeans=200)
BB_INIT = dict(input_channels=512, dim=768, intermediate_dim=2304,
               num_layers=12, adanorm_num_embeddings=4)
HEAD_INIT = dict(dim=768, n_fft=2400, hop_length=600, padding="same")


@pytest.fixture(scope="module")
def pair():
    import torch
    from decoder.pretrained import WavTokenizer as RefWavTokenizer

    from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, WavTokenizer,
                                  WavTokenizerSpec)

    fe = R.build_ref_encodec_features(FE_INIT, seed=11)
    bb = R.build_ref_backbone(**BB_INIT)
    hd = R.build_ref_istft_head(**HEAD_INIT)
    ref = RefWavTokenizer(feature_extractor=fe, backbone=bb, head=hd)
    ref.eval()

    spec = WavTokenizerSpec(seanet=SEANetConfig(ratios=(6, 5, 5, 4)),
                            head=ISTFTHeadConfig(n_fft=2400, hop_length=600))
    ours = WavTokenizer.from_state_dict(R.state_dict_numpy(ref), spec)
    return ref, ours


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(17)
    t = np.arange(9000) / 24000.0  # 0.375 s -> 15 frames at hop 600
    a = 0.5 * np.sin(2 * np.pi * 196 * t) + 0.1 * rng.normal(size=len(t))
    return a.astype(np.float32)[None]


@needs_ref
def test_small600_codes_bitexact(pair, audio):
    import torch
    ref, ours = pair
    assert ours.spec.seanet.hop_length == 600
    with torch.no_grad():
        feats_ref, codes_ref = ref.encode_infer(torch.from_numpy(audio),
                                                bandwidth_id=torch.tensor(0))
    feats, codes = ours.encode_infer(audio, bandwidth_id=0)
    assert codes.shape == tuple(codes_ref.shape)
    match = (np.asarray(codes) == codes_ref.numpy()).mean()
    assert match == 1.0, f"token match {match:.4f} != 1.0"
    np.testing.assert_allclose(np.asarray(feats), feats_ref.numpy(),
                               atol=1e-4, rtol=1e-3)


@needs_ref
def test_small600_decode_waveform_tolerance(pair, audio):
    import torch
    ref, ours = pair
    with torch.no_grad():
        feats_ref, _ = ref.encode_infer(torch.from_numpy(audio),
                                        bandwidth_id=torch.tensor(0))
        wav_ref = ref.decode(feats_ref, bandwidth_id=torch.tensor(0)).numpy()
    wav = ours.decode(feats_ref.numpy(), bandwidth_id=0)
    assert wav.shape == wav_ref.shape
    err = np.abs(np.asarray(wav) - wav_ref).max()
    scale = np.abs(wav_ref).max()
    assert err / scale < 2e-3, f"relative waveform error {err/scale:.2e}"
