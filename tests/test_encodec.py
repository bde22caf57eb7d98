"""EncodecModel wrapper parity: segmented encode/decode, volume norm, OLA.

Builds the torch reference EncodecModel (encoder/model.py) with a small
SEANet + inited quantizer and compares codes + resynthesized waveforms for
both the full-sequence path and the segmented/normalized path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import ref_utils as R

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")

SEANET_KW = dict(channels=1, dimension=32, n_filters=4, n_residual_layers=1,
                 ratios=[8, 5, 4, 2], lstm=2)


def _build_ref_encodec(segment=None, normalize=False, seed=5):
    import torch
    from encoder.model import EncodecModel
    from encoder.modules.seanet import SEANetDecoder, SEANetEncoder
    from encoder.quantization import ResidualVectorQuantizer

    R.seed_all(seed)
    enc = SEANetEncoder(**SEANET_KW)
    dec = SEANetDecoder(**SEANET_KW)
    q = ResidualVectorQuantizer(dimension=32, n_q=2, bins=64)
    g = torch.Generator().manual_seed(seed)
    for layer in q.vq.layers:
        cb = layer._codebook
        embed = torch.randn(cb.codebook_size, cb.embed.shape[1], generator=g)
        cb.embed.data.copy_(embed)
        cb.embed_avg.data.copy_(embed.clone())
        cb.inited.data.copy_(torch.tensor([True]))
        cb.cluster_size.data.copy_(torch.ones(cb.codebook_size))
    m = EncodecModel(enc, dec, q, target_bandwidths=[1.5, 3.0],
                     sample_rate=24000, channels=1, normalize=normalize,
                     segment=segment)
    m.eval()
    return m


def _our_params_and_cfg(ref, segment=None, normalize=False):
    from wavtokenizer_tpu.checkpoint.convert import quantizer_params, seanet_params
    from wavtokenizer_tpu.models.encodec import EncodecConfig
    from wavtokenizer_tpu.models.seanet import (SEANetConfig,
                                                decoder_layer_specs,
                                                encoder_layer_specs)

    sd = R.state_dict_numpy(ref)
    cfg = SEANetConfig(channels=1, dimension=32, n_filters=4,
                       ratios=(8, 5, 4, 2), lstm=2)
    params = {
        "encoder": seanet_params(sd, "encoder.", encoder_layer_specs(cfg)),
        "decoder": seanet_params(sd, "decoder.", decoder_layer_specs(cfg)),
        "quantizer": quantizer_params(sd, "quantizer.", 2),
    }
    from wavtokenizer_tpu.models.quantize import VQConfig
    ecfg = EncodecConfig(seanet=cfg, vq=VQConfig(dimension=32, n_q=2, bins=64),
                         sample_rate=24000, normalize=normalize,
                         segment=segment)
    return params, ecfg


@needs_ref
@pytest.mark.parametrize("segment,normalize", [(None, False), (0.5, True)])
def test_encodec_roundtrip_parity(segment, normalize):
    import torch

    from wavtokenizer_tpu.models import encodec as E

    ref = _build_ref_encodec(segment=segment, normalize=normalize)
    params, ecfg = _our_params_and_cfg(ref, segment=segment,
                                       normalize=normalize)

    x = torch.randn(2, 1, 24000, generator=torch.Generator().manual_seed(0)) * 0.3
    with torch.no_grad():
        frames_ref = ref.encode(x)
        out_ref = ref.decode(frames_ref)[:, :, :24000].numpy()

    xj = jnp.asarray(x.numpy())
    frames = E.encode(params, ecfg, xj)
    assert len(frames) == len(frames_ref)
    for (codes, scale), (codes_ref, scale_ref) in zip(frames, frames_ref):
        np.testing.assert_array_equal(np.asarray(codes),
                                      codes_ref.numpy())
        if scale_ref is not None:
            np.testing.assert_allclose(np.asarray(scale).ravel(),
                                       scale_ref.numpy().ravel(), rtol=1e-5)
    out = np.asarray(E.decode(params, ecfg, frames))[:, :, :24000]
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=1e-3)


@needs_ref
def test_encodec_forward_resynthesis():
    import torch

    from wavtokenizer_tpu.models import encodec as E

    ref = _build_ref_encodec()
    params, ecfg = _our_params_and_cfg(ref)
    x = torch.randn(1, 1, 12000, generator=torch.Generator().manual_seed(1)) * 0.3
    with torch.no_grad():
        out_ref = ref(x)
    out = np.asarray(E.forward(params, ecfg, jnp.asarray(x.numpy())))
    L = min(out.shape[-1], out_ref.shape[-1])
    np.testing.assert_allclose(out[..., :L], out_ref.numpy()[..., :L],
                               atol=2e-4, rtol=1e-3)


@needs_ref
def test_encodec_factory_configs():
    """Factory configs mirror EncodecModel.encodec_model_24khz/48khz
    (ref model.py:263-301) and the bandwidth->n_q policy (vq.py:142-152)."""
    from wavtokenizer_tpu.models.encodec import (encodec_lm_config,
                                                 encodec_model_24khz_config,
                                                 encodec_model_48khz_config,
                                                 set_target_bandwidth)

    c24 = encodec_model_24khz_config()
    assert c24.vq.n_q == 32 and c24.vq.bins == 1024
    assert c24.frame_rate == 75 and c24.seanet.causal
    assert c24.seanet.dimension == 128 and c24.channels == 1
    for bw, n_q in [(1.5, 2), (3.0, 4), (6.0, 8), (12.0, 16), (24.0, 32)]:
        c = set_target_bandwidth(c24, bw)
        assert c.vq.n_q_for_bandwidth(c.frame_rate, c.bandwidth) == n_q
    with pytest.raises(ValueError):
        set_target_bandwidth(c24, 7.5)

    c48 = encodec_model_48khz_config()
    assert c48.vq.n_q == 16 and c48.channels == 2
    assert c48.seanet.norm == "time_group_norm" and not c48.seanet.causal
    assert c48.normalize and c48.segment == 1.0 and c48.frame_rate == 150

    lm = encodec_lm_config(c24)
    assert lm.n_q == 32 and lm.card == 1024
    assert lm.transformer.past_context == int(3.5 * 75)
    assert lm.transformer.dim == 200 and lm.transformer.num_layers == 5


def _build_ref_encodec_48k_style(seed=7):
    """Small stereo time_group_norm model in the 48 kHz factory's image
    (ref model.py:283-301): GroupNorm(1,C) after every conv, normalize=True,
    segmented overlap-add."""
    import torch
    from encoder.model import EncodecModel
    from encoder.modules.seanet import SEANetDecoder, SEANetEncoder
    from encoder.quantization import ResidualVectorQuantizer

    R.seed_all(seed)
    kw = dict(channels=2, dimension=32, n_filters=4, n_residual_layers=1,
              ratios=[8, 5, 4, 2], lstm=2, norm="time_group_norm",
              causal=False)
    enc = SEANetEncoder(**kw)
    dec = SEANetDecoder(**kw)
    q = ResidualVectorQuantizer(dimension=32, n_q=2, bins=64)
    g = torch.Generator().manual_seed(seed)
    for layer in q.vq.layers:
        cb = layer._codebook
        embed = torch.randn(cb.codebook_size, cb.embed.shape[1], generator=g)
        cb.embed.data.copy_(embed)
        cb.embed_avg.data.copy_(embed.clone())
        cb.inited.data.copy_(torch.tensor([True]))
        cb.cluster_size.data.copy_(torch.ones(cb.codebook_size))
    # randomize the group-norm affines so parity actually tests them
    with torch.no_grad():
        for name, p in list(enc.named_parameters()) + list(dec.named_parameters()):
            if ".norm.weight" in name or ".norm.bias" in name:
                p.copy_(torch.randn(p.shape, generator=g) * 0.5 + 1.0)
    m = EncodecModel(enc, dec, q, target_bandwidths=[1.5, 3.0],
                     sample_rate=48000, channels=2, normalize=True,
                     segment=0.25)
    m.eval()
    return m


@needs_ref
def test_encodec_time_group_norm_parity():
    import torch

    from wavtokenizer_tpu.checkpoint.convert import (quantizer_params,
                                                     seanet_params)
    from wavtokenizer_tpu.models import encodec as E
    from wavtokenizer_tpu.models.encodec import EncodecConfig
    from wavtokenizer_tpu.models.quantize import VQConfig
    from wavtokenizer_tpu.models.seanet import (SEANetConfig,
                                                decoder_layer_specs,
                                                encoder_layer_specs)

    ref = _build_ref_encodec_48k_style()
    sd = R.state_dict_numpy(ref)
    scfg = SEANetConfig(channels=2, dimension=32, n_filters=4,
                        ratios=(8, 5, 4, 2), lstm=2, norm="time_group_norm",
                        causal=False)
    params = {
        "encoder": seanet_params(sd, "encoder.", encoder_layer_specs(scfg)),
        "decoder": seanet_params(sd, "decoder.", decoder_layer_specs(scfg)),
        "quantizer": quantizer_params(sd, "quantizer.", 2),
    }
    # group-norm params must have been picked up
    assert "gn" in params["encoder"][0]
    ecfg = EncodecConfig(seanet=scfg, vq=VQConfig(dimension=32, n_q=2, bins=64),
                         sample_rate=48000, channels=2, normalize=True,
                         segment=0.25)

    x = torch.randn(2, 2, 24000, generator=torch.Generator().manual_seed(2)) * 0.3
    with torch.no_grad():
        frames_ref = ref.encode(x)
        out_ref = ref.decode(frames_ref)[:, :, :24000].numpy()

    frames = E.encode(params, ecfg, jnp.asarray(x.numpy()))
    assert len(frames) == len(frames_ref)
    for (codes, scale), (codes_ref, scale_ref) in zip(frames, frames_ref):
        np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
        np.testing.assert_allclose(np.asarray(scale).ravel(),
                                   scale_ref.numpy().ravel(), rtol=1e-5)
    out = np.asarray(E.decode(params, ecfg, frames))[:, :, :24000]
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=1e-3)


@needs_ref
def test_encodec_24khz_factory_parity():
    """Full-size causal 24 kHz factory model (random weights, inited
    codebooks) with set_target_bandwidth(6) -> 8 quantizers."""
    import torch
    from encoder.model import EncodecModel

    R.seed_all(11)
    ref = EncodecModel.encodec_model_24khz(pretrained=False)
    g = torch.Generator().manual_seed(11)
    for layer in ref.quantizer.vq.layers:
        cb = layer._codebook
        embed = torch.randn(cb.codebook_size, cb.embed.shape[1], generator=g)
        cb.embed.data.copy_(embed)
        cb.embed_avg.data.copy_(embed.clone())
        cb.inited.data.copy_(torch.tensor([True]))
        cb.cluster_size.data.copy_(torch.ones(cb.codebook_size))
    ref.eval()
    ref.set_target_bandwidth(6.0)

    from wavtokenizer_tpu.checkpoint.convert import convert_encodec_state_dict
    from wavtokenizer_tpu.models import encodec as E
    from wavtokenizer_tpu.models.encodec import (encodec_model_24khz_config,
                                                 set_target_bandwidth)

    cfg = set_target_bandwidth(encodec_model_24khz_config(), 6.0)
    params = convert_encodec_state_dict(R.state_dict_numpy(ref), cfg)

    x = torch.randn(1, 1, 12000, generator=torch.Generator().manual_seed(3)) * 0.3
    with torch.no_grad():
        frames_ref = ref.encode(x)
        out_ref = ref.decode(frames_ref).numpy()

    frames = E.encode(params, cfg, jnp.asarray(x.numpy()))
    (codes, scale), (codes_ref, _) = frames[0], frames_ref[0]
    assert codes.shape[1] == 8  # bandwidth policy picked n_q=8
    np.testing.assert_array_equal(np.asarray(codes), codes_ref.numpy())
    out = np.asarray(E.decode(params, cfg, frames))
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=1e-3)
