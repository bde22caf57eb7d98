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
