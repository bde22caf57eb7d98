"""Reverse-converter tests: our params -> torch state_dict -> reference model.

Proves the interop story both ways: a model living in this framework exports
to a checkpoint the PyTorch reference loads with strict=True and reproduces
(same codes, same waveform)."""

import numpy as np
import pytest

import ref_utils as R

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")

FE_INIT = dict(encodec_model="encodec_24khz", bandwidths=[6.6, 6.6, 6.6, 6.6],
               train_codebooks=True, num_quantizers=1,
               dowmsamples=[8, 5, 4, 2], vq_bins=4096, vq_kmeans=200)
BB_INIT = dict(input_channels=512, dim=768, intermediate_dim=2304,
               num_layers=12, adanorm_num_embeddings=4)
HEAD_INIT = dict(dim=768, n_fft=1280, hop_length=320, padding="same")


def _build_ref(seed):
    from decoder.pretrained import WavTokenizer as RefWavTokenizer
    fe = R.build_ref_encodec_features(FE_INIT, seed=seed)
    bb = R.build_ref_backbone(**BB_INIT)
    hd = R.build_ref_istft_head(**HEAD_INIT)
    m = RefWavTokenizer(feature_extractor=fe, backbone=bb, head=hd)
    m.eval()
    return m


@needs_ref
def test_export_roundtrips_through_reference_model(rng):
    import torch

    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.checkpoint.convert import (
        convert_wavtokenizer_state_dict)
    from wavtokenizer_tpu.checkpoint.export import wavtokenizer_state_dict

    spec = WavTokenizerSpec()
    ref = _build_ref(seed=43)
    sd = R.state_dict_numpy(ref)
    params = convert_wavtokenizer_state_dict(sd, spec.seanet, spec.vq.n_q,
                                             spec.backbone)
    exported = wavtokenizer_state_dict(params, spec.seanet, spec.backbone,
                                       head_n_fft=spec.head.n_fft)

    # 1. every original key is present with the original shape
    assert set(exported) == set(sd), (
        set(sd) - set(exported), set(exported) - set(sd))
    for k in sd:
        assert exported[k].shape == tuple(np.asarray(sd[k]).shape), k

    # 2. a FRESH reference model strict-loads the exported dict...
    ref2 = _build_ref(seed=44)
    ref2.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in exported.items()},
        strict=True)
    ref2.eval()

    # 3. ...and reproduces the original model exactly (the g/v split differs
    # from torch's random split but the effective weights are equal).
    t = np.arange(9600) / 24000.0
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * rng.normal(size=9600)).astype(np.float32)[None]
    with torch.inference_mode():
        bw = torch.tensor(0)
        feats1, codes1 = ref.encode_infer(torch.from_numpy(audio),
                                          bandwidth_id=bw)
        feats2, codes2 = ref2.encode_infer(torch.from_numpy(audio),
                                           bandwidth_id=bw)
        wav1 = ref.decode(feats1, bandwidth_id=bw)
        wav2 = ref2.decode(feats2, bandwidth_id=bw)
    np.testing.assert_array_equal(codes1.numpy(), codes2.numpy())
    np.testing.assert_allclose(wav1.numpy(), wav2.numpy(), atol=2e-5)


@needs_ref
def test_export_save_torch_checkpoint_loads_via_0802(tmp_path, rng):
    """save_torch_checkpoint output feeds our own from_pretrained0802-style
    loader (load_torch_state_dict) and converts back to the same pytree."""
    import jax

    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.checkpoint.convert import (
        convert_wavtokenizer_state_dict, load_torch_state_dict)
    from wavtokenizer_tpu.checkpoint.export import (save_torch_checkpoint,
                                                    wavtokenizer_state_dict)
    from wavtokenizer_tpu.models.init import init_wavtokenizer

    spec = WavTokenizerSpec()
    params = init_wavtokenizer(spec, random_codebook=True, seed=5)
    exported = wavtokenizer_state_dict(params, spec.seanet, spec.backbone,
                                       head_n_fft=spec.head.n_fft)
    path = str(tmp_path / "exported.ckpt")
    save_torch_checkpoint(path, exported)

    sd = load_torch_state_dict(path)
    back = convert_wavtokenizer_state_dict(sd, spec.seanet, spec.vq.n_q,
                                           spec.backbone)

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(back)}
    checked = 0
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        if ks in flat2 and v is not None:
            np.testing.assert_allclose(np.asarray(v, np.float32),
                                       np.asarray(flat2[ks], np.float32),
                                       atol=2e-6, err_msg=ks)
            checked += 1
    assert checked > 100  # the whole tree, not a few leaves