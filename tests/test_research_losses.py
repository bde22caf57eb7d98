"""Research-layer loss parity vs the fork's actual loss functions."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

import ref_utils as R

needs_ref = pytest.mark.skipif(not R.HAVE_REFERENCE,
                               reason="torch reference not available")


def _import_try3():
    """Import the reference try3 module with its heavy/unavailable deps
    stubbed (librosa isn't in the image; only the loss functions are used)."""
    for name in ("librosa", "librosa.display"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    import try3
    return try3


@needs_ref
def test_voice_focused_loss_parity(rng):
    import torch
    try3 = _import_try3()

    from wavtokenizer_tpu.research.losses import voice_focused_loss

    out = rng.normal(size=(2, 12000)).astype(np.float32) * 0.3
    tgt = rng.normal(size=(2, 12000)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = try3.compute_voice_focused_loss(
            torch.from_numpy(out), torch.from_numpy(tgt),
            torch.device("cpu")).item()
    got = float(voice_focused_loss(jnp.asarray(out), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


@needs_ref
def test_voice_focused_loss_parity_unequal_lengths(rng):
    import torch
    try3 = _import_try3()

    from wavtokenizer_tpu.research.losses import voice_focused_loss

    out = rng.normal(size=(1, 9000)).astype(np.float32) * 0.3
    tgt = rng.normal(size=(1, 9600)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = try3.compute_voice_focused_loss(
            torch.from_numpy(out), torch.from_numpy(tgt),
            torch.device("cpu")).item()
    got = float(voice_focused_loss(jnp.asarray(out), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


@needs_ref
def test_feature_loss_parity(rng):
    import torch
    import tsne as ref_tsne

    from wavtokenizer_tpu.research.losses import feature_loss

    enh = rng.normal(size=(3, 64, 50)).astype(np.float32)   # (B, D, T) torch
    tgt = rng.normal(size=(3, 64, 50)).astype(np.float32)
    with torch.no_grad():
        ref = ref_tsne.compute_feature_loss(torch.from_numpy(enh),
                                            torch.from_numpy(tgt),
                                            torch.device("cpu")).item()
    # ours is channel-last (B, T, D)
    got = float(feature_loss(jnp.asarray(enh.transpose(0, 2, 1)),
                             jnp.asarray(tgt.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
