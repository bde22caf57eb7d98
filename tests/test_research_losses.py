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
    import importlib.machinery
    for name in ("librosa", "librosa.display"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # a real ModuleSpec so importlib.util.find_spec (used by e.g.
            # transformers' availability probes) doesn't choke on the stub
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod
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


@needs_ref
def test_adapter_forward_parity(rng):
    """Our adapter vs try3's adapter stack (conv->BN->ReLU->ResBlocks->
    conv->ReLU) with identical weights, eval mode (running BN stats)."""
    import torch
    import torch.nn as nn
    try3 = _import_try3()

    from wavtokenizer_tpu.research.adapter import (AdapterConfig, apply_adapter,
                                                   init_adapter)

    H, D = 16, 32
    cfg = AdapterConfig(encoder_dim=D, hidden=H, num_residual_blocks=2)
    torch.manual_seed(3)
    conv_in = nn.Conv1d(D, H, 1)
    bn_in = nn.BatchNorm1d(H)
    blocks = nn.Sequential(try3.ResidualBlock(H), try3.ResidualBlock(H))
    conv_out = nn.Conv1d(H, D, 1)
    # randomize BN running stats so eval mode is a real test
    for m in [bn_in, blocks[0].bn1, blocks[0].bn2, blocks[1].bn1, blocks[1].bn2]:
        m.running_mean.data.normal_(0, 0.3)
        m.running_var.data.uniform_(0.5, 1.5)
    for m in (conv_in, bn_in, blocks, conv_out):
        m.eval()

    def cv(c):
        return {"kernel": c.weight.detach().numpy().transpose(2, 1, 0),
                "bias": c.bias.detach().numpy()}

    def bnp(b):
        return {"weight": b.weight.detach().numpy(),
                "bias": b.bias.detach().numpy()}

    def bns(b):
        return {"mean": b.running_mean.numpy(), "var": b.running_var.numpy()}

    params = {"adapter_conv": cv(conv_in), "adapter_bn": bnp(bn_in),
              "blocks": [{"conv1": cv(bl.conv1), "bn1": bnp(bl.bn1),
                          "conv2": cv(bl.conv2), "bn2": bnp(bl.bn2)}
                         for bl in blocks],
              "out_conv": cv(conv_out)}
    state = {"adapter_bn": bns(bn_in),
             "blocks": [{"bn1": bns(bl.bn1), "bn2": bns(bl.bn2)}
                        for bl in blocks]}

    x = rng.normal(size=(2, D, 40)).astype(np.float32)  # (B, D, T) torch
    with torch.no_grad():
        h = torch.relu(bn_in(conv_in(torch.from_numpy(x))))
        h = blocks(h)
        ref = torch.relu(conv_out(h)).numpy()
    got, _ = apply_adapter(params, state,
                           jnp.asarray(x.transpose(0, 2, 1)), train=False,
                           cfg=cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                               atol=1e-5, rtol=1e-4)


@needs_ref
def test_byol_simple_transformer_parity(rng):
    """Our BYOL SimpleTransformer vs the fork's (tr_byol.py:12-29) with
    converted torch weights (post-LN TransformerEncoder, mean pool, fc)."""
    import torch
    import tr_byol

    from wavtokenizer_tpu.research.byol import BYOLConfig, simple_transformer

    D_IN, D, HEADS, LAYERS = 24, 32, 4, 2
    torch.manual_seed(7)
    ref_m = tr_byol.SimpleTransformer(D_IN, D, 128, HEADS, LAYERS).eval()

    def lin(w, b):
        return {"weight": w.detach().numpy().T, "bias": b.detach().numpy()}

    layers = []
    for tl in ref_m.transformer.layers:
        in_w = tl.self_attn.in_proj_weight.detach().numpy()
        in_b = tl.self_attn.in_proj_bias.detach().numpy()
        qw, kw, vw = np.split(in_w, 3, axis=0)
        qb, kb, vb = np.split(in_b, 3)
        layers.append({
            "q": {"weight": qw.T, "bias": qb},
            "k": {"weight": kw.T, "bias": kb},
            "v": {"weight": vw.T, "bias": vb},
            "o": lin(tl.self_attn.out_proj.weight, tl.self_attn.out_proj.bias),
            "ln1": {"weight": tl.norm1.weight.detach().numpy(),
                    "bias": tl.norm1.bias.detach().numpy()},
            "ln2": {"weight": tl.norm2.weight.detach().numpy(),
                    "bias": tl.norm2.bias.detach().numpy()},
            "ff1": lin(tl.linear1.weight, tl.linear1.bias),
            "ff2": lin(tl.linear2.weight, tl.linear2.bias),
        })
    params = {"embedding": lin(ref_m.embedding.weight, ref_m.embedding.bias),
              "layers": layers,
              "fc": lin(ref_m.fc.weight, ref_m.fc.bias)}
    cfg = BYOLConfig(input_dim=D_IN, hidden_dim=D, num_heads=HEADS,
                     num_layers=LAYERS, ff_dim=2048)

    x = rng.normal(size=(3, 10, D_IN)).astype(np.float32)
    with torch.no_grad():
        ref = ref_m(torch.from_numpy(x)).numpy()
    got = np.asarray(simple_transformer(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


@needs_ref
def test_try_inpath_transformer_parity(rng):
    """try.py:36-53 SimpleTransformer (d_model = encoder dim, per-frame fc,
    time dimension kept) vs ours with converted torch weights."""
    import importlib

    import torch

    ref_try = importlib.import_module("try")  # keyword filename -> importlib

    from wavtokenizer_tpu.research.adapter import (InPathTransformerConfig,
                                                   inpath_transformer,
                                                   inpath_transformer_from_torch)

    D, HEADS, LAYERS = 32, 4, 2
    torch.manual_seed(11)
    ref_m = ref_try.SimpleTransformer(D, 128, 128, HEADS, LAYERS).eval()
    cfg = InPathTransformerConfig(dim=D, num_heads=HEADS, num_layers=LAYERS)
    params = inpath_transformer_from_torch(ref_m.state_dict(), cfg)

    x = rng.normal(size=(2, D, 20)).astype(np.float32)  # torch (B, C, T)
    with torch.no_grad():
        ref = ref_m(torch.from_numpy(x)).numpy()
    got = inpath_transformer(params, jnp.asarray(x.transpose(0, 2, 1)), cfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                               atol=2e-5, rtol=1e-4)


@needs_ref
def test_try_enhancement_stack_parity(rng):
    """The full try.py:108-133 middle stack in eval mode: amplitude boost +
    no-affine LayerNorm -> SimpleTransformer -> adapter -> relu*2.5 ->
    LayerNorm*3, weights converted from the torch modules."""
    import importlib

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    ref_try = importlib.import_module("try")

    from wavtokenizer_tpu.research.adapter import (AdapterConfig,
                                                   InPathTransformerConfig,
                                                   init_adapter,
                                                   inpath_transformer_from_torch,
                                                   try_enhancement_stack)

    D, H, HEADS, LAYERS = 32, 16, 4, 2
    torch.manual_seed(13)
    tr = ref_try.SimpleTransformer(D, 128, 128, HEADS, LAYERS).eval()
    conv_in = nn.Conv1d(D, H, 1)
    bn_in = nn.BatchNorm1d(H)
    blocks = nn.Sequential(ref_try.ResidualBlock(H), ref_try.ResidualBlock(H))
    conv_out = nn.Conv1d(H, D, 1)
    for m in [bn_in, blocks[0].bn1, blocks[0].bn2, blocks[1].bn1,
              blocks[1].bn2]:
        m.running_mean.data.normal_(0, 0.3)
        m.running_var.data.uniform_(0.5, 1.5)
    for m in (tr, conv_in, bn_in, blocks, conv_out):
        m.eval()

    feats = rng.normal(size=(2, D, 25)).astype(np.float32)  # torch (B, C, T)
    with torch.no_grad():  # try.py forward, lines 108-133
        f = torch.from_numpy(feats) * 3.0
        f = F.layer_norm(f.transpose(1, 2), [D]).transpose(1, 2)
        f = tr(f)
        h = torch.relu(bn_in(conv_in(f)))
        h = blocks(h)
        h = torch.relu(conv_out(h))
        h = torch.relu(h) * 2.5
        ref = (F.layer_norm(h.transpose(1, 2), [D]).transpose(1, 2)
               * 3.0).numpy()

    def cv(c):
        return {"kernel": c.weight.detach().numpy().transpose(2, 1, 0),
                "bias": c.bias.detach().numpy()}

    def bnp(b):
        return {"weight": b.weight.detach().numpy(),
                "bias": b.bias.detach().numpy()}

    def bns(b):
        return {"mean": b.running_mean.numpy(), "var": b.running_var.numpy()}

    acfg = AdapterConfig(encoder_dim=D, hidden=H, num_residual_blocks=2)
    aparams = {"adapter_conv": cv(conv_in), "adapter_bn": bnp(bn_in),
               "blocks": [{"conv1": cv(bl.conv1), "bn1": bnp(bl.bn1),
                           "conv2": cv(bl.conv2), "bn2": bnp(bl.bn2)}
                          for bl in blocks],
               "out_conv": cv(conv_out)}
    astate = {"adapter_bn": bns(bn_in),
              "blocks": [{"bn1": bns(bl.bn1), "bn2": bns(bl.bn2)}
                         for bl in blocks]}
    tcfg = InPathTransformerConfig(dim=D, num_heads=HEADS, num_layers=LAYERS)
    tparams = inpath_transformer_from_torch(tr.state_dict(), tcfg)

    got, _ = try_enhancement_stack(tparams, aparams, astate,
                                   jnp.asarray(feats.transpose(0, 2, 1)),
                                   train=False, transformer_cfg=tcfg)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                               atol=5e-5, rtol=1e-4)


def test_byol_transformer_partial_load():
    """try.py:101-104 strict=False semantics: only shape-matching leaves
    load; mismatched BYOL checkpoints (the fork's real ones) load nothing."""
    from wavtokenizer_tpu.research.adapter import (InPathTransformerConfig,
                                                   init_inpath_transformer,
                                                   load_byol_transformer)

    cfg = InPathTransformerConfig(dim=16, num_heads=2, num_layers=1, ffn=32)
    params = init_inpath_transformer(cfg, seed=0)

    # completely mismatched tree (tr_byol-style shapes) -> nothing loads
    mismatched = {"embedding": {"weight": np.zeros((16, 8), np.float32)}}
    merged, n = load_byol_transformer(params, mismatched)
    assert n == 0
    np.testing.assert_array_equal(merged["fc"]["weight"],
                                  params["fc"]["weight"])

    # identical structure -> every leaf loads
    donor = init_inpath_transformer(cfg, seed=5)
    merged, n = load_byol_transformer(params, donor)
    assert n == len([None for _ in __import__("jax").tree.leaves(donor)])
    np.testing.assert_array_equal(merged["fc"]["weight"],
                                  donor["fc"]["weight"])


def test_enhance_step_byol_mode(rng):
    """enhance_step mode='byol' trains transformer + adapter + decoder on a
    tiny spec and returns finite loss + updated transformer params."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from wavtokenizer_tpu import SEANetConfig, WavTokenizerSpec
    from wavtokenizer_tpu.models.init import init_wavtokenizer
    from wavtokenizer_tpu.research.adapter import (AdapterConfig,
                                                   InPathTransformerConfig,
                                                   init_adapter,
                                                   init_inpath_transformer)
    from wavtokenizer_tpu.research.enhance import (EnhanceConfig, enhance_step,
                                                   make_enhance_optimizer)

    spec = WavTokenizerSpec(
        seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)))
    base = init_wavtokenizer(spec, seed=0, random_codebook=True)
    acfg = AdapterConfig(encoder_dim=16, hidden=8, num_residual_blocks=1)
    aparams, astate = init_adapter(acfg, seed=0)
    tcfg = InPathTransformerConfig(dim=16, num_heads=2, num_layers=1, ffn=32)
    tparams = init_inpath_transformer(tcfg, seed=0)

    ecfg = EnhanceConfig(mode="byol", transformer_cfg=tcfg)
    opt = make_enhance_optimizer(aparams, base["decoder"], ecfg, tparams)

    noisy = rng.normal(size=(2, 3200)).astype(np.float32) * 0.3
    clean = rng.normal(size=(2, 3200)).astype(np.float32) * 0.3

    (opt, aparams2, astate2, dec2, tparams2, loss) = enhance_step(
        opt, aparams, astate, base["decoder"], base, noisy, clean, spec,
        ecfg, tparams)
    assert np.isfinite(float(loss))
    # transformer actually trained (params moved)
    moved = np.abs(np.asarray(tparams2["fc"]["weight"])
                   - np.asarray(tparams["fc"]["weight"])).max()
    assert moved > 0
