"""Graph parity for the native UTMOS predictor (metrics/utmos.py).

The reference (metrics/UTMOS.py:19-117) stacks a fairseq wav2vec2-small SSL
encoder, domain/judge embeddings, a BiLSTM and an MLP projection.  fairseq
is not installed in this image, so the torch oracle is built from
`transformers.Wav2Vec2Model` — the same wav2vec2-base architecture with the
same parameters under different state-dict names — plus torch modules
replicating the UTMOS head exactly (Embedding / nn.LSTM / the Sequential
projection).  The oracle's weights are exported under fairseq naming (the
layout the real UTMOS checkpoint uses) and run through our converter, so
the test pins BOTH the graph and the checkpoint mapping.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from wavtokenizer_tpu.metrics.utmos import (UTMOSConfig, ssl_encode,  # noqa: E402
                                            utmos_params_from_torch,
                                            utmos_score_from_params)

N_LAYERS = 3  # full 768-dim width; fewer transformer layers for test speed


def _oracle_modules(seed=0):
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    torch.manual_seed(seed)
    w2v = Wav2Vec2Model(Wav2Vec2Config(num_hidden_layers=N_LAYERS)).eval()
    head = torch.nn.ModuleDict({
        "domain": torch.nn.Embedding(3, 128),
        "judge": torch.nn.Embedding(3000, 128),
        "lstm": torch.nn.LSTM(768 + 128 + 128, 512, num_layers=1,
                              batch_first=True, bidirectional=True),
        "net0": torch.nn.Linear(1024, 2048),
        "net3": torch.nn.Linear(2048, 1),
    }).eval()
    return w2v, head


def _fairseq_style_sd(w2v, head):
    """transformers Wav2Vec2Model + head modules -> fairseq-named dict."""
    sd = {}
    ssl = "feature_extractors.0.ssl_model."
    for k, v in w2v.state_dict().items():
        nk = None
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, leaf = parts[2], ".".join(parts[3:])
            if leaf == "conv.weight":
                nk = f"{ssl}feature_extractor.conv_layers.{i}.0.weight"
            elif leaf.startswith("layer_norm."):
                nk = (f"{ssl}feature_extractor.conv_layers.{i}.2."
                      + leaf.split(".")[-1])
        elif k.startswith("feature_projection.layer_norm."):
            nk = f"{ssl}layer_norm." + k.split(".")[-1]
        elif k.startswith("feature_projection.projection."):
            nk = f"{ssl}post_extract_proj." + k.split(".")[-1]
        elif k.startswith("encoder.pos_conv_embed.conv."):
            leaf = k.split("encoder.pos_conv_embed.conv.")[1]
            nk = f"{ssl}encoder.pos_conv.0.{leaf}"
        elif k.startswith("encoder.layer_norm."):
            nk = f"{ssl}encoder.layer_norm." + k.split(".")[-1]
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i, rest = parts[2], ".".join(parts[3:])
            rest = (rest
                    .replace("attention.", "self_attn.")
                    .replace("layer_norm.", "self_attn_layer_norm.")
                    .replace("self_attn_layer_norm.", "self_attn_layer_norm.")
                    .replace("feed_forward.intermediate_dense", "fc1")
                    .replace("feed_forward.output_dense", "fc2"))
            # final_layer_norm got caught by the generic replace; undo
            rest = rest.replace("final_self_attn_layer_norm.",
                                "final_layer_norm.")
            nk = f"{ssl}encoder.layers.{i}.{rest}"
        if nk is not None:
            sd[nk] = v
    sd["feature_extractors.1.embedding.weight"] = head["domain"].weight
    sd["output_layers.0.judge_embedding.weight"] = head["judge"].weight
    for k, v in head["lstm"].state_dict().items():
        sd[f"output_layers.0.decoder_rnn.{k}"] = v
    for leaf in ("weight", "bias"):
        sd[f"output_layers.1.net.0.{leaf}"] = getattr(head["net0"], leaf)
        sd[f"output_layers.1.net.3.{leaf}"] = getattr(head["net3"], leaf)
    return sd


def _oracle_score(w2v, head, wav):
    """Reference UTMOS.py:119-223 forward in torch, eval mode."""
    with torch.no_grad():
        x = w2v(wav).last_hidden_state
        B, T, _ = x.shape
        d = head["domain"](torch.zeros(B, dtype=torch.long))
        j = head["judge"](torch.full((B,), 288, dtype=torch.long))
        feats = torch.cat([x, d[:, None, :].expand(-1, T, -1),
                           j[:, None, :].expand(-1, T, -1)], dim=2)
        out, _ = head["lstm"](feats)
        scores = head["net3"](torch.relu(head["net0"](out)))
        return x, scores.mean(dim=1).squeeze(1) * 2 + 3


@pytest.fixture(scope="module")
def oracle():
    w2v, head = _oracle_modules()
    params = utmos_params_from_torch(_fairseq_style_sd(w2v, head))
    return w2v, head, params


def test_ssl_encoder_parity(oracle):
    w2v, head, params = oracle
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(2, 16000)) * 0.1).astype(np.float32)
    ref_x, _ = _oracle_score(w2v, head, torch.from_numpy(wav))
    got = np.asarray(ssl_encode(params, jnp.asarray(wav),
                                UTMOSConfig(num_layers=N_LAYERS)))
    np.testing.assert_allclose(got, ref_x.numpy(), atol=2e-3, rtol=1e-3)


def test_utmos_score_parity(oracle):
    w2v, head, params = oracle
    rng = np.random.default_rng(1)
    wav = (rng.normal(size=(3, 16000)) * 0.1).astype(np.float32)
    _, ref = _oracle_score(w2v, head, torch.from_numpy(wav))
    from wavtokenizer_tpu.metrics import utmos as um
    cfg = UTMOSConfig(num_layers=N_LAYERS)
    scores = um.utmos_frame_scores(params, jnp.asarray(wav), cfg=cfg)
    got = np.asarray(scores.mean(axis=1)[:, 0] * 2.0 + 3.0)
    np.testing.assert_allclose(got, ref.numpy(), atol=2e-3, rtol=1e-3)
    # scoring helper shape contract: (T,) -> (1,), (B, T) -> (B,)
    assert utmos_score_from_params(params, wav[0]).shape == (1,)


def test_load_utmos_roundtrip(tmp_path, oracle):
    """load_utmos reads a saved lightning-style checkpoint and scores."""
    w2v, head, params = oracle
    sd = _fairseq_style_sd(w2v, head)
    torch.save({"state_dict": sd}, tmp_path / "utmos.ckpt")
    from wavtokenizer_tpu.metrics.utmos import load_utmos
    loaded = load_utmos(str(tmp_path / "utmos.ckpt"))
    assert loaded is not None
    a = np.concatenate([x.ravel() for x in
                        np.asarray(loaded["judge_emb"], np.float32)[None]])
    assert np.allclose(a, np.asarray(params["judge_emb"]).ravel())
