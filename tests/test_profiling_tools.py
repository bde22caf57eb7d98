"""Shape-trace and profiling utilities (host-side, tiny spec)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools_tpu"))

from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, VQConfig,
                              VocosBackboneConfig, WavTokenizerSpec)

TINY = WavTokenizerSpec(
    seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)),
    vq=VQConfig(dimension=16, bins=32),
    backbone=VocosBackboneConfig(input_channels=16, dim=32, intermediate_dim=64,
                                 num_layers=2, adanorm_num_embeddings=4),
    head=ISTFTHeadConfig(dim=32, n_fft=1280, hop_length=320),
)


def test_shape_trace_structure():
    from shape_trace import shape_trace
    text = shape_trace(TINY, batch=2, seconds=1.0)
    lines = text.splitlines()
    assert "feature_extractor.encoder (SEANet)" in text
    assert any("model.0 conv" in l and "(2, 24000, 2)" in l for l in lines)
    assert any("quantizer (VQ)" in l and "32 bins x 16" in l for l in lines)
    assert any("convnext.1" in l for l in lines)
    assert any("head (ISTFT)" in l and "(2, 24000)" in l for l in lines)
    # hop product: 24000 samples -> 75 frames at 1 s
    assert any("lstm" in l and "75" in l for l in lines)


def test_stage_timings_runs():
    from wavtokenizer_tpu.utils.profiling import stage_timings
    x = jnp.ones((4, 64))
    times = stage_timings(
        {"double": (lambda a: a * 2, (x,)),
         "tree": (lambda a: {"y": a + 1, "z": a - 1}, (x,))},
        iters=2, repeats=1)
    assert set(times) == {"double", "tree"}
    assert all(v >= 0 for v in times.values())


def test_pipeline_stages_cover_roundtrip():
    from wavtokenizer_tpu.models.init import init_wavtokenizer
    from wavtokenizer_tpu.utils.profiling import pipeline_stages, stage_timings
    params = init_wavtokenizer(TINY, seed=0, random_codebook=True)
    audio = jnp.asarray(np.random.default_rng(0)
                        .normal(size=(2, 24000)).astype(np.float32) * 0.1)
    stages = pipeline_stages(params, TINY, audio)
    assert {"encoder", "vq", "backbone", "head", "roundtrip"} <= set(stages)
    times = stage_timings({"roundtrip": stages["roundtrip"]}, iters=1, repeats=1)
    assert times["roundtrip"] > 0
