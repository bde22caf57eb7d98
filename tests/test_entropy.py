"""Arithmetic coder + LM-driven code compression (lossless roundtrips)."""

import numpy as np
import pytest

from wavtokenizer_tpu.ops.entropy import (ArithmeticDecoder, ArithmeticEncoder,
                                          compress_codes, decompress_codes,
                                          quantize_pdf)


def test_static_pdf_roundtrip(rng):
    pdf = np.array([0.7, 0.1, 0.1, 0.05, 0.05])
    cum = quantize_pdf(pdf)
    symbols = rng.choice(5, size=500, p=pdf)
    enc = ArithmeticEncoder()
    for s in symbols:
        enc.encode(cum, int(s))
    data = enc.finish()
    dec = ArithmeticDecoder(data)
    out = [dec.decode(cum) for _ in symbols]
    np.testing.assert_array_equal(out, symbols)
    # skewed distribution compresses well below log2(5) bits/symbol
    bits_per_symbol = len(data) * 8 / len(symbols)
    assert bits_per_symbol < 1.6, bits_per_symbol  # entropy ~1.46 bits


def test_uniform_pdf_near_log2(rng):
    C = 64
    cum = quantize_pdf(np.full(C, 1.0 / C))
    symbols = rng.integers(0, C, size=400)
    enc = ArithmeticEncoder()
    for s in symbols:
        enc.encode(cum, int(s))
    data = enc.finish()
    dec = ArithmeticDecoder(data)
    assert [dec.decode(cum) for _ in symbols] == list(symbols)
    assert len(data) * 8 / len(symbols) < np.log2(C) + 0.2


def test_varying_cdfs_roundtrip(rng):
    """Per-step changing distributions (the LM case) must stay in sync."""
    enc = ArithmeticEncoder()
    cums, symbols = [], []
    for _ in range(300):
        pdf = rng.dirichlet(np.ones(17))
        cum = quantize_pdf(pdf)
        s = int(rng.choice(17, p=pdf))
        cums.append(cum)
        symbols.append(s)
        enc.encode(cum, s)
    data = enc.finish()
    dec = ArithmeticDecoder(data)
    out = [dec.decode(c) for c in cums]
    assert out == symbols


def test_lm_compression_lossless(rng):
    from wavtokenizer_tpu.models.lm import (LMConfig,
                                            StreamingTransformerConfig,
                                            init_lm)
    cfg = LMConfig(n_q=2, card=32,
                   transformer=StreamingTransformerConfig(
                       dim=32, num_heads=4, num_layers=1, past_context=16))
    params = init_lm(cfg, seed=0)
    codes = rng.integers(0, 32, size=(2, 12)).astype(np.int32)
    blob = compress_codes(params, cfg, codes)
    out = decompress_codes(params, cfg, blob, K=2, T=12)
    np.testing.assert_array_equal(out, codes)
    assert len(blob) > 0
