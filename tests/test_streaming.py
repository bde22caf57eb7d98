"""Chunked long-form streaming: chunking, cross-fade join, end-to-end."""

import numpy as np
import jax.numpy as jnp

from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig, VQConfig,
                              VocosBackboneConfig, WavTokenizerSpec)
from wavtokenizer_tpu.api.streaming import (chunk_audio, crossfade_join,
                                            encode_infer_chunked,
                                            reconstruct_long)


def test_chunk_audio_shapes(rng):
    audio = jnp.asarray(rng.normal(size=(100_000,)).astype(np.float32))
    chunks, stride, orig = chunk_audio(audio, 72000, overlap=0.25)
    assert orig == 100_000
    assert stride == 54000
    assert chunks.shape[1] == 72000
    # enough chunks to cover the signal
    assert (chunks.shape[0] - 1) * stride + 72000 >= orig
    # first chunk is the signal head
    np.testing.assert_array_equal(np.asarray(chunks[0]),
                                  np.asarray(audio[:72000]))


def test_chunk_then_crossfade_is_identity(rng):
    """Chunks of the same signal cross-faded back == the signal (the fade
    weights normalize out), including the zero-padded tail trim."""
    audio = jnp.asarray(rng.normal(size=(50_000,)).astype(np.float32))
    chunks, stride, orig = chunk_audio(audio, 12_000, overlap=0.25)
    joined = crossfade_join(chunks, stride, orig)
    np.testing.assert_allclose(np.asarray(joined), np.asarray(audio),
                               atol=1e-5)


def test_chunk_audio_short_signal(rng):
    audio = jnp.asarray(rng.normal(size=(5_000,)).astype(np.float32))
    chunks, stride, orig = chunk_audio(audio, 12_000, overlap=0.25)
    assert chunks.shape == (1, 12_000) and orig == 5_000
    joined = crossfade_join(chunks, stride, orig)
    np.testing.assert_allclose(np.asarray(joined), np.asarray(audio),
                               atol=1e-6)


def _tiny_wt():
    from wavtokenizer_tpu.api.pretrained import WavTokenizer
    from wavtokenizer_tpu.models.init import init_wavtokenizer
    spec = WavTokenizerSpec(
        seanet=SEANetConfig(dimension=16, n_filters=2, ratios=(8, 5, 4, 2)),
        vq=VQConfig(dimension=16, bins=32),
        backbone=VocosBackboneConfig(input_channels=16, dim=32,
                                     intermediate_dim=64, num_layers=1,
                                     adanorm_num_embeddings=4),
        head=ISTFTHeadConfig(dim=32, n_fft=1280, hop_length=320),
    )
    params = init_wavtokenizer(spec, seed=0, random_codebook=True)
    return WavTokenizer(params, spec)


def test_reconstruct_long_end_to_end(rng):
    wt = _tiny_wt()
    audio = rng.normal(size=(int(24000 * 4.5),)).astype(np.float32) * 0.1
    out = np.asarray(reconstruct_long(wt, audio, chunk_seconds=2.0))
    assert out.shape == audio.shape
    assert np.isfinite(out).all()


def test_encode_infer_chunked_layout(rng):
    wt = _tiny_wt()
    audio = rng.normal(size=(int(24000 * 4.5),)).astype(np.float32) * 0.1
    feats, codes, stride, orig = encode_infer_chunked(wt, audio,
                                                      chunk_seconds=2.0)
    n_chunks = feats.shape[0]
    assert codes.shape[:2] == (1, n_chunks)
    assert stride == int(0.75 * 2.0 * 24000)
    assert orig == len(audio)
    # 2 s chunks at hop 320 -> 150 frames
    assert feats.shape[2] == codes.shape[2] == 150


def test_reconstruct_long_batch_matches_single(rng):
    """Cross-file chunk batching produces the same waveforms as the
    per-file path (same chunks, same cross-fade; only the device batching
    differs), including bucket padding on the final partial slice."""
    from wavtokenizer_tpu.api.streaming import reconstruct_long_batch

    wt = _tiny_wt()
    lens = [int(24000 * 4.5), int(24000 * 2.2), int(24000 * 6.0)]
    audios = [rng.normal(size=(n,)).astype(np.float32) * 0.1 for n in lens]
    singles = [np.asarray(reconstruct_long(wt, a, chunk_seconds=2.0))
               for a in audios]
    # batch_size 4 forces multiple slices + a padded final bucket
    batched = reconstruct_long_batch(wt, audios, chunk_seconds=2.0,
                                     batch_size=4)
    assert len(batched) == len(audios)
    for got, want, n in zip(batched, singles, lens):
        got = np.asarray(got)
        assert got.shape == (n,)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_bucket_size():
    from wavtokenizer_tpu.api.streaming import _bucket_size
    assert _bucket_size(1, 128) == 1
    assert _bucket_size(3, 128) == 4
    assert _bucket_size(27, 128) == 32
    assert _bucket_size(200, 128) == 128


def _chunk_gather(audio, chunk_samples, overlap):
    """Reference chunking: one (N, L) gather (the pre-fast-path lowering)."""
    import math
    T = audio.shape[0]
    stride = int(chunk_samples * (1 - overlap))
    num_chunks = max(1, math.ceil(max(T - chunk_samples, 0) / stride) + 1)
    total = (num_chunks - 1) * stride + chunk_samples
    audio = jnp.pad(audio, (0, total - T))
    starts = np.arange(num_chunks) * stride
    idx = starts[:, None] + np.arange(chunk_samples)[None, :]
    return audio[idx], stride, T


def _crossfade_dus(chunks, stride, orig_len):
    """Reference join: per-chunk dynamic-update-slice chain (the
    pre-fast-path lowering)."""
    N, L = chunks.shape
    overlap = L - stride
    ramp = np.linspace(0.0, 1.0, max(overlap, 1), dtype=np.float32)
    total = (N - 1) * stride + L
    out = jnp.zeros(total, jnp.float32)
    den = jnp.zeros(total, jnp.float32)
    for i in range(N):
        w = np.ones(L, np.float32)
        if overlap > 0:
            if i > 0:
                w[:overlap] = ramp
            if i < N - 1:
                w[-overlap:] = ramp[::-1]
        w = jnp.asarray(w)
        out = out.at[i * stride:i * stride + L].add(chunks[i] * w)
        den = den.at[i * stride:i * stride + L].add(w)
    return (out / jnp.maximum(den, 1e-8))[:orig_len]


def test_fast_paths_match_reference_lowering(rng):
    """chunk_audio / crossfade_join take a strided-slice fast path when the
    overlap divides the stride (the canonical 25% case).  Both paths place
    the same <=2 addends per output sample, so they must agree bit-exactly
    with the gather / DUS-chain lowering — across divisible and
    non-divisible overlaps, the single-chunk case, and overlap=0."""
    for T, L, ov in ((100_000, 12_000, 0.25), (50_000, 12_000, 0.25),
                     (40_000, 9_000, 0.4), (30_000, 8_000, 0.0),
                     (5_000, 12_000, 0.25), (36_000, 12_000, 0.5)):
        audio = jnp.asarray(rng.normal(size=(T,)).astype(np.float32))
        chunks, stride, orig = chunk_audio(audio, L, overlap=ov)
        ref_chunks, ref_stride, ref_orig = _chunk_gather(audio, L, ov)
        assert (stride, orig) == (ref_stride, ref_orig), (L, ov)
        np.testing.assert_array_equal(np.asarray(chunks),
                                      np.asarray(ref_chunks), err_msg=f"{ov}")
        joined = crossfade_join(chunks, stride, orig)
        ref_joined = _crossfade_dus(ref_chunks, stride, orig)
        np.testing.assert_array_equal(np.asarray(joined),
                                      np.asarray(ref_joined),
                                      err_msg=f"{L} {ov}")
