"""Chunked long-form encode/decode with overlap cross-fade.

Behavioral contract: the fork's long-audio inference (ref: tsne_inf.py:63-157
— 3 s segments, 25% overlap, linear fade-in/out cross-fade) and EnCodec's
segmented overlap-add (ref: encoder/model.py:122-178, ops.resample.
linear_overlap_add).

TPU-first design: instead of looping segments through the model one by one
(the reference's python loop), all chunks are STACKED INTO THE BATCH AXIS
and processed in a single device call with one compiled shape — a 60 s clip
is 27 chunks = one (27, 72000) batch.  The cross-fade is a vectorized
weighted overlap-add on device.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def chunk_audio(audio: jnp.ndarray, chunk_samples: int,
                overlap: float = 0.25) -> tuple[jnp.ndarray, int, int]:
    """(T,) or (B=1, T) -> (num_chunks, chunk_samples), stride, orig_len.

    The tail chunk is zero-padded to keep shapes static (trimmed after
    decode)."""
    if audio.ndim == 2:
        assert audio.shape[0] == 1, "chunking expects a single stream"
        audio = audio[0]
    T = audio.shape[0]
    stride = int(chunk_samples * (1 - overlap))
    num_chunks = max(1, math.ceil(max(T - chunk_samples, 0) / stride) + 1)
    total = (num_chunks - 1) * stride + chunk_samples
    audio = jnp.pad(audio, (0, total - T))
    overlap_samples = chunk_samples - stride
    if (num_chunks > 1 and overlap_samples > 0
            and stride % overlap_samples == 0):
        # Fast path (canonical 25% overlap: stride = 3 overlap-units, chunk
        # = 4): view the stream as overlap-units and build the chunk stack
        # from `r+1` strided unit slices instead of one (N, L) gather —
        # XLA lowers slices as pure bandwidth, the gather as indexed loads.
        r = stride // overlap_samples            # units per stride
        u = overlap_samples
        n_units = total // u
        units = audio.reshape(n_units, u)
        cols = [units[k:k + (num_chunks - 1) * r + 1:r] for k in range(r + 1)]
        return (jnp.stack(cols, axis=1).reshape(num_chunks, chunk_samples),
                stride, T)
    starts = np.arange(num_chunks) * stride
    idx = starts[:, None] + np.arange(chunk_samples)[None, :]
    return audio[idx], stride, T


def crossfade_join(chunks: jnp.ndarray, stride: int, orig_len: int) -> jnp.ndarray:
    """Weighted overlap-add with linear fade-in/out over the overlap region
    (ref: tsne_inf.py:95-123: fade-in skipped on the first chunk, fade-out
    skipped on the last, so sequence edges pass through unscaled).
    chunks: (N, L) -> (orig_len,)."""
    N, L = chunks.shape
    overlap = L - stride
    ramp = np.linspace(0.0, 1.0, max(overlap, 1), dtype=np.float32)

    def weight(i: int) -> np.ndarray:
        w = np.ones(L, np.float32)
        if overlap > 0:
            if i > 0:
                w[:overlap] = ramp
            if i < N - 1:
                w[-overlap:] = ramp[::-1]
        return w

    total = (N - 1) * stride + L
    W = np.stack([weight(i) for i in range(N)])           # host constant
    den = np.zeros(total, np.float32)
    for i in range(N):
        den[i * stride:i * stride + L] += W[i]
    den = jnp.asarray(np.maximum(den, 1e-8))
    weighted = chunks * jnp.asarray(W)
    if N > 1 and overlap > 0 and stride % overlap == 0:
        # Fast path (canonical 25% overlap): with stride = r overlap-units
        # and chunk = r+1 units, output unit j only ever receives chunks
        # i*r+k (k <= r) — the whole overlap-add collapses to r+1 strided
        # scatter-adds of (N, u) blocks instead of a 2N-deep chain of
        # dynamic-update-slices (at 4 x 27 chunks in the longform bench the
        # DUS chain serialized ~216 tiny device ops per call).
        r = stride // overlap
        u = overlap
        n_units = total // u
        wu = weighted.reshape(N, r + 1, u)
        out = jnp.zeros((n_units, u), jnp.float32)
        for k in range(r + 1):
            out = out.at[k:k + (N - 1) * r + 1:r].add(wu[:, k])
        return (out.reshape(total) / den)[:orig_len]
    out = jnp.zeros(total, jnp.float32)
    for i in range(N):  # static loop; XLA fuses into strided adds
        out = out.at[i * stride:i * stride + L].add(weighted[i])
    return (out / den)[:orig_len]


def encode_infer_chunked(wt, audio, chunk_seconds: float = 3.0,
                         overlap: float = 0.25, bandwidth_id=0):
    """Tokenize arbitrarily long audio as one batched device call.

    Returns (features (N, D, T'), codes (1, N, T'), stride, orig_len) —
    per-chunk tokens (chunk boundaries follow the fork's streaming scheme,
    not the full-sequence padding)."""
    sr = wt.spec.sample_rate
    chunk_samples = int(chunk_seconds * sr)
    chunks, stride, orig_len = chunk_audio(jnp.asarray(audio), chunk_samples,
                                           overlap)
    features, codes = wt.encode_infer(chunks, bandwidth_id=bandwidth_id)
    return features, codes, stride, orig_len


def _bucket_size(n: int, cap: int) -> int:
    """Smallest power-of-two >= n, capped — bounds the number of compiled
    shapes at log2(cap) while keeping padding waste < 2x."""
    b = 1
    while b < n and b < cap:
        b *= 2
    return min(b, cap)


def reconstruct_long_batch(wt, audios, chunk_seconds: float = 3.0,
                           overlap: float = 0.25, bandwidth_id=0,
                           batch_size: int = 128) -> list:
    """Long-form copy synthesis for MANY streams with shared device calls.

    The chunks of all files are concatenated along the batch axis and
    processed in power-of-two-bucketed slices up to ``batch_size`` (the
    measured single-chip sweet spot is 128), so a directory of long files
    rides full batches instead of one under-filled call per file and the
    compiler sees at most log2(batch_size) shapes.  Cross-fade joining is
    per file, identical to :func:`reconstruct_long` (ref chunking scheme:
    tsne_inf.py:63-157).

    audios: iterable of 1-D arrays.  Returns a list of reconstructed
    waveforms in input order.
    """
    sr = wt.spec.sample_rate
    chunk_samples = int(chunk_seconds * sr)
    metas, all_chunks = [], []
    for y in audios:
        chunks, stride, orig_len = chunk_audio(jnp.asarray(y), chunk_samples,
                                               overlap)
        metas.append((chunks.shape[0], stride, orig_len))
        all_chunks.append(chunks)
    cat = jnp.concatenate(all_chunks, axis=0)
    N = cat.shape[0]
    outs = []
    pos = 0
    while pos < N:
        take = min(batch_size, N - pos)
        bucket = _bucket_size(take, batch_size)
        sl = cat[pos:pos + take]
        if take < bucket:
            sl = jnp.pad(sl, ((0, bucket - take), (0, 0)))
        features, _ = wt.encode_infer(sl, bandwidth_id=bandwidth_id)
        decoded = wt.decode(features, bandwidth_id=bandwidth_id)
        outs.append(decoded[:take, :chunk_samples])
        pos += take
    dec_all = jnp.concatenate(outs, axis=0)
    res, pos = [], 0
    for n, stride, orig_len in metas:
        res.append(crossfade_join(dec_all[pos:pos + n], stride, orig_len))
        pos += n
    return res


def reconstruct_long(wt, audio, chunk_seconds: float = 3.0,
                     overlap: float = 0.25, bandwidth_id=0) -> jnp.ndarray:
    """Long-form copy synthesis: chunk -> batch encode/decode -> cross-fade.

    The decode of a chunk comes back at ceil(chunk/hop)*hop samples; the
    trailing synthesis of the padded final frame is trimmed before the
    cross-fade so chunk lengths that are not hop multiples don't blend
    padding garbage into (and widen) the overlap regions."""
    sr = wt.spec.sample_rate
    chunk_samples = int(chunk_seconds * sr)
    chunks, stride, orig_len = chunk_audio(jnp.asarray(audio), chunk_samples,
                                           overlap)
    features, _ = wt.encode_infer(chunks, bandwidth_id=bandwidth_id)
    decoded = wt.decode(features, bandwidth_id=bandwidth_id)  # (N, L>=chunk)
    return crossfade_join(decoded[:, :chunk_samples], stride, orig_len)
