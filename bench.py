#!/usr/bin/env python
"""Benchmarks on one TPU chip.

Default: prints ONE JSON line — the headline metric (BASELINE.json north
star): batched 3 s encode+decode real-time factor on WavTokenizer-small-320.

``--all`` additionally runs every BASELINE.json benchmark config:
  1. small-600 (40 tok/s) single-clip roundtrip
  2. small-320 (75 tok/s) batched 3 s clips              <- headline
  3. music/audio 16 kHz config (attention decoder)
  4. 60 s long-form via chunked streaming encode/decode
  5. bulk feature extraction with on-device resampling
and writes the full table to BENCH_DETAIL.json.

Methodology: iterations are chained through a data dependency and timed
between two host fetches, so remote-dispatch/tunnel latency is excluded and
async queueing cannot fake the number (block_until_ready is not a reliable
barrier on the axon relay).
"""

import json
import os
import sys
import time

import numpy as np


def _chain_time(roundtrip, params, audios, wav0, n_small=4, n_large=24):
    """Per-iteration seconds via chained large-minus-small timing."""
    def run(n):
        w = wav0
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out, w = roundtrip(params, audios[i % len(audios)], w)
        np.asarray(out[:1] if hasattr(out, "shape") else out)
        return time.perf_counter() - t0

    run(2)  # settle
    t_small = min(run(n_small) for _ in range(3))
    t_large = min(run(n_large) for _ in range(3))
    return (t_large - t_small) / (n_large - n_small)


def _roundtrip_bench(spec, batch, seconds, label):
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu.models import wavtokenizer as wt
    from wavtokenizer_tpu.models.init import init_wavtokenizer

    params = jax.device_put(init_wavtokenizer(spec, random_codebook=True))
    T = int(spec.sample_rate * seconds)
    rng = np.random.default_rng(0)
    audios = [jax.device_put(jnp.asarray(
        rng.normal(size=(batch, T)).astype(np.float32) * 0.1))
        for _ in range(3)]

    @jax.jit
    def roundtrip(params, audio, prev_wav):
        feats, codes = wt.encode_infer(params, spec, audio + prev_wav * 0.0)
        wav = wt.decode(params, spec, feats, 0)
        return codes, wav

    codes, wav = roundtrip(params, audios[0], jnp.zeros_like(audios[0]))
    np.asarray(codes[..., :1])
    # single-clip (latency-bound) runs need many more chained iterations to
    # average out tunnel jitter: measured spread at (4, 24) chains is
    # ~1100-2900x run-to-run; (16, 96) stabilizes to a few percent.
    n_small, n_large = (16, 96) if batch == 1 else (4, 24)
    per_iter = _chain_time(lambda p, a, w: roundtrip(p, a, w), params, audios,
                           wav, n_small=n_small, n_large=n_large)
    rtf = batch * seconds / per_iter
    return {"metric": label, "value": round(rtf, 1),
            "unit": "audio_sec/sec/chip", "vs_baseline": round(rtf / 1000.0, 4)}


def bench_headline():
    from wavtokenizer_tpu import WavTokenizerSpec
    B = int(os.environ.get("BENCH_BATCH", 128))
    return _roundtrip_bench(WavTokenizerSpec(), B, 3.0,
                            "encode_decode_realtime_factor")


def bench_detokenize():
    """BASELINE config #2's second path: codes -> codes_to_features ->
    decode (pure detokenization, the audio-LM serving path)."""
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.models import wavtokenizer as wt
    from wavtokenizer_tpu.models.init import init_wavtokenizer

    spec = WavTokenizerSpec()
    params = jax.device_put(init_wavtokenizer(spec, random_codebook=True))
    B, SECONDS = int(os.environ.get("BENCH_BATCH", 128)), 3.0
    Tp = int(spec.frame_rate * SECONDS)
    rng = np.random.default_rng(0)
    codes = [jax.device_put(jnp.asarray(
        rng.integers(0, spec.vq.bins, size=(1, B, Tp)).astype(np.int32)))
        for _ in range(3)]

    @jax.jit
    def detok(params, c, prev):
        c = c + (prev[:1, :1].astype(jnp.int32) * 0)[0, 0]
        feats = wt.codes_to_features(params, c)
        return wt.decode(params, spec, feats, 0)

    wav = detok(params, codes[0], jnp.zeros((1, 1), jnp.float32))
    np.asarray(wav[:1])
    per_iter = _chain_time(lambda p, c, w: (detok(p, c, w),) * 2,
                           params, codes, wav)
    rtf = B * SECONDS / per_iter
    return {"metric": "detokenize_rtf", "value": round(rtf, 1),
            "unit": "audio_sec/sec/chip", "vs_baseline": round(rtf / 1000.0, 4)}


def bench_small600_single():
    from wavtokenizer_tpu import (ISTFTHeadConfig, SEANetConfig,
                                  WavTokenizerSpec)
    spec = WavTokenizerSpec(
        seanet=SEANetConfig(ratios=(6, 5, 5, 4)),
        head=ISTFTHeadConfig(n_fft=2400, hop_length=600))
    return _roundtrip_bench(spec, 1, 3.0, "small600_single_clip_rtf")


def bench_music16k():
    from wavtokenizer_tpu import WavTokenizerSpec
    spec = WavTokenizerSpec(sample_rate=16000)
    B = int(os.environ.get("BENCH_BATCH", 128))
    return _roundtrip_bench(spec, B, 3.0, "music_audio_16k_rtf")


def bench_longform_60s():
    """BASELINE config #4: 60 s clip, chunked streaming (3 s chunks, 25%
    overlap, cross-fade join) as one batched device program."""
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.api.pretrained import WavTokenizer
    from wavtokenizer_tpu.api.streaming import chunk_audio, crossfade_join
    from wavtokenizer_tpu.models import wavtokenizer as wt
    from wavtokenizer_tpu.models.init import init_wavtokenizer

    spec = WavTokenizerSpec()
    params = jax.device_put(init_wavtokenizer(spec, random_codebook=True))
    SECONDS = 60.0
    T = int(spec.sample_rate * SECONDS)
    rng = np.random.default_rng(0)
    audios = [jax.device_put(jnp.asarray(
        rng.normal(size=(T,)).astype(np.float32) * 0.1)) for _ in range(3)]
    chunk_samples = int(3.0 * spec.sample_rate)

    @jax.jit
    def longform(params, audio, prev):
        chunks, stride, orig = chunk_audio(audio + prev[:T] * 0.0,
                                           chunk_samples, 0.25)
        feats, _ = wt.encode_infer(params, spec, chunks)
        dec = wt.decode(params, spec, feats, 0)
        return crossfade_join(dec, stride, orig)

    out = longform(params, audios[0], jnp.zeros((T,), jnp.float32))
    np.asarray(out[:1])
    per_iter = _chain_time(lambda p, a, w: (longform(p, a, w),) * 2,
                           params, audios, out)
    rtf = SECONDS / per_iter
    return {"metric": "longform_60s_streaming_rtf", "value": round(rtf, 1),
            "unit": "audio_sec/sec/chip", "vs_baseline": round(rtf / 1000.0, 4)}


def bench_bulk_extract():
    """BASELINE config #5: extract_features flow — 16 kHz source clips,
    on-device resample to 24 kHz, raw pre-VQ encoder features."""
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.models.init import init_wavtokenizer
    from wavtokenizer_tpu.models.seanet import seanet_encode
    from wavtokenizer_tpu.ops.resample import resample

    spec = WavTokenizerSpec()
    params = jax.device_put(init_wavtokenizer(spec, random_codebook=True))
    B, SECONDS, SRC_SR = 64, 5.0, 16000
    T = int(SRC_SR * SECONDS)
    rng = np.random.default_rng(0)
    audios = [jax.device_put(jnp.asarray(
        rng.normal(size=(B, T)).astype(np.float32) * 0.1)) for _ in range(3)]

    @jax.jit
    def extract(params, audio, prev):
        audio = audio + prev[:, :1, :1].reshape(B, 1) * 0.0
        a24 = resample(audio, SRC_SR, spec.sample_rate)
        return seanet_encode(params["encoder"], spec.seanet, a24[:, :, None])

    feats = extract(params, audios[0],
                    jnp.zeros((B, 1, 1), jnp.float32))
    np.asarray(feats[:1, :1, :1])
    per_iter = _chain_time(lambda p, a, w: (extract(p, a, w),) * 2,
                           params, audios, feats)
    rtf = B * SECONDS / per_iter
    return {"metric": "bulk_extract_resample_rtf", "value": round(rtf, 1),
            "unit": "audio_sec/sec/chip", "vs_baseline": round(rtf / 1000.0, 4)}


def bench_train_step():
    """GAN training throughput on one chip (batch 24 x 3 s crops; the
    reference's per-GPU batch is 40, configs/...frame75...yaml:10, but XLA
    pads the narrow-channel encoder activations to 128 lanes on the batch
    axis, and with that padding batch 40 exceeds 16 GB of HBM even with
    full rematerialization — 24 is the largest clean fit).  The reference
    publishes no training throughput (BASELINE.md); the number is reported
    on the same audio-sec/sec/chip yardstick as inference, but note the
    workload is ~30x the inference FLOPs (generator fwd+bwd twice + three
    discriminator families x real/fake x fwd+bwd), so ~50x real-time is
    the expected scale: one epoch over LibriTTS (~585 h) is ~11 chip-hours."""
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.train.step import (TrainConfig, create_train_state,
                                             train_step)

    spec = WavTokenizerSpec()
    tcfg = TrainConfig()
    state = jax.device_put(create_train_state(spec, tcfg, seed=0))
    B, SECONDS = int(os.environ.get("BENCH_TRAIN_BATCH", 24)), 3.0
    T = int(spec.sample_rate * SECONDS)
    rng = np.random.default_rng(0)
    audios = [jax.device_put(jnp.asarray(
        rng.normal(size=(B, T)).astype(np.float32) * 0.1)) for _ in range(3)]
    key = jax.random.PRNGKey(0)

    def one_step(state, audio, _prev):
        new_state, metrics = train_step(state, audio, key, spec, tcfg)
        return new_state, metrics["gen_total"]

    state, loss = one_step(state, audios[0], None)
    np.asarray(loss)

    def chained(n):
        import time as _t
        nonlocal state
        t0 = _t.perf_counter()
        loss = None
        for i in range(n):
            state, loss = one_step(state, audios[i % len(audios)], loss)
        np.asarray(loss)
        return _t.perf_counter() - t0

    chained(1)  # settle
    t_small = min(chained(2) for _ in range(2))
    t_large = min(chained(8) for _ in range(2))
    per_step = (t_large - t_small) / 6
    rtf = B * SECONDS / per_step
    return {"metric": "train_step_rtf", "value": round(rtf, 1),
            "unit": "audio_sec/sec/chip", "vs_baseline": round(rtf / 1000.0, 4),
            "note": ("training, not inference: full GAN step (gen fwd+bwd x2 "
                     "+ 3 discriminator families), ~30x inference FLOPs; "
                     "the 1000x baseline target applies to the inference "
                     "metrics above")}


def main():
    from wavtokenizer_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    headline = bench_headline()
    print(json.dumps(headline))
    if "--all" in sys.argv:
        results = [headline]
        for fn in (bench_detokenize, bench_small600_single, bench_music16k,
                   bench_longform_60s, bench_bulk_extract, bench_train_step):
            r = fn()
            results.append(r)
            print(json.dumps(r))
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
