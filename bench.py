#!/usr/bin/env python
"""Headline benchmark: encode+decode real-time factor on one TPU chip.

Measures audio-seconds processed per wall-clock second for the full
tokenize -> detokenize pipeline (SEANet encode -> VQ -> Vocos backbone ->
ISTFT) on the flagship WavTokenizer-small-320 (75 tok/s) architecture at
24 kHz, batched 3 s clips — BASELINE.json's target metric
(>= 1000x real-time audio-sec/sec/chip).

Methodology: iterations are chained through a data dependency and timed
between two host fetches, so remote-dispatch/tunnel latency is excluded and
async queueing cannot fake the number (block_until_ready is not a reliable
barrier on the axon relay).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wavtokenizer_tpu import WavTokenizerSpec
    from wavtokenizer_tpu.models import wavtokenizer as wt
    from wavtokenizer_tpu.models.init import init_wavtokenizer

    spec = WavTokenizerSpec()
    params = jax.device_put(init_wavtokenizer(spec, random_codebook=True))

    B = int(os.environ.get("BENCH_BATCH", 128))
    SECONDS = 3.0
    T = int(24000 * SECONDS)
    rng = np.random.default_rng(0)
    audios = [jax.device_put(jnp.asarray(
        rng.normal(size=(B, T)).astype(np.float32) * 0.1)) for _ in range(3)]

    @jax.jit
    def roundtrip(params, audio):
        feats, codes = wt.encode_infer(params, spec, audio)
        wav = wt.decode(params, spec, feats, 0)
        return codes, wav

    # Warm up both the plain call and the chained variant (distinct fusions).
    codes, wav = roundtrip(params, audios[0])
    np.asarray(codes)
    codes, wav = roundtrip(params, audios[1] + wav * 0.0)
    np.asarray(codes)

    def run(n: int) -> float:
        nonlocal wav
        t0 = time.perf_counter()
        w = wav
        local_codes = None
        for i in range(n):
            local_codes, w = roundtrip(params, audios[i % 3] + w * 0.0)
        np.asarray(local_codes)  # host fetch = true completion barrier
        return time.perf_counter() - t0

    run(2)  # settle
    n_small, n_large = 4, 24
    t_small = min(run(n_small) for _ in range(3))
    t_large = min(run(n_large) for _ in range(3))
    per_iter = (t_large - t_small) / (n_large - n_small)

    rtf = B * SECONDS / per_iter
    print(json.dumps({
        "metric": "encode_decode_realtime_factor",
        "value": round(rtf, 1),
        "unit": "audio_sec/sec/chip",
        "vs_baseline": round(rtf / 1000.0, 4),
    }))


if __name__ == "__main__":
    main()
