"""Serving-engine tests: shape-bucketed micro-batching semantics.

The engine is additive (the reference has no serving layer; infer.py loops
files one at a time) — these tests pin the batching contract: coalescing,
padding/trim bookkeeping, result equivalence vs direct API calls, and
detokenize == codes_to_features + decode.
"""

import concurrent.futures as cf

import numpy as np
import jax

from wavtokenizer_tpu import WavTokenizerSpec
from wavtokenizer_tpu.api.engine import EngineConfig, ServingEngine
from wavtokenizer_tpu.api.pretrained import WavTokenizer
from wavtokenizer_tpu.models.init import init_wavtokenizer


def _small_wt():
    spec = WavTokenizerSpec()
    params = init_wavtokenizer(spec, random_codebook=True)
    return WavTokenizer(jax.device_put(params), spec)


def test_engine_encode_decode_roundtrip_matches_direct(rng):
    wt = _small_wt()
    cfg = EngineConfig(batch_sizes=(4,), clip_seconds=(0.5,), max_wait_ms=20.0)
    T = int(0.5 * wt.spec.sample_rate)
    clips = [rng.normal(size=T).astype(np.float32) * 0.1 for _ in range(4)]

    with ServingEngine(wt, cfg) as eng:
        futs = [eng.submit("encode", c) for c in clips]
        outs = [f.result(timeout=600) for f in futs]

        # vs the direct (unbatched-by-us, batched-by-hand) API call
        feats_ref, codes_ref = wt.encode_infer(np.stack(clips))
        feats_ref, codes_ref = np.asarray(feats_ref), np.asarray(codes_ref)
        for i, (feats, codes) in enumerate(outs):
            np.testing.assert_array_equal(codes, codes_ref[0, i])
            np.testing.assert_allclose(feats, feats_ref[i], rtol=0, atol=0)

        # decode through the engine == direct decode (same (4, D, T')
        # bucket shape on both paths, so one compiled program serves both)
        wav = eng.decode(outs[0][0])
        wav_ref = np.asarray(wt.decode(feats_ref, bandwidth_id=0))[0]
        np.testing.assert_allclose(wav, wav_ref[:len(wav)], atol=1e-5)

        # the four concurrent encodes should have coalesced into few batches
        assert eng.stats.by_op["encode"] == 4
        assert eng.stats.batches <= 3


def test_engine_detokenize_equals_codes_to_features_decode(rng):
    wt = _small_wt()
    cfg = EngineConfig(batch_sizes=(1,), clip_seconds=(0.5,), max_wait_ms=5.0)
    Tp = int(np.ceil(0.5 * wt.spec.sample_rate / wt.spec.seanet.hop_length))
    codes = rng.integers(0, wt.spec.vq.bins, size=Tp).astype(np.int32)

    with ServingEngine(wt, cfg) as eng:
        wav = eng.detokenize(codes)
    feats = wt.codes_to_features(codes[None, None])
    wav_ref = np.asarray(wt.decode(feats, bandwidth_id=0))[0]
    np.testing.assert_allclose(wav, wav_ref[:len(wav)], atol=1e-5)


def test_engine_pads_short_clips_and_trims_tokens(rng):
    wt = _small_wt()
    hop = wt.spec.seanet.hop_length
    # same (4, 0.5 s) bucket as the roundtrip test -> shared compile cache
    cfg = EngineConfig(batch_sizes=(4,), clip_seconds=(0.5,), max_wait_ms=5.0)
    T_short = int(0.3 * wt.spec.sample_rate)

    with ServingEngine(wt, cfg) as eng:
        feats, codes = eng.encode(rng.normal(size=T_short).astype(np.float32) * 0.1)
    tp = int(np.ceil(T_short / hop))
    assert codes.shape == (tp,)
    assert feats.shape == (512, tp)


def test_engine_rejects_oversized_and_propagates_errors(rng):
    wt = _small_wt()
    cfg = EngineConfig(batch_sizes=(1,), clip_seconds=(0.2,), max_wait_ms=1.0)
    with ServingEngine(wt, cfg) as eng:
        fut = eng.submit("encode",
                         rng.normal(size=int(wt.spec.sample_rate)).astype(np.float32))
        try:
            fut.result(timeout=120)
            raise AssertionError("expected bucket-overflow error")
        except ValueError as e:
            assert "largest bucket" in str(e)
    # closed engine refuses new work
    try:
        eng.submit("encode", np.zeros(10, np.float32))
        raise AssertionError("expected closed-engine error")
    except RuntimeError:
        pass


def test_serve_http_endpoints(rng):
    """serve.py protocol: encode/decode/detokenize over localhost HTTP
    match the direct API (same engine semantics), plus health/stats."""
    import http.client
    import json
    import os
    import sys
    import threading

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools_tpu"))
    import serve

    wt = _small_wt()
    cfg = EngineConfig(batch_sizes=(4,), clip_seconds=(0.5,), max_wait_ms=5.0)
    eng = ServingEngine(wt, cfg)
    httpd = serve.build_server("127.0.0.1", 0, eng, "cpu-test")
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)

        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["device"] == "cpu-test"

        audio = rng.normal(size=int(0.5 * wt.spec.sample_rate)).astype(
            np.float32) * 0.1
        conn.request("POST", "/encode",
                     json.dumps({"audio": serve.encode_tensor(audio)}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        out = json.loads(r.read())
        codes = serve.decode_tensor(out["codes"])
        feats = serve.decode_tensor(out["features"])
        feats_ref, codes_ref = wt.encode_infer(audio[None])
        np.testing.assert_array_equal(codes, np.asarray(codes_ref)[0, 0])
        np.testing.assert_array_equal(feats, np.asarray(feats_ref)[0])

        conn.request("POST", "/detokenize",
                     json.dumps({"codes": serve.encode_tensor(codes)}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        wav = serve.decode_tensor(json.loads(r.read())["audio"])
        assert wav.shape == (len(codes) * wt.spec.seanet.hop_length,)

        # malformed request -> 400 with an error message, server stays up
        conn.request("POST", "/decode", json.dumps({"wrong": 1}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 400 and "error" in json.loads(r.read())

        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests"] >= 2 and stats["by_op"]["encode"] == 1
    finally:
        httpd.shutdown()
        eng.close()


def test_engine_sharded_over_data_mesh(rng):
    """Pod-scale serving: an engine given an 8-device mesh shards each
    bucket over 'data' and returns the same results as a single-device
    engine (params replicated by the caller)."""
    import jax
    from wavtokenizer_tpu.parallel.mesh import make_mesh, replicate

    spec = WavTokenizerSpec()
    params = init_wavtokenizer(spec, random_codebook=True)
    mesh = make_mesh(8, model_parallel=1)
    wt_sharded = WavTokenizer(replicate(mesh, params), spec)
    wt_plain = WavTokenizer(jax.device_put(params), spec)
    # the facade must not silently collapse the caller's placement
    leaf = jax.tree_util.tree_leaves(wt_sharded.params)[0]
    assert len(leaf.sharding.device_set) == 8, leaf.sharding

    cfg = EngineConfig(batch_sizes=(8,), clip_seconds=(0.5,), max_wait_ms=20.0)
    T = int(0.5 * wt_plain.spec.sample_rate)
    clips = [rng.normal(size=T).astype(np.float32) * 0.1 for _ in range(8)]

    with ServingEngine(wt_sharded, cfg, mesh=mesh) as eng:
        outs = [f.result(timeout=600)
                for f in [eng.submit("encode", c) for c in clips]]
        wav_sharded = eng.detokenize(outs[0][1])
    with ServingEngine(wt_plain, cfg) as eng:
        outs_ref = [f.result(timeout=600)
                    for f in [eng.submit("encode", c) for c in clips]]
        wav_ref = eng.detokenize(outs_ref[0][1])

    for (f1, c1), (f2, c2) in zip(outs, outs_ref):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_allclose(f1, f2, atol=0)
    np.testing.assert_allclose(wav_sharded, wav_ref, atol=1e-5)

    # bucket not divisible by the data axis -> explicit constructor error
    try:
        ServingEngine(wt_sharded,
                      EngineConfig(batch_sizes=(4, 6), clip_seconds=(0.5,)),
                      mesh=mesh)
        raise AssertionError("expected divisibility error")
    except ValueError as e:
        assert "divisible" in str(e)


def test_engine_oversized_request_does_not_poison_batch(rng):
    """Per-request bucket validation in submit(): an oversized clip fails
    only its own future; a valid request coalesced in the same window
    still succeeds."""
    wt = _small_wt()
    cfg = EngineConfig(batch_sizes=(4,), clip_seconds=(0.5,),
                       max_wait_ms=50.0)
    T = int(0.5 * wt.spec.sample_rate)
    with ServingEngine(wt, cfg) as eng:
        good = eng.submit("encode", rng.normal(size=T).astype(np.float32) * 0.1)
        bad = eng.submit("encode",
                         rng.normal(size=10 * T).astype(np.float32))
        try:
            bad.result(timeout=60)
            raise AssertionError("expected bucket-overflow error")
        except ValueError:
            pass
        feats, codes = good.result(timeout=600)   # must NOT raise
        assert codes.shape[-1] == int(np.ceil(T / wt.spec.seanet.hop_length))


def test_engine_submit_validates_shape_and_dtype(rng):
    """Malformed payloads fail ONLY their own future, at submit time —
    stereo (2, T) encode, decode with the wrong feature dim, float codes —
    while a well-formed request coalesced around them still succeeds
    (ADVICE r1 #1: ndim/dtype used to slip through to _dispatch_inner and
    poison the whole batch)."""
    wt = _small_wt()
    cfg = EngineConfig(batch_sizes=(2,), clip_seconds=(0.5,), max_wait_ms=20.0)
    T = int(0.5 * wt.spec.sample_rate)
    D = wt.spec.backbone.input_channels

    with ServingEngine(wt, cfg) as eng:
        bad = [
            eng.submit("encode", rng.normal(size=(2, T)).astype(np.float32)),
            eng.submit("encode", np.zeros(T, np.int32)),
            eng.submit("decode", np.zeros((D + 1, 10), np.float32)),
            eng.submit("decode", np.zeros((10,), np.float32)),
            eng.submit("detokenize", np.zeros(10, np.float32)),
        ]
        good = eng.submit("encode", rng.normal(size=T).astype(np.float32) * 0.1)
        for fut in bad:
            with np.testing.assert_raises(ValueError):
                fut.result(timeout=60)
        feats, codes = good.result(timeout=600)
        assert feats.shape[0] == D


def test_engine_blocking_helpers_honor_timeout(rng):
    """encode()/decode()/detokenize() pass cfg.request_timeout_s (or the
    per-call override) to Future.result so callers can't hang forever on a
    wedged worker (ADVICE r1 #2)."""
    import concurrent.futures

    wt = _small_wt()
    cfg = EngineConfig(batch_sizes=(2,), clip_seconds=(0.5,),
                       request_timeout_s=0.05)
    T = int(0.5 * wt.spec.sample_rate)
    with ServingEngine(wt, cfg) as eng:
        # stand in for a wedged worker: a future that never resolves
        eng.submit = lambda op, payload: cf.Future()
        with np.testing.assert_raises(concurrent.futures.TimeoutError):
            eng.encode(np.zeros(T, np.float32))        # cfg default timeout
        with np.testing.assert_raises(concurrent.futures.TimeoutError):
            eng.decode(np.zeros((wt.spec.backbone.input_channels, 10),
                                np.float32), timeout=0.05)  # per-call


def test_engine_codes_bit_exact_at_arbitrary_lengths(rng):
    """VERDICT r2 Next #6 'Done' criterion: engine-served codes must equal
    ``encode_infer`` at each request's NATURAL length for several
    off-bucket lengths — the engine pads batch rows only, never time, so
    the 100%-token-match north star holds on the serving path too."""
    wt = _small_wt()
    cfg = EngineConfig(batch_sizes=(4,), clip_seconds=(0.5,), max_wait_ms=30.0)
    sr = wt.spec.sample_rate
    lengths = [int(0.5 * sr), int(0.33 * sr), int(0.21 * sr) + 7,
               int(0.49 * sr) - 1]
    clips = [rng.normal(size=t).astype(np.float32) * 0.1 for t in lengths]

    with ServingEngine(wt, cfg) as eng:
        futs = [eng.submit("encode", c) for c in clips]
        outs = [f.result(timeout=1200) for f in futs]

    for clip, (feats, codes) in zip(clips, outs):
        feats_ref, codes_ref = wt.encode_infer(clip[None])
        np.testing.assert_array_equal(codes, np.asarray(codes_ref)[0, 0])
        np.testing.assert_array_equal(feats, np.asarray(feats_ref)[0])

    # decode path too: engine decode == direct decode at natural length
    with ServingEngine(wt, cfg) as eng:
        wav = eng.decode(outs[1][0], timeout=1200)
    wav_ref = np.asarray(wt.decode(np.asarray(outs[1][0])[None],
                                   bandwidth_id=0))[0]
    # engine decode embeds bandwidth_id=0 as a compile-time constant while
    # the facade traces it — same math, potentially different fusion, so
    # float tolerance (codes above stay exact-match).
    np.testing.assert_allclose(wav, wav_ref, atol=1e-5)


def test_engine_program_lru_bounded(rng):
    """The exact-length program cache evicts beyond max_programs."""
    wt = _small_wt()
    cfg = EngineConfig(batch_sizes=(1,), clip_seconds=(0.2,),
                       max_wait_ms=1.0, max_programs=2)
    sr = wt.spec.sample_rate
    with ServingEngine(wt, cfg) as eng:
        for t in (int(0.05 * sr), int(0.08 * sr), int(0.11 * sr)):
            eng.encode(rng.normal(size=t).astype(np.float32) * 0.1,
                       timeout=1200)
        assert len(eng._programs) <= 2
