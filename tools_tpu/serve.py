#!/usr/bin/env python
"""Codec serving daemon: HTTP front-end over the micro-batching engine.

The reference has no serving story (infer.py loops files offline); this is
the production path for the tokenize/detokenize service pattern: a stdlib
ThreadingHTTPServer accepts concurrent JSON requests, and api.engine
coalesces them into shape-bucketed device batches.  No third-party web
framework (zero-egress image) — stdlib http.server only.

Protocol (JSON bodies; arrays are base64 little-endian with dtype+shape):

  POST /encode     {"audio": <f32 tensor (T,)>}
                   -> {"features": <f32 (D,T')>, "codes": <i32 (T',)>}
  POST /decode     {"features": <f32 (D,T')>}        -> {"audio": <f32 (T,)>}
  POST /detokenize {"codes": <i32 (T',)>}            -> {"audio": <f32 (T,)>}
  GET  /healthz    -> {"ok": true, "device": ...}
  GET  /stats      -> batching stats (requests, batches, occupancy)

Usage:
    python tools_tpu/serve.py --port 8787 \
        [--config c.yaml --checkpoint m.ckpt] \
        [--batch-sizes 1,8,32] [--clip-seconds 3.0] [--warmup]
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def encode_tensor(arr: np.ndarray) -> dict:
    arr = np.ascontiguousarray(arr)
    return {"dtype": str(arr.dtype), "shape": list(arr.shape),
            "data": base64.b64encode(arr.tobytes()).decode()}


def decode_tensor(obj: dict) -> np.ndarray:
    arr = np.frombuffer(base64.b64decode(obj["data"]), dtype=obj["dtype"])
    return arr.reshape(obj["shape"]).copy()


def make_handler(engine, device_kind: str):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True, "device": device_kind})
            elif self.path == "/stats":
                snap = engine.stats.snapshot()
                snap["mean_batch_occupancy"] = round(
                    snap["mean_batch_occupancy"], 3)
                self._reply(200, snap)
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            op = self.path.lstrip("/")
            if op not in ("encode", "decode", "detokenize"):
                self._reply(404, {"error": f"unknown op {op!r}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                if op == "encode":
                    out = engine.submit("encode", decode_tensor(req["audio"]))
                    feats, codes = out.result(timeout=600)
                    self._reply(200, {"features": encode_tensor(feats),
                                      "codes": encode_tensor(codes)})
                elif op == "decode":
                    wav = engine.submit(
                        "decode", decode_tensor(req["features"])).result(600)
                    self._reply(200, {"audio": encode_tensor(wav)})
                else:
                    wav = engine.submit(
                        "detokenize", decode_tensor(req["codes"])).result(600)
                    self._reply(200, {"audio": encode_tensor(wav)})
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                # malformed payload / oversized clip: the caller's fault
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                # engine closed, device failure, timeout: OUR fault — 5xx so
                # load balancers retry elsewhere and health alarms fire
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def build_server(host: str, port: int, engine, device_kind: str
                 ) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port),
                               make_handler(engine, device_kind))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch-sizes", default="1,8,32")
    ap.add_argument("--clip-seconds", default="3.0")
    ap.add_argument("--max-wait-ms", type=float, default=4.0)
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile every bucket before accepting traffic")
    args = ap.parse_args(argv)

    import jax

    from wavtokenizer_tpu.api.engine import EngineConfig, ServingEngine
    from wavtokenizer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.config and args.checkpoint:
        from wavtokenizer_tpu.api.pretrained import WavTokenizer
        wt = WavTokenizer.from_pretrained0802(args.config, args.checkpoint)
    else:
        from wavtokenizer_tpu import WavTokenizerSpec
        from wavtokenizer_tpu.api.pretrained import WavTokenizer
        from wavtokenizer_tpu.models.init import init_wavtokenizer
        spec = WavTokenizerSpec()
        wt = WavTokenizer(init_wavtokenizer(spec, random_codebook=True), spec)
        print("note: random model (no --config/--checkpoint)")

    cfg = EngineConfig(
        batch_sizes=tuple(int(b) for b in args.batch_sizes.split(",")),
        clip_seconds=tuple(float(s) for s in args.clip_seconds.split(",")),
        max_wait_ms=args.max_wait_ms)
    engine = ServingEngine(wt, cfg)
    if args.warmup:
        print("warming up (compiling every bucket)...", flush=True)
        engine.warmup()

    device_kind = jax.devices()[0].device_kind
    httpd = build_server(args.host, args.port, engine, device_kind)
    print(f"serving on http://{args.host}:{httpd.server_address[1]} "
          f"(device: {device_kind})", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
