"""Production serving engine: dynamic micro-batching over shape buckets.

The reference serves one request at a time (infer.py:31-70 loops files
through ``encode_infer``/``decode`` individually).  On TPU that wastes the
chip: XLA programs are compiled per shape and the MXU wants large batches.
This engine is the TPU-idiomatic serving layer the reference never had:

* **Exact-length programs, batch buckets.**  Requests are grouped by their
  EXACT length and batched along the batch axis only (padding extra batch
  rows with zeros — rows are independent through every op, so other
  requests' outputs are untouched).  Length is never padded: zero-padding
  time changes conv edge frames AND, in the decode path, the pos-net
  attention softmax over every frame — so the engine serves each distinct
  length with its own compiled program and is **bit-exact** against
  ``WavTokenizer.encode_infer``/``decode`` at the clip's natural length
  (the BASELINE.json 100% token-match north star, engine path included).
  Programs are LRU-bounded (``max_programs``): serving a bounded set of
  hot lengths (the common case — fixed-crop corpora, chunked streaming)
  never recompiles; unbounded length diversity recompiles at the LRU rate.
* **Dynamic micro-batching.**  A background thread drains a queue,
  coalesces concurrent requests for the same bucket into one device call,
  and fans results back out to per-request futures — the standard
  continuous-batching pattern, applied to codec tokenize/detokenize.
* **Three ops.**  ``encode`` (audio -> features+codes, the tokenizer path),
  ``decode`` (features -> audio), ``detokenize`` (codes -> audio, the
  audio-LM serving path = codes_to_features + decode,
  ref decoder/pretrained.py:209-239 then :192-207).

``clip_seconds`` retains two roles: the largest value caps request length
(chunk longer audio via api.streaming), and warmup() pre-compiles each
(batch bucket x clip bucket) so the canonical 3 s shapes never compile in
the serving path.
"""

from __future__ import annotations

import math
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field


def _resolve(fut: Future, value) -> None:
    """Deliver a result unless the caller already cancelled the future —
    set_result on a cancelled Future raises InvalidStateError, which would
    otherwise be fanned out as a failure to every OTHER request in the
    same coalesced batch.  set_running_or_notify_cancel() is the race-free
    gate: it fails for cancelled futures and blocks cancel() afterwards."""
    if fut.set_running_or_notify_cancel():
        fut.set_result(value)


@dataclass
class EngineConfig:
    batch_sizes: tuple = (1, 8, 32)     # per-bucket max batch, ascending
    clip_seconds: tuple = (3.0,)        # length buckets, ascending
    max_wait_ms: float = 4.0            # linger for batch coalescing
    max_queue: int = 4096
    # Default Future.result timeout for the blocking helpers encode()/
    # decode()/detokenize().  None = wait forever; set it when callers must
    # not hang on a wedged worker (e.g. killed mid cold-compile after
    # close()).  Cold compiles on this stack can take ~20 min, so any
    # finite default would break first-call-compiles — opt in explicitly.
    request_timeout_s: float | None = None
    # LRU capacity for exact-length compiled programs (per engine, across
    # ops).  Each distinct (op, batch bucket, length) holds one executable.
    max_programs: int = 32


@dataclass
class EngineStats:
    requests: int = 0
    batches: int = 0
    by_op: dict = field(default_factory=dict)

    @property
    def mean_batch_occupancy(self) -> float:
        return self.requests / max(self.batches, 1)

    def snapshot(self) -> dict:
        """Consistent copy for cross-thread readers (/stats handlers)."""
        with _STATS_LOCK:
            return {"requests": self.requests, "batches": self.batches,
                    "mean_batch_occupancy": self.mean_batch_occupancy,
                    "by_op": dict(self.by_op)}


# Counters are written by the engine worker thread and read by HTTP handler
# threads; a single module-level lock keeps (requests, batches, by_op)
# mutually consistent.  Contention is nil (one writer, rare readers).
_STATS_LOCK = threading.Lock()


class ServingEngine:
    """Micro-batching server around a loaded ``WavTokenizer``.

    >>> eng = ServingEngine(wt)
    >>> fut = eng.submit("encode", audio_np)     # non-blocking
    >>> feats, codes = fut.result()
    >>> wav = eng.detokenize(codes_np)           # blocking convenience
    """

    def __init__(self, wt, config: EngineConfig | None = None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — device batches are sharded
        over its 'data' axis so one engine drives a whole slice (pod-scale
        data-parallel serving; every bucket batch size must be divisible by
        the data-axis length)."""
        import numpy as np
        self._np = np
        self.wt = wt
        self.cfg = config = config if config is not None else EngineConfig()
        self.mesh = mesh
        if mesh is not None:
            ndata = mesh.shape["data"]
            bad = [b for b in config.batch_sizes if b % ndata]
            if bad:
                raise ValueError(
                    f"batch buckets {bad} not divisible by data axis {ndata}")
        self.hop = wt.spec.seanet.hop_length
        self.sr = wt.spec.sample_rate
        self.stats = EngineStats()
        from collections import OrderedDict
        self._programs: "OrderedDict" = OrderedDict()
        self._q: queue.Queue = queue.Queue(maxsize=config.max_queue)
        self._closed = False
        self._lifecycle = threading.Lock()   # serializes submit vs close
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="wt-serving-engine")
        self._worker.start()

    # ---- public API ----------------------------------------------------

    def submit(self, op: str, payload) -> Future:
        """op in {encode, decode, detokenize}; returns a Future.

        encode: (T,) float audio -> (features (D, T'), codes (T',))
        decode: (D, T') features -> (T,) float audio
        detokenize: (T',) int codes -> (T,) float audio

        Payloads are shape/dtype/bucket-validated HERE (per request) so a
        malformed or oversized payload fails only its own future and can
        never poison the batch it would have been coalesced with.
        """
        if op not in ("encode", "decode", "detokenize"):
            raise ValueError(op)
        np = self._np
        fut: Future = Future()
        try:
            arr = np.asarray(payload)
            if op == "encode":
                if arr.ndim != 1 or not np.issubdtype(arr.dtype, np.floating):
                    raise ValueError(
                        f"encode expects 1-D float audio (T,), got "
                        f"shape {arr.shape} dtype {arr.dtype}")
                self._bucket_samples(arr.shape[-1])
            elif op == "decode":
                dim = self.wt.spec.backbone.input_channels
                if (arr.ndim != 2 or arr.shape[0] != dim
                        or not np.issubdtype(arr.dtype, np.floating)):
                    raise ValueError(
                        f"decode expects 2-D float features ({dim}, T'), "
                        f"got shape {arr.shape} dtype {arr.dtype}")
                self._bucket_frames(arr.shape[-1])
            else:  # detokenize
                if arr.ndim != 1 or not np.issubdtype(arr.dtype, np.integer):
                    raise ValueError(
                        f"detokenize expects 1-D int codes (T',), got "
                        f"shape {arr.shape} dtype {arr.dtype}")
                self._bucket_frames(arr.shape[-1])
        except ValueError as e:
            fut.set_exception(e)
            return fut
        with self._lifecycle:
            if self._closed:
                raise RuntimeError("engine closed")
            self._q.put((op, arr, fut))
        return fut

    def encode(self, audio, timeout: float | None = None):
        return self.submit("encode", audio).result(
            timeout if timeout is not None else self.cfg.request_timeout_s)

    def decode(self, features, timeout: float | None = None):
        return self.submit("decode", features).result(
            timeout if timeout is not None else self.cfg.request_timeout_s)

    def detokenize(self, codes, timeout: float | None = None):
        return self.submit("detokenize", codes).result(
            timeout if timeout is not None else self.cfg.request_timeout_s)

    def warmup(self) -> None:
        """Pre-compile every (op, bucket) program so first real requests
        never hit a compile."""
        np = self._np
        dim = self.wt.spec.backbone.input_channels
        for secs in self.cfg.clip_seconds:
            T = int(secs * self.sr)
            Tp = math.ceil(T / self.hop)
            for b in self.cfg.batch_sizes:
                self._run_encode(np.zeros((b, T), np.float32))
                self._run_decode(np.zeros((b, dim, Tp), np.float32))
                self._run_detok(np.zeros((b, Tp), np.int32))

    def close(self) -> None:
        with self._lifecycle:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=30)
        # Only drain once the worker is actually gone: if it is still busy
        # (e.g. mid-cold-compile) the queue still holds ITS sentinel and
        # pending work it will legitimately serve — draining now would both
        # wrongly fail those requests and eat the sentinel, leaving the
        # worker blocked on q.get() forever.
        if self._worker.is_alive():
            return
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item[2].done():
                item[2].set_exception(RuntimeError("engine closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- batching loop -------------------------------------------------

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            batch = [item]
            # linger briefly to coalesce same-op requests
            deadline = time.perf_counter() + self.cfg.max_wait_ms / 1e3
            max_b = self.cfg.batch_sizes[-1]
            while len(batch) < max_b:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._dispatch(batch)
                    return
                if nxt[0] != batch[0][0]:   # different op: flush, restart
                    self._dispatch(batch)
                    batch = [nxt]
                    deadline = time.perf_counter() + self.cfg.max_wait_ms / 1e3
                    continue
                batch.append(nxt)
            self._dispatch(batch)

    def _bucket_batch(self, n: int) -> int:
        for b in self.cfg.batch_sizes:
            if n <= b:
                return b
        return self.cfg.batch_sizes[-1]

    def _bucket_samples(self, t: int) -> int:
        for secs in self.cfg.clip_seconds:
            if t <= int(secs * self.sr):
                return int(secs * self.sr)
        raise ValueError(
            f"clip of {t} samples exceeds the largest bucket "
            f"({self.cfg.clip_seconds[-1]} s); chunk long audio via "
            "api.streaming first")

    def _bucket_frames(self, tp: int) -> int:
        """Frame-count bucket: capacity of each sample bucket in frames
        (= ceil(samples / hop), matching warmup's shapes)."""
        for secs in self.cfg.clip_seconds:
            cap = math.ceil(int(secs * self.sr) / self.hop)
            if tp <= cap:
                return cap
        raise ValueError(
            f"{tp} frames exceeds the largest bucket "
            f"({self.cfg.clip_seconds[-1]} s); chunk long audio via "
            "api.streaming first")

    def _dispatch(self, batch) -> None:
        op = batch[0][0]
        try:
            self._dispatch_inner(op, batch)
        except Exception as e:  # fan the failure out to every waiter
            for _, _, fut in batch:
                try:
                    if not fut.done():
                        fut.set_exception(e)
                except Exception:   # lost a cancel race; nothing to deliver
                    pass

    def _dispatch_inner(self, op, batch) -> None:
        np = self._np
        with _STATS_LOCK:
            self.stats.requests += len(batch)
            self.stats.batches += 1
            self.stats.by_op[op] = self.stats.by_op.get(op, 0) + len(batch)

        # Group by EXACT length: time is never padded (bit-exactness — see
        # module docstring); only batch rows are, and rows are independent.
        groups: dict = {}
        for item, p in zip(batch, (np.asarray(p) for _, p, _ in batch)):
            groups.setdefault(p.shape[-1], []).append((item[2], p))
        for length, items in groups.items():
            B = self._bucket_batch(len(items))
            if op == "encode":
                x = np.zeros((B, length), np.float32)
                for i, (_, p) in enumerate(items):
                    x[i] = p
                feats, codes = self._run_encode(x)
                for i, (fut, _) in enumerate(items):
                    _resolve(fut, (feats[i], codes[0, i]))
            elif op == "decode":
                x = np.zeros((B, items[0][1].shape[0], length), np.float32)
                for i, (_, p) in enumerate(items):
                    x[i] = p
                wav = self._run_decode(x)
                for i, (fut, _) in enumerate(items):
                    _resolve(fut, wav[i])
            else:  # detokenize
                x = np.zeros((B, length), np.int32)
                for i, (_, p) in enumerate(items):
                    x[i] = p
                wav = self._run_detok(x)
                for i, (fut, _) in enumerate(items):
                    _resolve(fut, wav[i])

    # ---- device calls (one LRU-bounded compiled program per exact shape) --

    def _place(self, x):
        """Shard the batch axis over the mesh's 'data' axis (SPMD serving);
        single-device engines pass host arrays straight through."""
        if self.mesh is None:
            return x
        from ..parallel.mesh import shard_batch
        return shard_batch(self.mesh, x)

    def _program(self, op: str, shape: tuple):
        """LRU of per-(op, exact shape) jitted programs.  Each entry is its
        OWN jax.jit instance compiling exactly one shape, so evicting the
        dict entry releases the executable; the facade's shared jit caches
        (unbounded across shapes) are bypassed in the serving path."""
        import jax
        key = (op, shape)
        prog = self._programs.pop(key, None)
        if prog is None:
            from ..models import wavtokenizer as wtm
            spec = self.wt.spec
            if op == "encode":
                prog = jax.jit(lambda params, audio: wtm.encode_infer(
                    params, spec, audio))
            elif op == "decode":
                prog = jax.jit(lambda params, feats: wtm.decode(
                    params, spec, feats, 0))
            else:  # detokenize: codes (K=1, B, T') -> audio
                prog = jax.jit(lambda params, codes: wtm.decode(
                    params, spec, wtm.codes_to_features(params, codes), 0))
        self._programs[key] = prog
        while len(self._programs) > self.cfg.max_programs:
            self._programs.popitem(last=False)
        return prog

    def _run_encode(self, x):
        np = self._np
        feats, codes = self._program("encode", x.shape)(
            self.wt.params, self._place(x))
        return np.asarray(feats), np.asarray(codes)

    def _run_decode(self, x):
        return self._np.asarray(self._program("decode", x.shape)(
            self.wt.params, self._place(x)))

    def _run_detok(self, codes):
        np = self._np
        x = codes[None]                        # (K=1, B, T')
        if self.mesh is not None:              # batch is axis 1 here
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            x = jax.device_put(x, NamedSharding(self.mesh, P(None, "data")))
        return np.asarray(self._program("detokenize", x.shape)(
            self.wt.params, x))
