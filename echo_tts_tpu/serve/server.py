"""Concurrent micro-batching server loop.

The reference scales by share-nothing queue workers (one request at a time
per GPU, SURVEY.md §2e); a TPU chip is better fed by coalescing concurrent
requests into one batch (serve/batcher.py).  This module is the loop that
does it: callers submit from any thread and receive a Future; a single
executor thread drains the queue, groups compatible requests (identical
sampler params), pads speaker references to a shared bucket, runs one
batched sampler+decode pass, and resolves the futures.

One executor thread == one device stream; JAX dispatch itself is
thread-safe but serializing device work through one loop keeps HBM
footprint bounded and batches maximal.

Honest economics on this model (docs/PERFORMANCE.md §7): the B=1
sampler already runs ~94% MFU, so batching is roughly THROUGHPUT-NEUTRAL
on-chip — its value here is bounded HBM, per-dispatch amortization, and
fairness under concurrency, not a large audio-sec/sec multiplier.  Each
distinct batch size B compiles its own full-size program, and the drain
window can gather ANY count 1..max_batch — so groups are PADDED (last
request repeated, padded outputs discarded) to the bounded bucket set
presets.batch_size_buckets(max_batch), which is also exactly what
--warmup-compile warms.  No arrival count pays a compile at traffic
time; padding costs at most one bucket step of throughput on a
~throughput-neutral operation.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

from ..pipeline.pipeline import EchoModels
from .batcher import BatchRequest, BatchResult, group_compatible, run_batch
from .presets import pick_batch_bucket


class MicroBatchServer:
    def __init__(self, models: EchoModels, *, max_batch: int = 8,
                 max_wait_s: float = 0.05,
                 speaker_bucket: Optional[int] = None):
        self.models = models
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self.speaker_bucket = speaker_bucket
        self._q: "queue.Queue[Tuple[BatchRequest, Dict, Future]]" = (
            queue.Queue())
        self._stop = threading.Event()
        self._submit_lock = threading.Lock()  # orders submit vs shutdown
        # Serializes DEVICE work: the executor holds it per batched pass,
        # and co-resident non-queue work (e.g. a streaming job running
        # beside this server, serve/handler.serve_stdin_concurrent) must
        # hold it too — two concurrent dispatch streams would otherwise
        # co-locate a padded B=8 sampler+decode and a blockwise stream's
        # KV in HBM at once (the 16 GB v5e has OOMed on less; bench.py
        # note on the B=8 decode).
        self.device_lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="echo-batch-executor")
        self._thread.start()

    def submit(self, request: BatchRequest,
               sampler_params: Optional[Dict] = None) -> "Future[BatchResult]":
        """Thread-safe; returns a Future resolving to a BatchResult."""
        with self._submit_lock:
            # check-then-put under the same lock as shutdown's set-then-put,
            # so no request can land behind the stop sentinel unserviced
            if self._stop.is_set():
                raise RuntimeError("server is shut down")
            fut: Future = Future()
            self._q.put((request, dict(sampler_params or {}), fut))
            return fut

    def shutdown(self, wait: bool = True) -> None:
        with self._submit_lock:
            self._stop.set()
            self._q.put(None)  # wake the loop
        if wait:
            self._thread.join()

    # ------------------------------------------------------------------
    def _drain(self) -> List[Tuple[BatchRequest, Dict, Future]]:
        """Block for one item, then opportunistically gather more for up to
        max_wait_s (or until max_batch)."""
        first = self._q.get()
        if first is None:
            return []
        items = [first]
        while len(items) < self.max_batch:
            try:
                nxt = self._q.get(timeout=self.max_wait_s)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-signal stop after this batch
                break
            items.append(nxt)
        return items

    def _loop(self) -> None:
        while not (self._stop.is_set() and self._q.empty()):
            items = self._drain()
            if not items:
                break
            groups = group_compatible(
                [(req, params) for req, params, _ in items], self.max_batch)
            for idx_group in groups:
                reqs = [items[i][0] for i in idx_group]
                params = items[idx_group[0]][1]
                futs = [items[i][2] for i in idx_group]
                try:
                    # pad to a warmed batch bucket (see module docstring);
                    # padded rows repeat the last request and their
                    # outputs are discarded — per-row seeds keep every
                    # real request's audio identical to the serial path
                    bucket = pick_batch_bucket(len(reqs), self.max_batch)
                    padded = reqs + [reqs[-1]] * (bucket - len(reqs))
                    with self.device_lock:
                        results = run_batch(
                            self.models, padded, params,
                            speaker_bucket=self.speaker_bucket)[:len(reqs)]
                    for fut, res in zip(futs, results):
                        fut.set_result(res)
                except Exception as exc:
                    for fut in futs:
                        if not fut.done():
                            fut.set_exception(exc)
