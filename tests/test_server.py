"""Concurrent micro-batching server: coalescing, grouping, futures,
error propagation, shutdown — plus the production hardening surface
(bounded queue, per-request deadlines incl. the wedged-device watchdog,
cancellation, drainless shutdown, stats)."""
import threading
import time

import numpy as np
import pytest

from echo_tts_tpu.serve.batcher import BatchRequest
from echo_tts_tpu.serve.server import MicroBatchServer, QueueFullError

FAST = {"num_steps": 2, "sequence_length": 8}


class _Wedge:
    """Monkeypatched run_batch stand-in that blocks until released —
    simulates a wedged (or just slow) device call."""

    def __init__(self, real):
        self.real = real
        self.release = threading.Event()
        self.entered = threading.Event()

    def __call__(self, models, reqs, *a, **kw):
        self.entered.set()
        assert self.release.wait(timeout=60), "wedge never released"
        return self.real(models, reqs, *a, **kw)


@pytest.fixture()
def server(tiny_models):
    srv = MicroBatchServer(tiny_models, max_batch=4, max_wait_s=0.2)
    yield srv
    srv.shutdown()


def test_concurrent_requests_batched(server):
    """8 concurrent submissions with identical params resolve correctly;
    each result equals what the request would produce alone (batcher
    parity is covered in test_batcher; here we check routing)."""
    futs = [server.submit(BatchRequest(f"Request number {i}.", seed=i,
                                       request_id=str(i)), FAST)
            for i in range(8)]
    results = [f.result(timeout=300) for f in futs]
    assert [r.request_id for r in results] == [str(i) for i in range(8)]
    for r in results:
        assert r.audio.ndim == 2 and np.isfinite(r.audio).all()
        assert r.normalized_text.startswith("[S1] ")


def test_mixed_params_grouped_separately(server):
    f1 = server.submit(BatchRequest("Two steps.", seed=1,
                                    request_id="a"), FAST)
    f2 = server.submit(BatchRequest("Four steps.", seed=2, request_id="b"),
                       {"num_steps": 4, "sequence_length": 8})
    r1, r2 = f1.result(timeout=300), f2.result(timeout=300)
    assert r1.request_id == "a" and r2.request_id == "b"


def test_submission_from_many_threads(server):
    results = {}

    def worker(i):
        fut = server.submit(BatchRequest(f"Thread {i}.", seed=i,
                                         request_id=str(i)), FAST)
        results[i] = fut.result(timeout=300)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == list(range(6))


def test_odd_group_padded_to_warmed_bucket(server, tiny_models,
                                           monkeypatch):
    """Groups are padded to presets.batch_size_buckets sizes — the only
    batch programs warmup compiles — and padding never changes a real
    request's result (padded rows are discarded)."""
    from echo_tts_tpu.serve import server as srv_mod
    from echo_tts_tpu.serve.batcher import run_batch

    sizes = []
    real = srv_mod.run_batch

    def spy(models, reqs, *a, **kw):
        sizes.append(len(reqs))
        return real(models, reqs, *a, **kw)

    monkeypatch.setattr(srv_mod, "run_batch", spy)
    reqs = [BatchRequest(f"Odd request {i}.", seed=50 + i,
                         request_id=str(i)) for i in range(3)]
    futs = [server.submit(r, FAST) for r in reqs]
    results = [f.result(timeout=300) for f in futs]

    # max_batch=4 -> every executed batch size is a warmed bucket
    assert sizes and all(s in (1, 2, 4) for s in sizes), sizes
    singles = [run_batch(tiny_models, [r], dict(FAST))[0] for r in reqs]
    for got, want in zip(results, singles):
        assert got.request_id == want.request_id
        np.testing.assert_allclose(got.audio, want.audio, atol=2e-4)


def test_error_propagates_to_future(server):
    bad = BatchRequest("x", seed=0)
    fut = server.submit(bad, {"num_steps": 2, "sequence_length": 8,
                              "nonsense_key": 1})
    with pytest.raises(TypeError):
        fut.result(timeout=300)


def test_shutdown_rejects_new_work(tiny_models):
    srv = MicroBatchServer(tiny_models, max_batch=2, max_wait_s=0.01)
    srv.shutdown()
    with pytest.raises(RuntimeError):
        srv.submit(BatchRequest("nope", seed=0), FAST)


def test_bounded_queue_backpressure(tiny_models, monkeypatch):
    """With the device wedged, intake fills to max_queue then submit
    raises QueueFullError instead of accepting unbounded work."""
    from echo_tts_tpu.serve import server as srv_mod

    wedge = _Wedge(srv_mod.run_batch)
    monkeypatch.setattr(srv_mod, "run_batch", wedge)
    srv = MicroBatchServer(tiny_models, max_batch=1, max_wait_s=0.01,
                           max_queue=2)
    try:
        first = srv.submit(BatchRequest("Wedge.", seed=0), FAST)
        assert wedge.entered.wait(timeout=30)  # executor holds the device
        q1 = srv.submit(BatchRequest("Queued one.", seed=1), FAST)
        q2 = srv.submit(BatchRequest("Queued two.", seed=2), FAST)
        with pytest.raises(QueueFullError):
            srv.submit(BatchRequest("Overflow.", seed=3), FAST)
        assert srv.stats()["queue_depth"] == 2
        wedge.release.set()
        for f in (first, q1, q2):
            assert f.result(timeout=300).audio.ndim == 2
    finally:
        wedge.release.set()
        srv.shutdown()


def test_deadline_expired_in_queue(tiny_models, monkeypatch):
    """A request whose deadline lapses while queued fails with
    TimeoutError at dispatch time, without paying device time."""
    from echo_tts_tpu.serve import server as srv_mod

    wedge = _Wedge(srv_mod.run_batch)
    monkeypatch.setattr(srv_mod, "run_batch", wedge)
    srv = MicroBatchServer(tiny_models, max_batch=1, max_wait_s=0.01)
    try:
        first = srv.submit(BatchRequest("Wedge.", seed=0), FAST)
        assert wedge.entered.wait(timeout=30)
        doomed = srv.submit(BatchRequest("Too late.", seed=1), FAST,
                            deadline_s=0.05)
        time.sleep(0.2)            # let the deadline lapse while queued
        wedge.entered.clear()
        wedge.release.set()
        with pytest.raises(TimeoutError):
            doomed.result(timeout=300)
        assert first.result(timeout=300).audio.ndim == 2
        assert srv.stats()["expired"] == 1
    finally:
        wedge.release.set()
        srv.shutdown()


def test_wedged_device_watchdog_times_out_inflight(tiny_models,
                                                   monkeypatch):
    """A deadline-carrying request whose DEVICE call wedges fails with
    TimeoutError while the call is still stuck, and the batch thread
    survives to serve the next request (VERDICT r4 weak #4)."""
    from echo_tts_tpu.serve import server as srv_mod

    wedge = _Wedge(srv_mod.run_batch)
    monkeypatch.setattr(srv_mod, "run_batch", wedge)
    srv = MicroBatchServer(tiny_models, max_batch=1, max_wait_s=0.01)
    try:
        fut = srv.submit(BatchRequest("Wedged forever.", seed=0), FAST,
                         deadline_s=0.1)
        assert wedge.entered.wait(timeout=30)
        # the future fails while run_batch is STILL blocked
        with pytest.raises(TimeoutError):
            fut.result(timeout=30)
        assert srv.stats()["expired"] == 1
        # unwedge; the late device result is discarded (done() guard)
        # and the loop keeps serving
        monkeypatch.setattr(srv_mod, "run_batch", wedge.real)
        wedge.release.set()
        nxt = srv.submit(BatchRequest("Still alive.", seed=1), FAST)
        assert nxt.result(timeout=300).audio.ndim == 2
    finally:
        wedge.release.set()
        srv.shutdown()


def test_cancel_before_dispatch(tiny_models, monkeypatch):
    from echo_tts_tpu.serve import server as srv_mod

    wedge = _Wedge(srv_mod.run_batch)
    monkeypatch.setattr(srv_mod, "run_batch", wedge)
    srv = MicroBatchServer(tiny_models, max_batch=1, max_wait_s=0.01)
    try:
        first = srv.submit(BatchRequest("Wedge.", seed=0), FAST)
        assert wedge.entered.wait(timeout=30)
        doomed = srv.submit(BatchRequest("Changed my mind.", seed=1), FAST)
        assert doomed.cancel()
        wedge.release.set()
        assert first.result(timeout=300).audio.ndim == 2
        assert doomed.cancelled()
        deadline = time.monotonic() + 30
        while (srv.stats()["cancelled"] != 1
               and time.monotonic() < deadline):
            time.sleep(0.01)
        assert srv.stats()["cancelled"] == 1
    finally:
        wedge.release.set()
        srv.shutdown()


def test_shutdown_drains_inflight_by_default(tiny_models):
    srv = MicroBatchServer(tiny_models, max_batch=2, max_wait_s=0.01)
    futs = [srv.submit(BatchRequest(f"Drain {i}.", seed=i), FAST)
            for i in range(3)]
    srv.shutdown(wait=True)  # default drain=True
    for f in futs:
        assert f.result(timeout=0).audio.ndim == 2  # already resolved


def test_shutdown_drain_false_cancels_queued(tiny_models, monkeypatch):
    from echo_tts_tpu.serve import server as srv_mod

    wedge = _Wedge(srv_mod.run_batch)
    monkeypatch.setattr(srv_mod, "run_batch", wedge)
    srv = MicroBatchServer(tiny_models, max_batch=1, max_wait_s=0.01)
    try:
        first = srv.submit(BatchRequest("Wedge.", seed=0), FAST)
        assert wedge.entered.wait(timeout=30)
        queued = srv.submit(BatchRequest("Never runs.", seed=1), FAST)
        srv.shutdown(wait=False, drain=False)
        assert queued.cancelled()
        wedge.release.set()
        assert first.result(timeout=300).audio.ndim == 2
    finally:
        wedge.release.set()
        srv.shutdown()


def test_stats_shape(server):
    fut = server.submit(BatchRequest("Stats please.", seed=0), FAST)
    fut.result(timeout=300)
    s = server.stats()
    assert s["submitted"] >= 1 and s["completed"] >= 1
    assert s["max_queue"] == 16 * server.max_batch
    assert s["queue_depth"] == 0 and not s["shutdown"]
    assert s["batches"] >= 1 and s["mean_occupancy"] >= 1.0
