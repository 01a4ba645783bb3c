"""Concurrent micro-batching server: coalescing, grouping, futures,
error propagation, shutdown."""
import threading

import numpy as np
import pytest

from echo_tts_tpu.serve.batcher import BatchRequest
from echo_tts_tpu.serve.server import MicroBatchServer

FAST = {"num_steps": 2, "sequence_length": 8}


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
