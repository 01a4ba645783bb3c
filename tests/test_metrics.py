"""Metrics registry (serve/metrics.py) + its serving wire-up: counters/
gauges/histograms, the health-check and {"action": "metrics"} surfaces,
queue stats, and the ECHO_METRICS_FILE export (VERDICT r4 item 6 — the
reference has structured logs but no metrics export, SURVEY §5)."""
import json
import threading

import pytest

from echo_tts_tpu.serve import metrics


@pytest.fixture(autouse=True)
def fresh_registry():
    metrics.reset()
    yield
    metrics.reset()


def test_counter_and_gauge():
    metrics.counter("c").inc()
    metrics.counter("c").inc(4)
    metrics.gauge("g").set(7.5)
    snap = metrics.snapshot()
    assert snap["c"] == 5
    assert snap["g"] == 7.5


def test_histogram_percentiles_and_lifetime():
    h = metrics.histogram("h", window=100)
    for v in range(1, 201):          # 1..200; window keeps last 100
        h.observe(float(v))
    s = h.snapshot()
    assert s["count"] == 200 and s["min"] == 1.0 and s["max"] == 200.0
    assert s["sum"] == sum(range(1, 201))
    # window holds 101..200 -> p50 about 150
    assert 145 <= s["p50"] <= 155
    assert s["p99"] >= 195
    assert s["window"] == 100


def test_type_conflict_raises():
    metrics.counter("x")
    with pytest.raises(TypeError):
        metrics.gauge("x")


def test_thread_safety_counts_exactly():
    c = metrics.counter("racy")
    h = metrics.histogram("racy_h", window=64)

    def work():
        for _ in range(500):
            c.inc()
            h.observe(1.0)

    threads = [threading.Thread(target=work) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert c.value == 4000
    assert h.snapshot()["count"] == 4000


def test_write_metrics_file_atomic(tmp_path):
    metrics.counter("jobs").inc(3)
    path = tmp_path / "metrics.json"
    metrics.write_metrics_file(str(path), extra={"batch_queue": {"d": 1}})
    payload = json.loads(path.read_text())
    assert payload["metrics"]["jobs"] == 3
    assert payload["batch_queue"] == {"d": 1}
    assert "time" in payload
    assert not list(tmp_path.glob("*.tmp.*"))  # tmp renamed away


def test_handler_counts_requests_errors_and_writes_file(tmp_path,
                                                        monkeypatch):
    """The handler entry increments requests/errors and dumps the
    metrics file after every job when ECHO_METRICS_FILE is set."""
    from echo_tts_tpu.serve import handler as h
    from echo_tts_tpu.serve.config import load_config

    mfile = tmp_path / "m.json"
    cfg = load_config({"ECHO_METRICS_FILE": str(mfile),
                       "AUDIO_VOICES_DIR": str(tmp_path),
                       "OUTPUT_AUDIO_DIR": str(tmp_path),
                       "HF_TOKEN": "x"})
    out = h.handler({"input": {}}, cfg=cfg)  # missing text -> error
    assert out["error_type"] == "ValueError"
    snap = metrics.snapshot()
    assert snap["requests_total"] == 1
    assert snap["errors_total"] == 1
    assert snap["errors_ValueError"] == 1
    payload = json.loads(mfile.read_text())
    assert payload["metrics"]["errors_total"] == 1


def test_metrics_action_and_health_check_surface(tiny_models, tmp_path):
    from echo_tts_tpu.serve import handler as h
    from echo_tts_tpu.serve.config import load_config
    from echo_tts_tpu.serve.server import MicroBatchServer

    cfg = load_config({"AUDIO_VOICES_DIR": str(tmp_path),
                       "OUTPUT_AUDIO_DIR": str(tmp_path),
                       "HF_TOKEN": "x"})
    srv = MicroBatchServer(tiny_models, max_batch=2, max_wait_s=0.01)
    try:
        metrics.counter("requests_total").inc(2)
        out = h.handler({"input": {"action": "metrics"}}, cfg=cfg,
                        batch_server=srv)
        assert out["metrics"]["requests_total"] == 2
        assert out["batch_queue"]["max_batch"] == 2

        health = h.health_check(cfg, batch_server=srv)
        assert "metrics" in health
        assert health["batch_queue"]["queue_depth"] == 0
        assert health["dit_quant"] in ("none", "int8")
    finally:
        srv.shutdown()


def test_synthesize_observes_stage_histograms(tiny_models, tmp_path):
    """A successful synthesis populates per-stage latency histograms and
    the rolling rtf histogram."""
    from echo_tts_tpu.serve import handler as h
    from echo_tts_tpu.serve.config import load_config

    cfg = load_config({"AUDIO_VOICES_DIR": str(tmp_path),
                       "OUTPUT_AUDIO_DIR": str(tmp_path / "out"),
                       "HF_TOKEN": "x"})
    out = h.synthesize(
        {"text": "Metrics test.",
         "parameters": {"num_steps": 2, "sequence_length": 8}},
        cfg=cfg, models=tiny_models)
    assert out["status"] == "success"
    snap = metrics.snapshot()
    assert snap["rtf"]["count"] == 1
    assert snap["stage_synthesis_seconds"]["count"] == 1
    assert snap["request_seconds"]["count"] == 1
