"""Handler-level concurrency through the MicroBatchServer.

The reference's production mode is one-request-per-worker queue scaling
(reference: handler.py:806-861 + README's RunPod scaling); this repo's
concurrent mode coalesces requests on ONE device instead.  These tests
drive real handler-level synthesis jobs through one shared server and pin
that every per-request result matches the serial path.
"""
import json
import os
import shutil
import threading

import numpy as np
import pytest

import echo_tts_tpu.serve.handler as h
from echo_tts_tpu.pipeline import audio_io
from echo_tts_tpu.serve.config import load_config
from echo_tts_tpu.serve.server import MicroBatchServer


@pytest.fixture(scope="module")
def models(tiny_models):
    return tiny_models


@pytest.fixture
def cfg(tmp_path):
    voices = tmp_path / "voices"
    voices.mkdir()
    return load_config({
        "AUDIO_VOICES_DIR": str(voices),
        "OUTPUT_AUDIO_DIR": str(tmp_path / "out"),
        "HF_TOKEN": "test",
    })


FAST = {"num_steps": 2, "sequence_length": 8}


def _jobs(cfg):
    """4 heterogeneous handler-level jobs: voiceless single-chunk,
    voiceless multi-chunk, voiced, and a distinct-seed repeat."""
    fixture = os.path.join(os.path.dirname(__file__), "data", "voice.wav")
    shutil.copy(fixture, os.path.join(cfg.voices_dir, "v.wav"))
    long_text = ("One sentence for the first chunk here. " * 2
                 + "\n\n" + "And a second paragraph for chunk two. " * 2)
    return [
        {"text": "Hello concurrent world.", "parameters": FAST, "seed": 5,
         "request_id": "job0"},
        {"text": long_text, "parameters": FAST, "seed": 9,
         "max_chars_per_chunk": 90, "boundary_mode": "none",
         "request_id": "job1"},
        {"text": "A cloned voice request.", "parameters": FAST, "seed": 3,
         "speaker_voice": "v.wav", "request_id": "job2"},
        {"text": "Hello concurrent world.", "parameters": FAST, "seed": 6,
         "request_id": "job3"},
    ]


def test_concurrent_requests_match_serial(models, cfg):
    """>=4 concurrent handler-level requests through one MicroBatchServer
    produce, per request, the same audio as the serial path (atol matches
    test_batcher's batched-vs-single envelope)."""
    jobs = _jobs(cfg)

    # Serial ground truth first (fresh request_ids to avoid file clashes)
    serial = [h.synthesize({**j, "request_id": j["request_id"] + "_s"},
                           cfg=cfg, models=models) for j in jobs]

    server = MicroBatchServer(models, max_batch=8, max_wait_s=0.2)
    results = [None] * len(jobs)
    errors = []

    def worker(i, job):
        try:
            results[i] = h.synthesize(job, cfg=cfg, models=models,
                                      batch_server=server)
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append((i, exc))

    try:
        threads = [threading.Thread(target=worker, args=(i, j))
                   for i, j in enumerate(jobs)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
    finally:
        server.shutdown()

    assert not errors, errors
    for job, got, want in zip(jobs, results, serial):
        assert got["status"] == "success"
        md_got, md_want = got["metadata"], want["metadata"]
        assert md_got["num_chunks"] == md_want["num_chunks"]
        assert md_got["seed"] == md_want["seed"]
        a_got, _ = audio_io.read_wav(got["local_path"])
        a_want, _ = audio_io.read_wav(want["local_path"])
        assert a_got.shape == a_want.shape, job["request_id"]
        np.testing.assert_allclose(a_got, a_want, atol=2e-4,
                                   err_msg=job["request_id"])


def test_serve_stdin_concurrent_protocol(models, cfg, monkeypatch):
    """The --concurrent stdin loop end-to-end: jobs (incl. a streaming one
    and a malformed line) flow through, every response arrives exactly
    once, and streaming blocks stay ordered."""
    monkeypatch.setattr(h, "STREAM_CHUNK_SIZES", (4,))
    monkeypatch.setattr(h.models_mod, "load_models",
                        lambda *a, **k: models)
    monkeypatch.setattr(h, "load_config", lambda *a, **k: cfg)
    # handler() reloads config internally; route it to the test cfg
    monkeypatch.setattr(h.models_mod, "models_loaded", lambda: True)

    jobs = [json.dumps({"input": {**j, "_allow_random": True}})
            for j in _jobs(cfg)]
    stream_job = json.dumps({"input": {
        "text": "Streamed.", "stream": True, "chunk_size": 4,
        "num_chunks": 2, "parameters": {"num_steps": 2},
        "request_id": "sjob", "_allow_random": True}})
    lines = jobs[:2] + ["not json", stream_job] + jobs[2:]

    out = []
    h.serve_stdin_concurrent(cfg, max_batch=4, allow_random=True,
                             lines=lines, emit=out.append)

    finals = [o for o in out if o.get("status") == "success"
              and "metadata" in o]
    blocks = [o for o in out if o.get("event") == "block"]
    errs = [o for o in out if "error" in o]
    assert len(errs) == 1 and errs[0]["error_type"] == "JSONDecodeError"
    assert len(blocks) == 2
    assert [b["index"] for b in blocks] == [0, 1]
    ids = sorted(f["metadata"]["request_id"] for f in finals)
    assert ids == ["job0", "job1", "job2", "job3", "sjob"]


def test_serve_stdin_concurrent_two_streams_serialize(models, cfg,
                                                      monkeypatch):
    """Streams run on ONE dedicated worker holding the server's device
    lock: two streams interleaved with batch jobs must each emit their
    blocks in order WITHOUT interleaving with each other (the
    one-device-stream HBM invariant)."""
    monkeypatch.setattr(h, "STREAM_CHUNK_SIZES", (4,))
    monkeypatch.setattr(h.models_mod, "load_models",
                        lambda *a, **k: models)
    monkeypatch.setattr(h, "load_config", lambda *a, **k: cfg)
    monkeypatch.setattr(h.models_mod, "models_loaded", lambda: True)

    def stream_job(rid):
        return json.dumps({"input": {
            "text": "Streamed.", "stream": True, "chunk_size": 4,
            "num_chunks": 2, "parameters": {"num_steps": 2},
            "request_id": rid, "_allow_random": True}})

    batch_job = json.dumps({"input": {
        "text": "Batched.", "parameters": dict(FAST), "seed": 3,
        "request_id": "bjob", "_allow_random": True}})
    lines = [stream_job("s1"), batch_job, stream_job("s2")]

    out = []
    h.serve_stdin_concurrent(cfg, max_batch=4, allow_random=True,
                             lines=lines, emit=out.append)

    blocks = [o for o in out if o.get("event") == "block"]
    assert len(blocks) == 4
    by_stream = {}
    for b in blocks:
        by_stream.setdefault(b["request_id"], []).append(b["index"])
    assert by_stream == {"s1": [0, 1], "s2": [0, 1]}
    # the single stream worker serializes the two streams fully
    order = [b["request_id"] for b in blocks]
    assert order == ["s1", "s1", "s2", "s2"]
    finals = sorted(o["metadata"]["request_id"] for o in out
                    if o.get("status") == "success" and "metadata" in o)
    assert finals == ["bjob", "s1", "s2"]
