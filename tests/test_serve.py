"""Serving layer: request contract, validation, health check, chunk seeds.

Mirrors the reference worker behavior (reference: handler.py:609-816) on
tiny models with random weights.
"""
import json
import os

import numpy as np
import pytest

import importlib

h = importlib.import_module("echo_tts_tpu.serve.handler")
from echo_tts_tpu.serve.config import load_config
from echo_tts_tpu.pipeline import audio_io


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


def _fast_params():
    # tiny sampler params so synthesis is quick on CPU
    return {"num_steps": 2, "sequence_length": 8}


def test_build_sample_fn_rejects_unknown():
    with pytest.raises(ValueError, match="unknown sampler parameters"):
        h.build_sample_fn({"nope": 1})


def test_synthesize_basic(models, cfg):
    out = h.synthesize(
        {"text": "Hello world.", "parameters": _fast_params(), "seed": 5},
        cfg=cfg, models=models)
    assert out["status"] == "success"
    assert os.path.isfile(out["local_path"])
    md = out["metadata"]
    assert md["sample_rate"] == 44100
    assert md["seed"] == 5
    assert md["num_chunks"] == 1
    audio, sr = audio_io.read_wav(out["local_path"])
    assert np.isfinite(audio).all()


def test_synthesize_with_voice_fixture(models, cfg):
    """Voice-cloning e2e on real audio: the checked-in 2 s synthetic voice
    flows load_audio -> resample -> chunked AE encode -> speaker KV
    (reference ships audio_prompts/ sample voices; docs/ADD_VOICE.md)."""
    import shutil
    fixture = os.path.join(os.path.dirname(__file__), "data", "voice.wav")
    shutil.copy(fixture, os.path.join(cfg.voices_dir, "fixture.wav"))
    out = h.synthesize(
        {"text": "Cloning test.", "parameters": _fast_params(), "seed": 3,
         "speaker_voice": "fixture.wav"},
        cfg=cfg, models=models)
    assert out["status"] == "success", out
    assert out["metadata"]["speaker_voice"] == "fixture.wav"
    audio, sr = audio_io.read_wav(out["local_path"])
    assert np.isfinite(audio).all()


def test_synthesize_stream_job(models, cfg, monkeypatch):
    """Streaming job: per-block WAVs appear as produced (on_block events),
    and their concatenation equals the final file."""
    monkeypatch.setattr(h, "STREAM_CHUNK_SIZES", (4,))  # tiny-model bucket
    events = []
    out = h.synthesize_stream(
        {"text": "Streamed serving.", "num_chunks": 2, "chunk_size": 4,
         "parameters": {"num_steps": 2}, "seed": 1, "session_id": "sess1"},
        cfg=cfg, models=models, on_block=events.append)
    assert out["status"] == "success"
    assert len(out["blocks"]) == 2 == len(events)
    assert [b["index"] for b in events] == [0, 1]
    assert events[-1]["is_last"] and not events[0]["is_last"]
    parts = []
    for b in events:
        audio, sr = audio_io.read_wav(b["local_path"])
        assert sr == 44100
        parts.append(audio)
    full, _ = audio_io.read_wav(out["local_path"])
    np.testing.assert_allclose(np.concatenate(parts, axis=-1), full,
                               atol=1e-4)
    md = out["metadata"]
    assert md["num_blocks"] == 2
    assert md["first_block_seconds"] <= md["generation_time_seconds"]


def test_synthesize_stream_with_voice_buckets(models, cfg, monkeypatch):
    """A streamed voice job pads the speaker reference to a preset bucket
    so one program serves any voice length."""
    import shutil
    monkeypatch.setattr(h, "STREAM_CHUNK_SIZES", (4,))
    fixture = os.path.join(os.path.dirname(__file__), "data", "voice.wav")
    shutil.copy(fixture, os.path.join(cfg.voices_dir, "v.wav"))
    picked = []
    import echo_tts_tpu.serve.presets as presets
    real_pick = presets.pick_speaker_bucket
    monkeypatch.setattr(presets, "pick_speaker_bucket",
                        lambda n, **k: picked.append(n) or real_pick(n, **k))
    out = h.synthesize_stream(
        {"text": "Voice stream.", "num_chunks": 2, "chunk_size": 4,
         "parameters": {"num_steps": 2}, "speaker_voice": "v.wav"},
        cfg=cfg, models=models)
    assert out["status"] == "success"
    assert len(picked) == 1  # bucketing engaged


def test_chunked_request_encodes_voice_once(models, cfg, monkeypatch):
    """A multi-chunk voiced request must AE-encode the speaker reference
    exactly once (it was re-encoded per chunk before), and the injected
    latent must produce the same audio as the per-chunk encode path."""
    import shutil

    import echo_tts_tpu.pipeline.pipeline as pl

    fixture = os.path.join(os.path.dirname(__file__), "data", "voice.wav")
    shutil.copy(fixture, os.path.join(cfg.voices_dir, "v.wav"))
    text = ("First sentence of a long passage. " * 3
            + "\n\n" + "Second paragraph follows here. " * 3)
    base = {"text": text, "parameters": _fast_params(), "seed": 7,
            "speaker_voice": "v.wav", "max_chars_per_chunk": 80,
            "boundary_mode": "none"}

    calls = []
    real = pl.get_speaker_latent_and_mask

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(pl, "get_speaker_latent_and_mask", spy)
    monkeypatch.setattr(h, "get_speaker_latent_and_mask", spy,
                        raising=False)
    out = h.synthesize(dict(base), cfg=cfg, models=models)
    assert out["status"] == "success"
    assert out["metadata"]["num_chunks"] > 1
    assert len(calls) == 1  # one encode for the whole request

    # equality vs the old per-chunk re-encode: drive sample_pipeline with
    # speaker_audio directly for chunk 0 and compare
    from echo_tts_tpu.pipeline import audio_io as aio
    from echo_tts_tpu.pipeline.text import chunk_text_for_audio
    speaker_audio = aio.load_audio(
        os.path.join(cfg.voices_dir, "v.wav"))
    chunks = chunk_text_for_audio(text, max_chars=80,
                                  target_duration_seconds=10.0)
    fn, _ = h.build_sample_fn(_fast_params())
    from echo_tts_tpu.serve.presets import pick_speaker_bucket
    n_lat = speaker_audio.shape[-1] // h.models_frame_length(models)
    bucket = pick_speaker_bucket(n_lat)
    ref0, _ = real(models, speaker_audio,
                   max_speaker_latent_length=bucket, pad_to_max=True)
    direct, _ = pl.sample_pipeline(
        models, fn, chunks[0], speaker_audio, rng_seed=7,
        pad_to_max_speaker_latent_length=bucket)
    via_latent, _ = pl.sample_pipeline(
        models, fn, chunks[0], None, rng_seed=7, speaker_latent=ref0,
        speaker_mask=np.asarray(real(models, speaker_audio,
                                     max_speaker_latent_length=bucket,
                                     pad_to_max=True)[1]))
    np.testing.assert_allclose(via_latent, direct, atol=2e-5)


def test_voice_latent_cache(models, cfg, monkeypatch):
    """Repeat requests for one voice file AE-encode it once (the
    process voice-latent cache); mtime change invalidates; cached and
    fresh encodes produce byte-identical audio."""
    import shutil

    import echo_tts_tpu.pipeline.pipeline as pl

    h.clear_voice_cache()
    fixture = os.path.join(os.path.dirname(__file__), "data", "voice.wav")
    path = os.path.join(cfg.voices_dir, "c.wav")
    shutil.copy(fixture, path)

    calls = []
    real = pl.get_speaker_latent_and_mask

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(pl, "get_speaker_latent_and_mask", spy)

    job = {"text": "Cache test.", "parameters": _fast_params(), "seed": 9,
           "speaker_voice": "c.wav"}
    out1 = h.synthesize(dict(job), cfg=cfg, models=models)
    assert out1["status"] == "success", out1
    out2 = h.synthesize(dict(job), cfg=cfg, models=models)
    assert len(calls) == 1  # second request hit the cache

    # the streaming path shares the same cache
    monkeypatch.setattr(h, "STREAM_CHUNK_SIZES", (4,))
    s = h.synthesize_stream(
        {"text": "Stream cache.", "num_chunks": 1, "chunk_size": 4,
         "parameters": {"num_steps": 2}, "speaker_voice": "c.wav"},
        cfg=cfg, models=models)
    assert s["status"] == "success", s
    assert len(calls) == 1

    # cached entry must be indistinguishable from a fresh encode
    with open(out1["local_path"], "rb") as f:
        wav1 = f.read()
    with open(out2["local_path"], "rb") as f:
        assert f.read() == wav1
    h.clear_voice_cache()
    out3 = h.synthesize(dict(job), cfg=cfg, models=models)
    assert len(calls) == 2
    with open(out3["local_path"], "rb") as f:
        assert f.read() == wav1

    # touching the file invalidates (mtime_ns keys the entry)
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    h.synthesize(dict(job), cfg=cfg, models=models)
    assert len(calls) == 3


def test_voice_cache_keyed_on_model_bundle(models, cfg, monkeypatch):
    """Latents are only valid for the encoder that produced them: a
    different models bundle misses the cache, and clear_models() clears
    the voice cache (id() values can be reused after GC)."""
    import shutil

    import echo_tts_tpu.pipeline.pipeline as pl
    from echo_tts_tpu.pipeline.pipeline import EchoModels
    from echo_tts_tpu.serve import models as models_mod

    h.clear_voice_cache()
    fixture = os.path.join(os.path.dirname(__file__), "data", "voice.wav")
    path = os.path.join(cfg.voices_dir, "ident.wav")
    shutil.copy(fixture, path)

    calls = []
    real = pl.get_speaker_latent_and_mask

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(pl, "get_speaker_latent_and_mask", spy)

    h.get_voice_latent(models, path)
    h.get_voice_latent(models, path)
    assert len(calls) == 1                      # same bundle: cache hit

    models2 = EchoModels(models.dit_params, models.dit_cfg,
                         models.dac_params, models.dac_cfg, models.pca,
                         dtype=models.dtype)
    h.get_voice_latent(models2, path)
    assert len(calls) == 2                      # new bundle: re-encode

    h.get_voice_latent(models, path)
    assert len(calls) == 2                      # original entry intact
    models_mod.clear_models()
    h.get_voice_latent(models, path)
    assert len(calls) == 3                      # clear_models cleared it
    h.clear_voice_cache()


def test_handler_generator_error_envelope(monkeypatch, cfg):
    monkeypatch.setattr(h, "load_config", lambda *a, **k: cfg)
    events = list(h.handler_generator(
        {"input": {"stream": True, "text": ""}}))
    assert len(events) == 1
    assert events[0]["error_type"] == "ValueError"


def test_handler_generator_streams(models, cfg, monkeypatch):
    """runpod's generator protocol: block events then the final envelope."""
    monkeypatch.setattr(h, "STREAM_CHUNK_SIZES", (4,))
    monkeypatch.setattr(h, "load_config", lambda *a, **k: cfg)
    monkeypatch.setattr(h.models_mod, "load_models",
                        lambda *a, **k: models)
    events = list(h.handler_generator(
        {"input": {"text": "Gen protocol.", "stream": True,
                   "num_chunks": 2, "chunk_size": 4,
                   "parameters": {"num_steps": 2}, "_allow_random": True}}))
    assert [e.get("event") for e in events] == ["block", "block", "final"]
    assert events[-1]["status"] == "success"


def test_synthesize_stream_validation(models, cfg):
    import pytest
    with pytest.raises(ValueError, match="unknown sampler parameters"):
        h.synthesize_stream({"text": "x", "parameters": {"bogus": 1}},
                            cfg=cfg, models=models)
    with pytest.raises(ValueError, match="chunk_size must be one of"):
        h.synthesize_stream({"text": "x", "chunk_size": 7},
                            cfg=cfg, models=models)
    with pytest.raises(ValueError, match="num_chunks must be in"):
        h.synthesize_stream({"text": "x", "chunk_size": 160,
                             "num_chunks": 0}, cfg=cfg, models=models)
    with pytest.raises(ValueError, match="chunk_sizes entries must be in"):
        h.synthesize_stream({"text": "x", "chunk_sizes": [160, 7]},
                            cfg=cfg, models=models)
    with pytest.raises(ValueError, match="chunk_sizes must have"):
        h.synthesize_stream({"text": "x", "chunk_sizes": []},
                            cfg=cfg, models=models)
    # user-controlled path components are sanitized (no traversal/mkdir)
    with pytest.raises(ValueError, match="invalid session_id"):
        h.synthesize_stream({"text": "x", "session_id": "../evil"},
                            cfg=cfg, models=models)
    with pytest.raises(ValueError, match="invalid request_id"):
        h.synthesize_stream({"text": "x", "request_id": "/abs/path"},
                            cfg=cfg, models=models)


def test_warmup_compile_runs_production_paths(models):
    """warmup_compile executes every manifest entry kind through the real
    request paths (tiny shapes on the tiny model; the production-scale
    manifest derivation itself is pinned in test_warmup_manifest.py)."""
    manifest = [
        {"kind": "oneshot", "text_bucket": 768, "speaker_bucket": None,
         "sequence_length": 8},
        {"kind": "oneshot", "text_bucket": 768, "speaker_bucket": 8,
         "sequence_length": 8},
        {"kind": "stream", "speaker_bucket": 8, "chunk_sizes": [4, 4],
         "total_bucket": None},
        {"kind": "batch", "batch_size": 2, "speaker_bucket": None,
         "sequence_length": 8},
    ]
    h.warmup_compile(models, parameters={"num_steps": 2,
                                         "sequence_length": 8},
                     manifest=manifest)
    import pytest
    with pytest.raises(ValueError, match="unknown warmup entry kind"):
        h.warmup_compile(models, manifest=[{"kind": "bogus"}])


def test_storage_sanitizes_components(cfg):
    import pytest
    from echo_tts_tpu.serve.storage import save_and_upload_audio
    audio = np.zeros((1, 100), np.float32)
    with pytest.raises(ValueError, match="invalid session_id"):
        save_and_upload_audio(audio, 44100, cfg, "req1",
                              session_id="../../etc")
    with pytest.raises(ValueError, match="invalid request_id"):
        save_and_upload_audio(audio, 44100, cfg, "a/b")


def test_synthesize_chunk_seed_progression(models, cfg, monkeypatch):
    """Per-chunk seeds advance seed + idx*1000 (reference: handler.py:749)."""
    seeds = []
    real = h.sample_pipeline

    def spy(models_, fn, chunk, spk, rng_seed, **kw):
        seeds.append(rng_seed)
        return real(models_, fn, chunk, spk, rng_seed, **kw)

    monkeypatch.setattr(h, "sample_pipeline", spy)
    long_text = "One sentence here. " * 10
    out = h.synthesize(
        {"text": long_text, "parameters": _fast_params(), "seed": 7,
         "max_chars_per_chunk": 60, "boundary_mode": "crossfade"},
        cfg=cfg, models=models)
    assert out["status"] == "success"
    assert len(seeds) >= 2
    assert seeds == [7 + i * 1000 for i in range(len(seeds))]


def test_text_validation(models, cfg):
    with pytest.raises(ValueError, match="required"):
        h.synthesize({"parameters": _fast_params()}, cfg=cfg, models=models)
    with pytest.raises(ValueError, match="too long"):
        h.synthesize({"text": "x" * 4001}, cfg=cfg, models=models)


def test_voice_path_traversal_rejected(models, cfg):
    for bad in ("../../etc/passwd", "/abs/path.wav", "nested/voice.wav"):
        with pytest.raises(ValueError, match="path components"):
            h.synthesize({"text": "hi", "speaker_voice": bad,
                          "parameters": _fast_params()},
                         cfg=cfg, models=models)
    with pytest.raises(ValueError, match="extension"):
        h.synthesize({"text": "hi", "speaker_voice": "voice.txt",
                      "parameters": _fast_params()},
                     cfg=cfg, models=models)


def test_voice_cloning_from_file(models, cfg):
    voice_path = os.path.join(cfg.voices_dir, "test_voice.wav")
    rng = np.random.default_rng(0)
    wav = np.tanh(rng.standard_normal((1, 2048))).astype(np.float32)
    audio_io.write_wav(voice_path, wav, 44100)
    out = h.synthesize(
        {"text": "Cloned voice.", "speaker_voice": "test_voice.wav",
         "parameters": _fast_params()},
        cfg=cfg, models=models)
    assert out["status"] == "success"
    assert out["metadata"]["speaker_voice"] == "test_voice.wav"


def test_handler_error_envelope(cfg):
    out = h.handler({"input": {}})
    assert set(out) == {"error", "error_type", "traceback"}
    assert out["error_type"] == "ValueError"


def test_handler_health_check(cfg, monkeypatch):
    monkeypatch.setenv("AUDIO_VOICES_DIR", cfg.voices_dir)
    monkeypatch.setenv("OUTPUT_AUDIO_DIR", cfg.output_dir)
    monkeypatch.setenv("HF_TOKEN", "test")
    out = h.handler({"input": {"action": "health_check"}})
    assert out["status"] in ("healthy", "degraded")
    assert "device" in out and "voices_available" in out
    assert json.dumps(out)  # serializable


def test_boundary_mode_validation(models, cfg):
    with pytest.raises(ValueError, match="boundary_mode"):
        h.synthesize({"text": "One sentence here. " * 10,
                      "parameters": _fast_params(),
                      "max_chars_per_chunk": 60,
                      "boundary_mode": "bogus"},
                     cfg=cfg, models=models)
