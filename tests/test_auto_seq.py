"""auto_sequence_length latency feature + stage-timing metadata."""
import numpy as np
import pytest

from echo_tts_tpu.serve.presets import pick_sequence_bucket
import importlib

h = importlib.import_module("echo_tts_tpu.serve.handler")
from echo_tts_tpu.serve.config import load_config


@pytest.fixture
def cfg(tmp_path):
    voices = tmp_path / "voices"
    voices.mkdir()
    return load_config({
        "AUDIO_VOICES_DIR": str(voices),
        "OUTPUT_AUDIO_DIR": str(tmp_path / "out"),
        "HF_TOKEN": "test",
    })


def test_pick_sequence_bucket():
    # ~60 chars ≈ 5s speech ≈ 108 latents * 1.5 margin = 161 -> bucket 320
    assert pick_sequence_bucket("x" * 60, 640) == 320
    assert pick_sequence_bucket("x" * 20, 640) == 160
    assert pick_sequence_bucket("x" * 4000, 640) == 640  # capped
    assert pick_sequence_bucket("x" * 60, 160) == 160    # user cap wins


def test_auto_sequence_length_shrinks_generation(tiny_models, cfg):
    seqs = []
    real = h.sample_pipeline

    def spy(models_, fn, chunk, spk, rng_seed, **kw):
        audio, text = real(models_, fn, chunk, spk, rng_seed, **kw)
        seqs.append(audio.shape[-1])
        return audio, text

    import unittest.mock as mock
    with mock.patch.object(h, "sample_pipeline", spy):
        out = h.synthesize(
            {"text": "Hi.", "auto_sequence_length": True,
             "parameters": {"num_steps": 2, "sequence_length": 16}},
            cfg=cfg, models=tiny_models)
    assert out["status"] == "success"
    # tiny config: bucket 160 capped to sequence_length 16, frame 32
    assert seqs[0] <= 16 * tiny_models.dac_cfg.frame_length
    md = out["metadata"]
    assert "stage_timings" in md and "synthesis" in md["stage_timings"]
    assert md["rtf"] > 0  # 4-decimal precision covers tiny test audio
