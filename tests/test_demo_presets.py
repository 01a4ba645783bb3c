"""Demo session, sampler presets, and shape-bucket selection."""
import os

import numpy as np
import pytest

from echo_tts_tpu.demo.app import (CFG_PRESETS, TRUNCATION_PRESETS,
                                   DemoSession)
from echo_tts_tpu.pipeline import audio_io
from echo_tts_tpu.serve.presets import (get_preset, load_presets,
                                        pick_speaker_bucket,
                                        pick_text_bucket)


@pytest.fixture(scope="module")
def models(tiny_models):
    return tiny_models


def test_presets_match_reference_inventory():
    """Six presets with the reference's names and values
    (reference: sampler_presets.json:1-62)."""
    presets = load_presets()
    assert set(presets) == {
        "Independent-High-Speaker-CFG", "Independent-High-Speaker-CFG-Flat",
        "Independent-High-CFG", "Independent-High-CFG-Flat",
        "Independent-Low-CFG", "Independent-Low-CFG-Flat"}
    p = get_preset("Independent-High-Speaker-CFG-Flat")
    assert p["truncation_factor"] == 0.8 and p["rescale_k"] == 1.2
    assert all(presets[n]["num_steps"] == 40 for n in presets)
    with pytest.raises(KeyError, match="unknown sampler preset"):
        get_preset("nope")


def test_bucket_selection():
    """find_min_bucket_gte semantics (reference: gradio_app.py:128-155)."""
    assert pick_text_bucket(100) == 768
    assert pick_speaker_bucket(100) == 640
    assert pick_speaker_bucket(641) == 2816
    assert pick_speaker_bucket(9000) == 6400  # above max -> max


def test_demo_preset_tables():
    assert CFG_PRESETS["higher speaker"] == (3.0, 8.0, 0.5, 1.0)
    assert TRUNCATION_PRESETS["flat"] == (0.8, 1.2, 3.0)


def test_demo_generate_and_cleanup(models, tmp_path):
    voice = tmp_path / "voice.wav"
    rng = np.random.default_rng(0)
    audio_io.write_wav(str(voice),
                       np.tanh(rng.standard_normal((1, 800))).astype(
                           np.float32), 44100)
    session = DemoSession(models, temp_dir=str(tmp_path / "demo"))
    result = session.generate_audio(
        "Demo generation.", str(voice), num_steps=2,
        sample_latent_length=8, force_speaker=True,
        reconstruct_reference=True, show_original_audio=True,
        max_speaker_latent_length="16", max_text_byte_length="64")
    assert os.path.isfile(result.audio_path)
    assert os.path.isfile(result.reconstruction_path)
    assert os.path.isfile(result.original_path)
    assert result.normalized_text.startswith("[S1] ")
    assert result.generation_seconds > 0
    session.cleanup()
    assert os.listdir(session.temp_dir) == []
