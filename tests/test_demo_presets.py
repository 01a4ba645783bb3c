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


def test_growing_stream_schedule():
    from echo_tts_tpu.serve.presets import (STREAM_CHUNK_SIZES,
                                            growing_schedule)
    assert growing_schedule(1240) == [40, 80, 160, 320, 320, 320]
    assert growing_schedule(600) == [40, 80, 160, 320]
    assert growing_schedule(40) == [40]
    assert growing_schedule(280) == [40, 80, 160]
    assert sum(growing_schedule(2000)) == 2000
    assert set(growing_schedule(2000)) <= set(STREAM_CHUNK_SIZES)
    with pytest.raises(ValueError, match="not reachable"):
        growing_schedule(50)
    # schedules past the serving block cap fail loudly, not at the handler
    with pytest.raises(ValueError, match="MAX_STREAM_CHUNKS"):
        growing_schedule(16 * 320 + 600)


def test_demo_preset_tables():
    assert CFG_PRESETS["higher speaker"] == (3.0, 8.0, 0.5, 1.0)
    assert TRUNCATION_PRESETS["flat"] == (0.8, 1.2, 3.0)


def test_preset_appliers():
    """The UI-independent appliers (gradio_app.py:372-483 analogs) resolve
    names to full field dicts and reject unknowns with None."""
    from echo_tts_tpu.demo.app import (SAMPLER_PRESET_FIELDS,
                                       apply_cfg_preset,
                                       apply_sampler_preset,
                                       apply_speaker_kv_preset,
                                       apply_truncation_preset)

    assert apply_cfg_preset("large guidances") == {
        "cfg_scale_text": 8.0, "cfg_scale_speaker": 8.0,
        "cfg_min_t": 0.5, "cfg_max_t": 1.0}
    assert apply_cfg_preset("nope") is None

    assert apply_truncation_preset("sharp") == {
        "truncation_factor": 0.9, "rescale_k": 0.96, "rescale_sigma": 3.0}
    assert apply_truncation_preset("custom") is None

    assert apply_speaker_kv_preset("enable") == {"force_speaker": True}
    assert apply_speaker_kv_preset("off") == {"force_speaker": False}
    assert apply_speaker_kv_preset("x") is None

    p = apply_sampler_preset("Independent-High-CFG-Flat")
    assert set(p) == set(SAMPLER_PRESET_FIELDS)
    assert p["cfg_scale_text"] == 8.0 and p["truncation_factor"] == 0.8
    assert p["force_speaker"] is False  # no speaker_kv_enable in presets
    assert apply_sampler_preset("Custom") is None


def test_text_presets_and_voice_library(tmp_path):
    from echo_tts_tpu.demo.app import (list_voice_files, load_text_presets,
                                       select_text_preset_row)

    rows = load_text_presets()
    assert rows, "shipped text_presets.txt must parse to rows"
    assert all(len(r) == 3 for r in rows)
    assert {r[0] for r in rows} >= {"Narration", "Conversational"}
    assert select_text_preset_row(0) == rows[0][2]
    assert select_text_preset_row((1, 2)) == rows[1][2]  # (row, col) events
    assert select_text_preset_row(10 ** 6) is None

    custom = tmp_path / "presets.txt"
    custom.write_text("Cat | Hello there\nbare line\n", encoding="utf-8")
    got = load_text_presets(str(custom))
    assert got == [["Cat", "2", "Hello there"],
                   ["Uncategorized", "2", "bare line"]]

    vd = tmp_path / "voices"
    vd.mkdir()
    for n in ("b.wav", "a.mp3", "notes.txt", "c.flac"):
        (vd / n).write_bytes(b"x")
    assert list_voice_files(str(vd)) == ["a.mp3", "b.wav", "c.flac"]
    assert list_voice_files(str(vd), query="wav") == ["b.wav"]
    assert list_voice_files(None) == []


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
