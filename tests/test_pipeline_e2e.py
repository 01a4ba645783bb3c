"""End-to-end text -> audio pipeline smoke tests on tiny models."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dac_config, tiny_dit_config
from echo_tts_tpu.models import dit as jdit
from echo_tts_tpu.pipeline.pipeline import (EchoModels, ae_reconstruct,
                                            sample_pipeline,
                                            sample_pipeline_chunked)
from echo_tts_tpu.sampler.euler import sample_euler_cfg_independent_guidances

from torch_ref import build_torch_dac, jax_dac_params_from_torch


@pytest.fixture(scope="module")
def models():
    dit_cfg = tiny_dit_config()
    dac_cfg = tiny_dac_config()
    dit_params = jdit.init_dit_params(jax.random.key(0), dit_cfg,
                                      dtype=jnp.float32)
    dac_params = jax_dac_params_from_torch(build_torch_dac(dac_cfg), dac_cfg)
    rng = np.random.default_rng(0)
    # (dit_latent=80, codec_latent) projection; random is fine for smoke
    comps = (rng.standard_normal(
        (dit_cfg.latent_size, dac_cfg.latent_dim)) * 0.1).astype(np.float32)
    pca = {"components": jnp.asarray(comps),
           "mean": jnp.asarray(rng.standard_normal(
               dac_cfg.latent_dim).astype(np.float32) * 0.01),
           "latent_scale": 1.7}
    return EchoModels(dit_params, dit_cfg, dac_params, dac_cfg, pca,
                      dtype=jnp.float32)


def _sample_fn(models, speaker_latent, speaker_mask, text_ids, text_mask,
               rng_seed, sequence_length=16):
    return sample_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg,
        speaker_latent, speaker_mask, text_ids, text_mask,
        num_steps=4, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
        cfg_min_t=0.5, cfg_max_t=1.0, sequence_length=sequence_length,
        dtype=models.dtype, rng_key=jax.random.key(rng_seed))


def test_sample_pipeline_no_speaker(models):
    audio, normalized = sample_pipeline(
        models, _sample_fn, "Hello there, this is a pipeline test.",
        speaker_audio=None, rng_seed=0)
    assert normalized.startswith("[S1] ")
    assert audio.ndim == 2 and audio.shape[0] == 1
    # <= 16 latents * frame_length samples; crop may shorten
    assert audio.shape[1] <= 16 * models.dac_cfg.frame_length
    assert np.isfinite(audio).all()


def test_sample_pipeline_with_speaker_and_buckets(models):
    rng = np.random.default_rng(1)
    speaker = np.tanh(rng.standard_normal((1, 400))).astype(np.float32)
    audio, _ = sample_pipeline(
        models, _sample_fn, "Voice cloned output.",
        speaker_audio=speaker, rng_seed=3,
        pad_to_max_speaker_latent_length=16,
        pad_to_max_text_length=64)
    assert audio.shape[0] == 1 and np.isfinite(audio).all()


def test_sample_pipeline_chunked_seeds(models):
    """Chunked variant: per-chunk seed progression seed + idx
    (reference: inference.py:379)."""
    calls = []

    def tracking_fn(m, sl, sm, ti, tm, seed):
        calls.append(seed)
        return _sample_fn(m, sl, sm, ti, tm, seed)

    long_text = ("First sentence goes here. " * 4 +
                 "Second block of text follows. " * 4)
    audio, norm = sample_pipeline_chunked(
        models, tracking_fn, long_text, None, rng_seed=10,
        max_chars_per_chunk=60)
    assert len(calls) >= 2
    assert calls == [10 + i for i in range(len(calls))]
    assert audio.shape[0] == 1 and np.isfinite(audio).all()


def test_sample_pipeline_chunked_encodes_voice_once(models, monkeypatch):
    """The library chunked variant AE-encodes the speaker reference once
    and reuses the latent across chunks, matching serve/handler.py's
    encode-once path — and the audio is identical to per-chunk encoding
    (mirrors test_serve::test_chunked_request_encodes_voice_once)."""
    import echo_tts_tpu.pipeline.pipeline as pl
    from echo_tts_tpu.pipeline.text import chunk_text

    rng = np.random.default_rng(4)
    speaker = np.tanh(rng.standard_normal((1, 400))).astype(np.float32)
    long_text = ("First sentence goes here. " * 4 +
                 "Second block of text follows. " * 4)

    calls = []
    real = pl.get_speaker_latent_and_mask

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(pl, "get_speaker_latent_and_mask", spy)
    audio, _ = sample_pipeline_chunked(
        models, _sample_fn, long_text, speaker, rng_seed=10,
        max_chars_per_chunk=60)
    assert len(calls) == 1  # one encode for the whole request

    # equality vs the old per-chunk re-encode path
    monkeypatch.setattr(pl, "get_speaker_latent_and_mask", real)
    chunks = chunk_text(long_text, max_chars=60)
    assert len(chunks) >= 2
    parts = [sample_pipeline(models, _sample_fn, c, speaker, 10 + i)[0]
             for i, c in enumerate(chunks)]
    np.testing.assert_array_equal(audio, np.concatenate(parts, axis=-1))


def test_ae_reconstruct(models):
    rng = np.random.default_rng(2)
    audio = np.tanh(rng.standard_normal((1, 320))).astype(np.float32)
    recon = np.asarray(ae_reconstruct(models, jnp.asarray(audio)))
    assert recon.shape == (1, 320)
    assert np.isfinite(recon).all()
