"""Streaming synthesis: block iteration, incremental decode, exactness
with full-context decode, and continuation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.pipeline.pipeline import ae_decode
from echo_tts_tpu.sampler.blockwise import (
    sample_blockwise_euler_cfg_independent_guidances)
from echo_tts_tpu.serve.streaming import stream_synthesize

FAST = {"num_steps": 2, "cfg_scale_text": 3.0, "cfg_scale_speaker": 8.0,
        "cfg_min_t": 0.5, "cfg_max_t": 1.0}


@pytest.fixture(scope="module")
def models(tiny_models):
    return tiny_models


def test_stream_yields_blocks_with_metadata(models):
    chunks = list(stream_synthesize(
        models, "Streamed speech.", chunk_size=4, num_chunks=3, seed=5,
        sampler_params=FAST))
    assert len(chunks) == 3
    assert [c.index for c in chunks] == [0, 1, 2]
    assert chunks[-1].is_last and not chunks[0].is_last
    spl = models.dac_cfg.frame_length
    for c in chunks:
        assert c.audio.shape == (1, 4 * spl)
        assert np.isfinite(c.audio).all()
    assert [(c.latent_start, c.latent_end) for c in chunks] == [
        (0, 4), (4, 8), (8, 12)]


def test_stream_with_full_context_matches_full_decode(models):
    """With decode_context >= total length, concatenated streamed audio must
    equal decoding the final latents in one shot."""
    chunks = list(stream_synthesize(
        models, "Exactness check.", chunk_size=4, num_chunks=2, seed=9,
        sampler_params=FAST, decode_context=10_000))
    streamed = np.concatenate([c.audio for c in chunks], axis=-1)

    from echo_tts_tpu.config import MAX_TEXT_LENGTH
    from echo_tts_tpu.pipeline.text import get_text_input_ids_and_mask
    ids, mask = get_text_input_ids_and_mask(["Exactness check."],
                                            max_length=MAX_TEXT_LENGTH)
    ps = models.dit_cfg.speaker_patch_size
    latents = sample_blockwise_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg,
        jnp.zeros((1, ps, 80)), jnp.zeros((1, ps), bool),
        jnp.asarray(ids), jnp.asarray(mask),
        block_sizes=[4, 4], dtype=models.dtype,
        rng_key=jax.random.PRNGKey(9), **FAST)
    full = np.asarray(ae_decode(models, latents))
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_stream_continuation(models):
    cont = np.zeros((1, 4, 80), np.float32)
    chunks = list(stream_synthesize(
        models, "Continued.", chunk_size=4, num_chunks=2, seed=1,
        sampler_params=FAST, continuation_latent=cont))
    assert [(c.latent_start, c.latent_end) for c in chunks] == [
        (4, 8), (8, 12)]
