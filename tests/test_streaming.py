"""Streaming synthesis: block iteration, incremental decode exactness vs
the one-shot decode, and continuation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.pipeline.pipeline import (ae_decode, ae_decode_block,
                                            ae_decode_stream_init,
                                            ae_encode, ae_encode_block,
                                            ae_encode_stream_init)
from echo_tts_tpu.sampler.blockwise import (
    sample_blockwise_euler_cfg_independent_guidances)
# the serve layer buckets the stream total (finite compile surface);
# direct sampler calls below pass the same bucket so comparisons stay
# bit-exact (bucketed == unbucketed up to float reassociation is pinned
# separately in test_blockwise_parity.py)
from echo_tts_tpu.serve.presets import pick_stream_total_bucket
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


def test_incremental_decode_matches_one_shot(models):
    """Chained ae_decode_block must reproduce one-shot ae_decode of the
    concatenated latents — the carried state (rolling post-module KV +
    conv tails) replaces re-decoding any context."""
    rng = np.random.default_rng(3)
    latents = jnp.asarray(rng.standard_normal((1, 12, 80)).astype(np.float32))
    full = np.asarray(ae_decode(models, latents))

    state = ae_decode_stream_init(models)
    parts = []
    for start in range(0, 12, 4):
        audio, state = ae_decode_block(models, state,
                                       latents[:, start:start + 4])
        parts.append(np.asarray(audio))
    streamed = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_incremental_decode_uneven_blocks(models):
    """Block sizes may vary within a stream (the post-module KV and conv
    histories are length-agnostic as long as blocks >= state width)."""
    rng = np.random.default_rng(4)
    latents = jnp.asarray(rng.standard_normal((1, 14, 80)).astype(np.float32))
    full = np.asarray(ae_decode(models, latents))

    state = ae_decode_stream_init(models)
    parts = []
    for start, size in ((0, 6), (6, 4), (10, 4)):
        audio, state = ae_decode_block(models, state,
                                       latents[:, start:start + size])
        parts.append(np.asarray(audio))
    np.testing.assert_allclose(np.concatenate(parts, axis=-1), full,
                               atol=1e-5)


def test_incremental_decode_bf16_divergence_bounded(models):
    """In production the codec runs bf16 (handler.py:345,381); streamed and
    one-shot decodes then differ by reduction order only.  Pin the bound
    that docs/PERFORMANCE.md §5 states in prose: the divergence stays at
    bf16-rounding scale, far below audibility."""
    import jax
    bf16_params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if hasattr(a, "astype") else a,
        models.dac_params)
    cfg = models.dac_cfg
    rng = np.random.default_rng(12)
    z_q = jnp.asarray(rng.standard_normal(
        (1, 12, cfg.latent_dim)).astype(np.float32)).astype(jnp.bfloat16)

    import echo_tts_tpu.models.dac.streaming as strm
    from echo_tts_tpu.models.dac import dac as jdac
    full = np.asarray(jdac.decode_zq(bf16_params, cfg, z_q),
                      dtype=np.float32)
    state = strm.init_decode_state(cfg, dtype=jnp.bfloat16)
    parts = []
    for s in range(0, 12, 4):
        audio, state = strm.decode_zq_block(bf16_params, cfg, state,
                                            z_q[:, s:s + 4])
        parts.append(np.asarray(audio, dtype=np.float32))
    streamed = np.concatenate(parts, axis=1)
    assert np.isfinite(streamed).all() and np.isfinite(full).all()
    # audio is tanh-bounded in [-1, 1]; bf16 has ~2-3 significant digits
    assert float(np.max(np.abs(streamed - full))) < 0.05


def test_incremental_encode_matches_one_shot(models):
    """Chained ae_encode_block must reproduce one-shot ae_encode of the
    concatenated audio (encoder conv tails + window-512/128 rolling KV)."""
    spl = models.dac_cfg.frame_length
    rng = np.random.default_rng(8)
    audio = jnp.asarray(np.tanh(rng.standard_normal((1, 12 * spl)))
                        .astype(np.float32))
    full = np.asarray(ae_encode(models, audio))

    state = ae_encode_stream_init(models)
    parts = []
    for start_f in (0, 4, 6):
        size = {0: 4, 4: 2, 6: 6}[start_f]
        block = audio[:, start_f * spl:(start_f + size) * spl]
        lat, state = ae_encode_block(models, state, block)
        parts.append(np.asarray(lat))
    streamed = np.concatenate(parts, axis=1)
    np.testing.assert_allclose(streamed, full, atol=2e-5, rtol=1e-4)


def test_incremental_encode_rejects_partial_frames(models):
    state = ae_encode_stream_init(models)
    with pytest.raises(ValueError, match="multiple of"):
        ae_encode_block(models, state,
                        jnp.zeros((1, models.dac_cfg.frame_length + 1)))


def test_stream_rope_bound_guards(models):
    """Past the RoPE-table bound the in-graph slice would clamp silently;
    the host-side position mirror must raise instead."""
    state = ae_decode_stream_init(models)
    state["pos"] = 8190
    with pytest.raises(ValueError, match="RoPE bound"):
        ae_decode_block(models, state, jnp.zeros((1, 4, 80)))

    st = ae_encode_stream_init(models)
    st["pos"] = 32766
    with pytest.raises(ValueError, match="RoPE bound"):
        ae_encode_block(models, st,
                        jnp.zeros((1, 4 * models.dac_cfg.frame_length)))


def test_stream_matches_full_decode(models):
    """Concatenated streamed audio must equal decoding the final latent
    buffer in one shot (now via the incremental state, no context window)."""
    chunks = list(stream_synthesize(
        models, "Exactness check.", chunk_size=4, num_chunks=2, seed=9,
        sampler_params=FAST))
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
        rng_key=jax.random.PRNGKey(9),
        total_len_bucket=pick_stream_total_bucket(8), **FAST)
    full = np.asarray(ae_decode(models, latents))
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_stream_mixed_chunk_sizes(models):
    """An explicit chunk_sizes schedule (small first block for TTFA) must
    produce blocks of those sizes whose concatenation equals the one-shot
    decode of the same blockwise sample."""
    chunks = list(stream_synthesize(
        models, "Schedule check.", chunk_sizes=[4, 8, 4], seed=2,
        sampler_params=FAST))
    spl = models.dac_cfg.frame_length
    assert [(c.latent_start, c.latent_end) for c in chunks] == [
        (0, 4), (4, 12), (12, 16)]
    assert [c.audio.shape[-1] for c in chunks] == [
        4 * spl, 8 * spl, 4 * spl]
    assert chunks[-1].is_last and not chunks[0].is_last

    from echo_tts_tpu.config import MAX_TEXT_LENGTH
    from echo_tts_tpu.pipeline.text import get_text_input_ids_and_mask
    ids, mask = get_text_input_ids_and_mask(["Schedule check."],
                                            max_length=MAX_TEXT_LENGTH)
    ps = models.dit_cfg.speaker_patch_size
    latents = sample_blockwise_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg,
        jnp.zeros((1, ps, 80)), jnp.zeros((1, ps), bool),
        jnp.asarray(ids), jnp.asarray(mask),
        block_sizes=[4, 8, 4], dtype=models.dtype,
        rng_key=jax.random.PRNGKey(2),
        total_len_bucket=pick_stream_total_bucket(16), **FAST)
    full = np.asarray(ae_decode(models, latents))
    streamed = np.concatenate([c.audio for c in chunks], axis=-1)
    np.testing.assert_allclose(streamed, full, atol=1e-5)


def test_stream_speaker_latent_injection(models):
    """Passing a pre-encoded speaker latent (voice-latent cache) must equal
    the same stream driven through the internal encode of nothing — i.e.
    the latent is consumed as-is and shapes/masks line up."""
    rng = np.random.default_rng(6)
    ps = models.dit_cfg.speaker_patch_size
    lat = rng.standard_normal((1, 2 * ps, 80)).astype(np.float32)
    chunks = list(stream_synthesize(
        models, "Injected voice.", chunk_size=4, num_chunks=2, seed=3,
        sampler_params=FAST, speaker_latent=lat))
    assert len(chunks) == 2
    for c in chunks:
        assert np.isfinite(c.audio).all()
    with pytest.raises(ValueError, match="not both"):
        next(iter(stream_synthesize(
            models, "x", speaker_audio=np.zeros((1, 1000), np.float32),
            speaker_latent=lat, chunk_size=4, num_chunks=1,
            sampler_params=FAST)))


def test_stream_continuation(models):
    """Continuation warms the decode state, so streamed blocks equal the
    one-shot decode of [continuation | generated] with the continuation
    samples dropped."""
    rng = np.random.default_rng(11)
    cont = rng.standard_normal((1, 4, 80)).astype(np.float32) * 0.1
    chunks = list(stream_synthesize(
        models, "Continued.", chunk_size=4, num_chunks=2, seed=1,
        sampler_params=FAST, continuation_latent=cont))
    assert [(c.latent_start, c.latent_end) for c in chunks] == [
        (4, 8), (8, 12)]

    from echo_tts_tpu.config import MAX_TEXT_LENGTH
    from echo_tts_tpu.pipeline.text import get_text_input_ids_and_mask
    ids, mask = get_text_input_ids_and_mask(["Continued."],
                                            max_length=MAX_TEXT_LENGTH)
    ps = models.dit_cfg.speaker_patch_size
    latents = sample_blockwise_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg,
        jnp.zeros((1, ps, 80)), jnp.zeros((1, ps), bool),
        jnp.asarray(ids), jnp.asarray(mask),
        block_sizes=[4, 4], dtype=models.dtype,
        rng_key=jax.random.PRNGKey(1),
        continuation_latent=jnp.asarray(cont),
        total_len_bucket=pick_stream_total_bucket(12), **FAST)
    full = np.asarray(ae_decode(models, latents))
    spl = models.dac_cfg.frame_length
    streamed = np.concatenate([c.audio for c in chunks], axis=-1)
    np.testing.assert_allclose(streamed, full[:, 4 * spl:], atol=1e-5)
