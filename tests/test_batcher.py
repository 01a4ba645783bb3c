"""Batched multi-request execution: grouping, bucket padding, and
batched-equals-single-request output parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.pipeline.pipeline import sample_pipeline
from echo_tts_tpu.sampler.euler import sample_euler_cfg_independent_guidances
from echo_tts_tpu.serve.batcher import (BatchRequest, group_compatible,
                                        run_batch)

FAST = {"num_steps": 2, "sequence_length": 8}


@pytest.fixture(scope="module")
def models(tiny_models):
    return tiny_models


def test_group_compatible_splits_by_params_and_size():
    reqs = [(BatchRequest("a", 0), {"num_steps": 2}),
            (BatchRequest("b", 1), {"num_steps": 2}),
            (BatchRequest("c", 2), {"num_steps": 4}),
            (BatchRequest("d", 3), {"num_steps": 2}),
            (BatchRequest("e", 4), {"num_steps": 2})]
    groups = group_compatible(reqs, max_batch=2)
    sizes = sorted(len(g) for g in groups)
    assert sizes == [1, 2, 2]
    assert [2] in [sorted(g) for g in groups]  # num_steps=4 grouped alone


def test_run_batch_matches_single_requests(models):
    """A batched request must produce the same audio as the same request
    run alone (same seed => same noise => same latents)."""
    rng = np.random.default_rng(0)
    spk = np.tanh(rng.standard_normal((1, 400))).astype(np.float32)
    reqs = [
        BatchRequest("First batched utterance.", seed=11, request_id="a"),
        BatchRequest("Second one with a voice.", seed=22,
                     speaker_audio=spk, request_id="b"),
        BatchRequest("Third, default voice.", seed=33, request_id="c"),
    ]
    results = run_batch(models, reqs, FAST)
    assert [r.request_id for r in results] == ["a", "b", "c"]

    def single_fn(m, sl, sm, ti, tm, seed):
        return sample_euler_cfg_independent_guidances(
            m.dit_params, m.dit_cfg, sl, sm, ti, tm,
            num_steps=2, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
            cfg_min_t=0.5, cfg_max_t=1.0, sequence_length=8,
            dtype=m.dtype,
            initial_noise=jax.random.normal(
                jax.random.PRNGKey(seed), (1, 8, 80), jnp.float32))

    # Request "b" alone, padded to the same speaker bucket the batch used
    bucket = 4  # 400 samples // 32 = 12 latents? batch pads to patch mult
    single_audio, single_norm = sample_pipeline(
        models, single_fn, "Second one with a voice.", spk, rng_seed=22,
        pad_to_max_speaker_latent_length=run_batch_bucket(models, reqs))
    got = results[1]
    assert got.normalized_text == single_norm
    np.testing.assert_allclose(got.audio, single_audio, atol=2e-4)


def run_batch_bucket(models, reqs):
    """The bucket run_batch derives: max actual latents, patch-rounded."""
    from echo_tts_tpu.pipeline.pipeline import get_speaker_latent_and_mask
    ps = models.dit_cfg.speaker_patch_size
    longest = ps
    for r in reqs:
        if r.speaker_audio is not None:
            sl, _ = get_speaker_latent_and_mask(models, r.speaker_audio)
            longest = max(longest, sl.shape[1])
    return -(-longest // ps) * ps


def test_run_batch_negative_and_64bit_seeds_match_single(models):
    """PRNGKey accepts negative / 64-bit seeds, so the batched noise path
    must too (the key data is computed host-side, batcher._key_data)."""
    for seed in (-1, -(2 ** 40), 2 ** 40 + 17):
        got = run_batch(models, [BatchRequest("Seed edge.", seed=seed)],
                        FAST)[0]
        expect = np.asarray(jax.random.normal(
            jax.random.PRNGKey(seed), (1, 8, 80), jnp.float32))
        drawn = np.asarray(_draw_noise_for(models, seed))
        np.testing.assert_array_equal(drawn, expect[0])
        assert np.isfinite(got.audio).all()


def _draw_noise_for(models, seed):
    from echo_tts_tpu.serve.batcher import _draw_noise, _key_data
    kd = jnp.asarray(np.asarray([_key_data(seed)], dtype=np.uint32))
    return _draw_noise(models.dit_cfg, 8)(kd)[0]


def test_run_batch_speaker_latent_injection(models):
    """A pre-encoded voice latent (serving voice cache) must behave exactly
    like encoding the same audio: inject what get_speaker_latent_and_mask
    returns for request "b" and compare against the audio-path batch."""
    from echo_tts_tpu.pipeline.pipeline import get_speaker_latent_and_mask
    rng = np.random.default_rng(7)
    spk = np.tanh(rng.standard_normal((1, 400))).astype(np.float32)
    sl, _ = get_speaker_latent_and_mask(models, spk)

    via_audio = run_batch(models, [
        BatchRequest("Latent injection.", seed=5, speaker_audio=spk)], FAST)
    via_latent = run_batch(models, [
        BatchRequest("Latent injection.", seed=5, speaker_latent=sl)], FAST)
    np.testing.assert_allclose(via_latent[0].audio, via_audio[0].audio,
                               atol=2e-4)

    with pytest.raises(ValueError, match="not both"):
        run_batch(models, [BatchRequest("x", 0, speaker_audio=spk,
                                        speaker_latent=sl)], FAST)


def test_run_batch_bucket_too_small_raises(models):
    rng = np.random.default_rng(1)
    spk = np.tanh(rng.standard_normal((1, 800))).astype(np.float32)
    with pytest.raises(ValueError, match="speaker_bucket"):
        run_batch(models, [BatchRequest("x", 0, speaker_audio=spk)],
                  FAST, speaker_bucket=4)


def test_run_batch_empty(models):
    assert run_batch(models, [], FAST) == []
