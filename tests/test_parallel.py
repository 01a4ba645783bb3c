"""Multi-chip sharding on the 8-device virtual CPU mesh (conftest sets
xla_force_host_platform_device_count=8 — the standard JAX pattern for
testing pjit/shard_map without a TPU pod)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dac_config, tiny_dit_config
from echo_tts_tpu.models.dac.init import init_dac_params, init_pca_params
from echo_tts_tpu.models.dit import init_dit_params
from echo_tts_tpu.parallel import inference as pinf
from echo_tts_tpu.parallel import mesh as pmesh
from echo_tts_tpu.pipeline.pipeline import EchoModels
from echo_tts_tpu.sampler.euler import sample_euler_cfg_independent_guidances
from echo_tts_tpu.train import (create_train_state, make_optimizer,
                                make_train_step)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices")


def _models(dtype=jnp.float32):
    dit_cfg = tiny_dit_config()
    dac_cfg = tiny_dac_config()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return EchoModels(
        dit_params=init_dit_params(k1, dit_cfg, dtype=dtype),
        dit_cfg=dit_cfg,
        dac_params=init_dac_params(k2, dac_cfg, dtype=dtype),
        dac_cfg=dac_cfg,
        pca=init_pca_params(k3, dit_cfg.latent_size, dac_cfg.latent_dim),
        dtype=dtype)


def _sample(models, b=2, seq=8):
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    ids = jax.random.randint(ks[0], (b, 16), 0, 256, jnp.int32)
    tm = jnp.ones((b, 16), bool)
    spk = jax.random.normal(ks[1], (b, 8, 80), jnp.float32)
    sm = jnp.ones((b, 8), bool)
    noise = jax.random.normal(ks[2], (b, seq, 80), jnp.float32)
    return spk, sm, ids, tm, noise


def test_mesh_shapes():
    mesh = pmesh.make_mesh(dp=4, tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="device count"):
        pmesh.make_mesh(dp=3, tp=3)


def test_tp_sampler_matches_single_device():
    """TP=2/DP=4-sharded sampling must equal unsharded sampling."""
    models = _models()
    spk, sm, ids, tm, noise = _sample(models, b=4)
    kwargs = dict(num_steps=2, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
                  cfg_min_t=0.5, cfg_max_t=1.0, sequence_length=8,
                  dtype=models.dtype)

    ref = sample_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg, spk, sm, ids, tm,
        initial_noise=noise, **kwargs)

    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = pinf.shard_models(models, mesh)
    s_spk, s_sm, s_ids, s_tm, s_noise = pinf.place_request(
        mesh, spk, sm, ids, tm, noise)
    got = sample_euler_cfg_independent_guidances(
        sharded.dit_params, models.dit_cfg, s_spk, s_sm, s_ids, s_tm,
        initial_noise=s_noise, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_tp_sampler_int8_matches_single_device():
    """The W8A8 DiT (ops/quant.py) composes with TP: shard_params places
    q8 like the kernel it replaced and the per-channel scale on the output
    axis; int32 accumulation makes the TP psum exact, so the sharded
    quantized sampler matches the unsharded quantized one."""
    import dataclasses

    from echo_tts_tpu.ops.quant import quantize_dit_params

    models = _models()
    models = dataclasses.replace(
        models, dit_params=quantize_dit_params(models.dit_params))
    spk, sm, ids, tm, noise = _sample(models, b=4)
    kwargs = dict(num_steps=2, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
                  cfg_min_t=0.5, cfg_max_t=1.0, sequence_length=8,
                  dtype=models.dtype)

    ref = sample_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg, spk, sm, ids, tm,
        initial_noise=noise, **kwargs)

    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = pinf.shard_models(models, mesh)
    s_spk, s_sm, s_ids, s_tm, s_noise = pinf.place_request(
        mesh, spk, sm, ids, tm, noise)
    got = sample_euler_cfg_independent_guidances(
        sharded.dit_params, models.dit_cfg, s_spk, s_sm, s_ids, s_tm,
        initial_noise=s_noise, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_tp_sampler_pallas_shard_map_matches_xla():
    """The fused Pallas attention must survive a dp4 x tp2 mesh: forced
    attention_impl='pallas' resolves to the shard_map kernel (interpret
    mode on CPU) and matches the unsharded XLA sampler."""
    import dataclasses
    models = _models()
    cfg_p = dataclasses.replace(models.dit_cfg, attention_impl="pallas")
    spk, sm, ids, tm, noise = _sample(models, b=4)
    kwargs = dict(num_steps=2, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
                  cfg_min_t=0.5, cfg_max_t=1.0, sequence_length=8,
                  dtype=models.dtype)

    ref = sample_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg, spk, sm, ids, tm,
        initial_noise=noise, **kwargs)

    mesh = pmesh.make_mesh(dp=4, tp=2)
    sharded = pinf.shard_models(models, mesh)
    s_spk, s_sm, s_ids, s_tm, s_noise = pinf.place_request(
        mesh, spk, sm, ids, tm, noise)
    got = sample_euler_cfg_independent_guidances(
        sharded.dit_params, cfg_p, s_spk, s_sm, s_ids, s_tm,
        initial_noise=s_noise, mesh=mesh, **kwargs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_sequence_parallel_speaker_prefill_matches_unsharded():
    """SP/CP prefill (patch axis sharded over `model`, gathered-KV per
    layer) must equal dit.get_kv_cache_speaker exactly — each query row
    sees the same causal key set."""
    from echo_tts_tpu.models import dit as mdit
    from echo_tts_tpu.parallel.sp import get_kv_cache_speaker_sp

    models = _models()
    cfg = models.dit_cfg
    rng = np.random.default_rng(31)
    spk = jnp.asarray(rng.standard_normal(
        (2, 16 * cfg.speaker_patch_size, cfg.latent_size))
        .astype(np.float32))

    ref_k, ref_v = mdit.get_kv_cache_speaker(models.dit_params, cfg, spk)
    mesh = pmesh.make_mesh(dp=2, tp=4)
    got_k, got_v = get_kv_cache_speaker_sp(models.dit_params, cfg, spk,
                                           mesh)
    np.testing.assert_allclose(np.asarray(got_k), np.asarray(ref_k),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(ref_v),
                               atol=1e-5, rtol=1e-4)

    with pytest.raises(ValueError, match="must divide"):
        get_kv_cache_speaker_sp(
            models.dit_params, cfg,
            spk[:, :6 * cfg.speaker_patch_size], mesh)


def test_sharded_train_step_runs_and_reduces_loss():
    """The full training step compiles + executes on a dp4 x tp2 mesh and
    the loss is finite and reproducible across steps."""
    from echo_tts_tpu.config import tiny_dit_config
    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    tx = make_optimizer(lr=1e-3)
    state = create_train_state(params, tx, mesh, blockwise=False)
    step, place_batch = make_train_step(cfg, tx, mesh, dtype=jnp.float32)

    ks = jax.random.split(jax.random.PRNGKey(5), 5)
    batch = place_batch({
        "latents": jax.random.normal(ks[0], (8, 16, 80), jnp.float32) * 0.1,
        "text_ids": jax.random.randint(ks[1], (8, 12), 0, 256, jnp.int32),
        "text_mask": jnp.ones((8, 12), bool),
        "speaker_latent": jax.random.normal(ks[2], (8, 8, 80), jnp.float32),
        "speaker_mask": jnp.ones((8, 8), bool),
    })
    losses = []
    for i in range(3):
        state, loss = step(state, batch, ks[3])
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[2] < losses[0]  # same batch+rng: optimizer must descend
    assert int(state.step) == 3
