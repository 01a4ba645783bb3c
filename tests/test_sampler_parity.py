"""End-to-end sampler parity vs the reference Euler CFG sampler
(fp32, CPU, tiny model, injected torch noise)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dit_config
from echo_tts_tpu.sampler.euler import (
    build_step_plan,
    sample_euler_cfg_independent_guidances,
)

from torch_ref import build_torch_dit, import_ref_inference, jax_params_from_torch, rand

CFG = tiny_dit_config()


@pytest.fixture(scope="module")
def setup():
    tmodel = build_torch_dit(CFG, seed=0)
    params = jax_params_from_torch(tmodel, CFG)
    ref_inf = import_ref_inference()
    return tmodel, params, ref_inf


def _torch_noise(seed, b, seq, latent):
    rng = torch.Generator(device="cpu").manual_seed(seed)
    return torch.randn((b, seq, latent), dtype=torch.float32, generator=rng)


def _run_both(setup, sampler_kwargs, seed=0, b=1, seq=16):
    tmodel, params, ref_inf = setup
    rng = np.random.default_rng(seed + 100)
    ids = rng.integers(0, CFG.text_vocab_size, size=(b, 11))
    tmask = np.ones((b, 11), dtype=bool)
    tmask[:, 9:] = False
    spk_latent = rand(rng, b, 8, CFG.latent_size)
    smask = np.ones((b, 8), dtype=bool)

    with torch.no_grad():
        ref = ref_inf.sample_euler_cfg_independent_guidances(
            model=tmodel,
            speaker_latent=torch.tensor(spk_latent),
            speaker_mask=torch.tensor(smask),
            text_input_ids=torch.tensor(ids),
            text_mask=torch.tensor(tmask),
            rng_seed=seed,
            sequence_length=seq,
            **sampler_kwargs,
        ).numpy()

    noise = _torch_noise(seed, b, seq, CFG.latent_size).numpy()
    got = np.asarray(sample_euler_cfg_independent_guidances(
        params, CFG,
        jnp.asarray(spk_latent), jnp.asarray(smask),
        jnp.asarray(ids), jnp.asarray(tmask),
        sequence_length=seq,
        dtype=jnp.float32,
        initial_noise=jnp.asarray(noise),
        **sampler_kwargs,
    ))
    return got, ref


BASE = dict(
    num_steps=6, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
    cfg_min_t=0.5, cfg_max_t=1.0,
    truncation_factor=None, rescale_k=None, rescale_sigma=None,
    speaker_kv_scale=None, speaker_kv_max_layers=None, speaker_kv_min_t=None,
)


def _assert_close(got, ref):
    mse = float(np.mean((got - ref) ** 2))
    assert mse < 1e-8, f"latent MSE {mse}"
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-4)


def test_sampler_default(setup):
    got, ref = _run_both(setup, dict(BASE))
    _assert_close(got, ref)


def test_sampler_truncation_rescale(setup):
    kw = dict(BASE, truncation_factor=0.8, rescale_k=1.2, rescale_sigma=3.0)
    got, ref = _run_both(setup, kw, seed=1)
    _assert_close(got, ref)


def test_sampler_speaker_kv_scale_crossing(setup):
    kw = dict(BASE, speaker_kv_scale=1.5, speaker_kv_max_layers=1,
              speaker_kv_min_t=0.4)
    got, ref = _run_both(setup, kw, seed=2)
    _assert_close(got, ref)


def test_sampler_cfg_window_subset(setup):
    # cfg only in [0.6, 0.9]: plain steps on both sides of the window
    kw = dict(BASE, cfg_min_t=0.6, cfg_max_t=0.9, num_steps=8)
    got, ref = _run_both(setup, kw, seed=3)
    _assert_close(got, ref)


def test_step_plan_speaker_scale_never_crosses():
    # If t never reaches min_t (min_t > t_0), the reference scales the cache
    # up-front and never unscales; the plan must keep the scale on all steps.
    plan = build_step_plan(4, 0.5, 1.0, None, None,
                           speaker_kv_scale=2.0, speaker_kv_min_t=1.5)
    assert np.all(plan.speaker_scale == 2.0)

    # min_t = 0: crossing condition (t_next < 0) never fires -> stays scaled.
    plan = build_step_plan(4, 0.5, 1.0, None, None,
                           speaker_kv_scale=2.0, speaker_kv_min_t=0.0)
    assert np.all(plan.speaker_scale == 2.0)
