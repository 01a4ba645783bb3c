"""Module-level parity of the JAX EchoDiT vs the PyTorch reference
(fp32, CPU, random weights, tiny config)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dit_config
from echo_tts_tpu.models import dit as jdit

from torch_ref import build_torch_dit, jax_params_from_torch, rand

CFG = tiny_dit_config()
RTOL, ATOL = 2e-4, 2e-5


@pytest.fixture(scope="module")
def models():
    tmodel = build_torch_dit(CFG, seed=0)
    params = jax_params_from_torch(tmodel, CFG)
    return tmodel, params


def _np(x):
    return np.asarray(x)


def test_text_encoder_parity(models):
    tmodel, params = models
    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.text_vocab_size, size=(2, 12))
    mask = np.ones((2, 12), dtype=bool)
    mask[1, 7:] = False

    with torch.no_grad():
        ref = tmodel.text_encoder(torch.tensor(ids), torch.tensor(mask)).numpy()
    got = _np(jdit.text_encoder(params, CFG, jnp.asarray(ids), jnp.asarray(mask)))
    # padded key positions are masked; compare only valid queries
    np.testing.assert_allclose(got[0], ref[0], rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(got[1, :7], ref[1, :7], rtol=RTOL, atol=ATOL)


def test_speaker_encoder_parity(models):
    tmodel, params = models
    rng = np.random.default_rng(1)
    latent = rand(rng, 2, 16, CFG.latent_size)
    with torch.no_grad():
        ref = tmodel.speaker_encoder(torch.tensor(latent)).numpy()
    got = _np(jdit._patch_encoder(params["speaker_encoder"], CFG,
                                  jnp.asarray(latent)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_kv_caches_parity(models):
    tmodel, params = models
    rng = np.random.default_rng(2)
    ids = rng.integers(0, CFG.text_vocab_size, size=(1, 9))
    mask = np.ones((1, 9), dtype=bool)
    latent = rand(rng, 1, 8, CFG.latent_size)

    with torch.no_grad():
        ref_text = tmodel.get_kv_cache_text(torch.tensor(ids), torch.tensor(mask))
        ref_spk = tmodel.get_kv_cache_speaker(torch.tensor(latent))
        ref_lat = tmodel.get_kv_cache_latent(torch.tensor(latent))

    k_text, v_text = jdit.get_kv_cache_text(params, CFG, jnp.asarray(ids),
                                            jnp.asarray(mask))
    k_spk, v_spk = jdit.get_kv_cache_speaker(params, CFG, jnp.asarray(latent))
    k_lat, v_lat = jdit.get_kv_cache_latent(params, CFG, jnp.asarray(latent))

    for i in range(CFG.num_layers):
        np.testing.assert_allclose(_np(k_text[i]), ref_text[i][0].numpy(),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(_np(v_text[i]), ref_text[i][1].numpy(),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(_np(k_spk[i]), ref_spk[i][0].numpy(),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(_np(v_spk[i]), ref_spk[i][1].numpy(),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(_np(k_lat[i]), ref_lat[i][0].numpy(),
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(_np(v_lat[i]), ref_lat[i][1].numpy(),
                                   rtol=RTOL, atol=ATOL)


def _prefill_torch(tmodel, ids, tmask, latent):
    with torch.no_grad():
        kv_text = tmodel.get_kv_cache_text(torch.tensor(ids), torch.tensor(tmask))
        kv_spk = tmodel.get_kv_cache_speaker(torch.tensor(latent))
    return kv_text, kv_spk


def test_forward_parity_basic(models):
    tmodel, params = models
    rng = np.random.default_rng(3)
    b, s = 2, 8
    ids = rng.integers(0, CFG.text_vocab_size, size=(b, 9))
    tmask = np.ones((b, 9), dtype=bool)
    tmask[1, 5:] = False
    spk_latent = rand(rng, b, 8, CFG.latent_size)
    smask = np.ones((b, 8), dtype=bool)
    smask[0, 4:] = False
    x = rand(rng, b, s, CFG.latent_size)
    t = np.full((b,), 0.37, dtype=np.float32)

    kv_text_t, kv_spk_t = _prefill_torch(tmodel, ids, tmask, spk_latent)
    with torch.no_grad():
        ref = tmodel(
            x=torch.tensor(x), t=torch.tensor(t),
            text_mask=torch.tensor(tmask), speaker_mask=torch.tensor(smask),
            kv_cache_text=kv_text_t, kv_cache_speaker=kv_spk_t,
        ).numpy()

    kv_text = jdit.get_kv_cache_text(params, CFG, jnp.asarray(ids),
                                     jnp.asarray(tmask))
    kv_spk = jdit.get_kv_cache_speaker(params, CFG, jnp.asarray(spk_latent))
    got = _np(jdit.dit_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(tmask), jnp.asarray(smask), kv_text, kv_spk))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_forward_parity_with_latent_prefix(models):
    """Blockwise path: latent KV + start_pos offset + position-gated mask
    (reference: model.py:229-244)."""
    tmodel, params = models
    rng = np.random.default_rng(4)
    b, s, start_pos = 1, 8, 16
    n_lat = 8  # latents in prefix encoder space (positions 0,4,...,28)
    ids = rng.integers(0, CFG.text_vocab_size, size=(b, 7))
    tmask = np.ones((b, 7), dtype=bool)
    spk_latent = rand(rng, b, 8, CFG.latent_size)
    smask = np.ones((b, 8), dtype=bool)
    prefix = rand(rng, b, n_lat * CFG.speaker_patch_size, CFG.latent_size)
    x = rand(rng, b, s, CFG.latent_size)
    t = np.full((b,), 0.8, dtype=np.float32)

    kv_text_t, kv_spk_t = _prefill_torch(tmodel, ids, tmask, spk_latent)
    with torch.no_grad():
        kv_lat_t = tmodel.get_kv_cache_latent(torch.tensor(prefix))
        ref = tmodel(
            x=torch.tensor(x), t=torch.tensor(t),
            text_mask=torch.tensor(tmask), speaker_mask=torch.tensor(smask),
            kv_cache_text=kv_text_t, kv_cache_speaker=kv_spk_t,
            start_pos=start_pos, kv_cache_latent=kv_lat_t,
        ).numpy()

    kv_text = jdit.get_kv_cache_text(params, CFG, jnp.asarray(ids),
                                     jnp.asarray(tmask))
    kv_spk = jdit.get_kv_cache_speaker(params, CFG, jnp.asarray(spk_latent))
    kv_lat = jdit.get_kv_cache_latent(params, CFG, jnp.asarray(prefix))
    lat_mask = jdit.latent_prefix_mask(b, kv_lat[0].shape[2], start_pos,
                                       CFG.speaker_patch_size)
    got = _np(jdit.dit_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(tmask), jnp.asarray(smask), kv_text, kv_spk,
        start_pos=start_pos, kv_latent=kv_lat,
        latent_mask=jnp.asarray(lat_mask)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_cfg_broadcast_equals_repeated_kv(models):
    """G=3 q-batch with B=1 KV must equal running each branch separately."""
    tmodel, params = models
    rng = np.random.default_rng(5)
    s = 8
    ids = rng.integers(0, CFG.text_vocab_size, size=(1, 9))
    tmask = np.ones((1, 9), dtype=bool)
    spk_latent = rand(rng, 1, 8, CFG.latent_size)
    smask = np.ones((1, 8), dtype=bool)
    x1 = rand(rng, 1, s, CFG.latent_size)
    t = np.full((3,), 0.6, dtype=np.float32)

    kv_text = jdit.get_kv_cache_text(params, CFG, jnp.asarray(ids),
                                     jnp.asarray(tmask))
    kv_spk = jdit.get_kv_cache_speaker(params, CFG, jnp.asarray(spk_latent))

    x3 = np.concatenate([x1, x1, x1], axis=0)
    full_tmask = np.concatenate([tmask, np.zeros_like(tmask), tmask], axis=0)
    full_smask = np.concatenate([smask, smask, np.zeros_like(smask)], axis=0)

    out3 = _np(jdit.dit_forward(
        params, CFG, jnp.asarray(x3), jnp.asarray(t),
        jnp.asarray(full_tmask), jnp.asarray(full_smask), kv_text, kv_spk))

    for g in range(3):
        out1 = _np(jdit.dit_forward(
            params, CFG, jnp.asarray(x1), jnp.asarray(t[g:g + 1]),
            jnp.asarray(full_tmask[g:g + 1]), jnp.asarray(full_smask[g:g + 1]),
            kv_text, kv_spk))
        np.testing.assert_allclose(out3[g], out1[0], rtol=RTOL, atol=ATOL)


def test_speaker_scale_matches_scaled_cache(models):
    """Functional speaker-KV scale == reference's in-place cache scaling
    (inference.py:408-414)."""
    tmodel, params = models
    rng = np.random.default_rng(6)
    s, scale_val, max_layers = 8, 2.5, 1
    ids = rng.integers(0, CFG.text_vocab_size, size=(1, 9))
    tmask = np.ones((1, 9), dtype=bool)
    spk_latent = rand(rng, 1, 8, CFG.latent_size)
    smask = np.ones((1, 8), dtype=bool)
    x = rand(rng, 1, s, CFG.latent_size)
    t = np.full((1,), 0.9, dtype=np.float32)

    kv_text_t, kv_spk_t = _prefill_torch(tmodel, ids, tmask, spk_latent)
    # reference-style in-place scaling of the first max_layers layers
    kv_spk_scaled = [
        (k * scale_val, v * scale_val) if i < max_layers else (k, v)
        for i, (k, v) in enumerate(kv_spk_t)
    ]
    with torch.no_grad():
        ref = tmodel(
            x=torch.tensor(x), t=torch.tensor(t),
            text_mask=torch.tensor(tmask), speaker_mask=torch.tensor(smask),
            kv_cache_text=kv_text_t, kv_cache_speaker=kv_spk_scaled,
        ).numpy()

    kv_text = jdit.get_kv_cache_text(params, CFG, jnp.asarray(ids),
                                     jnp.asarray(tmask))
    kv_spk = jdit.get_kv_cache_speaker(params, CFG, jnp.asarray(spk_latent))
    layer_scale = jnp.where(jnp.arange(CFG.num_layers) < max_layers,
                            scale_val, 1.0).astype(jnp.float32)
    got = _np(jdit.dit_forward(
        params, CFG, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(tmask), jnp.asarray(smask), kv_text, kv_spk,
        speaker_scale_by_layer=layer_scale))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)
