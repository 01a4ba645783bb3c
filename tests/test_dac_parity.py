"""S1-DAC codec parity vs the PyTorch reference (fp32, CPU, tiny config)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dac_config
from echo_tts_tpu.models.dac import dac as jdac
from echo_tts_tpu.models.dac.transformer import transformer_forward

from torch_ref import build_torch_dac, jax_dac_params_from_torch, rand

CFG = tiny_dac_config()
RTOL, ATOL = 2e-4, 2e-5


@pytest.fixture(scope="module")
def models():
    tdac = build_torch_dac(CFG, seed=0)
    params = jax_dac_params_from_torch(tdac, CFG)
    return tdac, params


def _audio(rng, b, length):
    return np.tanh(rand(rng, b, length)).astype(np.float32)


def test_encoder_parity(models):
    tdac, params = models
    rng = np.random.default_rng(0)
    audio = _audio(rng, 1, 256)  # multiple of hop (8)
    with torch.no_grad():
        ref = tdac.encoder(torch.tensor(audio)[:, None, :]).numpy()
    got = np.asarray(jdac.encoder_forward(
        params["encoder"], CFG, jnp.asarray(audio)[..., None]))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref,
                               rtol=RTOL, atol=ATOL)


def test_quantizer_transformer_parity(models):
    tdac, params = models
    rng = np.random.default_rng(1)
    z = rand(rng, 1, 24, CFG.latent_dim)
    with torch.no_grad():
        ref = tdac.quantizer.pre_module(
            torch.tensor(z).transpose(1, 2)).transpose(1, 2).numpy()
    got = np.asarray(transformer_forward(
        params["quantizer"]["pre"], CFG.quantizer_transformer_config(),
        jnp.asarray(z)))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_encode_codes_parity(models):
    tdac, params = models
    rng = np.random.default_rng(2)
    audio = _audio(rng, 1, 300)  # not a frame multiple: exercises padding
    with torch.no_grad():
        ref_codes, _ = tdac.encode(torch.tensor(audio)[:, None, :])
    got = np.asarray(jdac.encode_codes(params, CFG,
                                       jnp.asarray(audio)[..., None]))
    assert got.shape == tuple(ref_codes.shape)
    match = (got == ref_codes.numpy()).mean()
    # index ties at fp boundaries can flip rare entries; demand near-exact
    assert match > 0.99, f"code match ratio {match}"


def test_encode_zq_parity(models):
    tdac, params = models
    rng = np.random.default_rng(3)
    audio = _audio(rng, 1, 320)
    with torch.no_grad():
        ref = tdac.encode_zq(torch.tensor(audio)[:, None, :]).numpy()
    got = np.asarray(jdac.encode_zq(params, CFG, jnp.asarray(audio)[..., None]))
    np.testing.assert_allclose(got.transpose(0, 2, 1), ref,
                               rtol=1e-3, atol=1e-4)


def test_decode_zq_parity(models):
    tdac, params = models
    rng = np.random.default_rng(4)
    t = 16
    zq = rand(rng, 1, t, CFG.latent_dim) * 0.1
    with torch.no_grad():
        ref = tdac.decode_zq(torch.tensor(zq).transpose(1, 2)).numpy()
    got = np.asarray(jdac.decode_zq(params, CFG, jnp.asarray(zq)))
    assert got.shape == (1, t * CFG.frame_length, 1)
    np.testing.assert_allclose(got[..., 0][:, None, :], ref,
                               rtol=1e-3, atol=1e-4)


def test_get_delay_and_lengths_parity(models):
    """Analytic conv delay + length plumbing vs the live reference
    (reference: autoencoder.py:1044-1108)."""
    tdac, params = models
    assert jdac.get_delay(CFG) == tdac.get_delay()
    for n in (0, 1, 31, 32, 100, 1000):
        assert jdac.get_output_length(CFG, n) == tdac.get_output_length(n)

    rng = np.random.default_rng(6)
    audio = _audio(rng, 2, 3 * CFG.frame_length + 5)
    with torch.no_grad():
        ref_codes, ref_lens = tdac.encode(torch.tensor(audio)[:, None, :])
    codes, lens = jdac.encode_with_lengths(params, CFG,
                                           jnp.asarray(audio)[..., None])
    assert codes.shape[2] == ref_codes.shape[2]
    np.testing.assert_array_equal(np.asarray(lens),
                                  np.broadcast_to(ref_lens.numpy(), (2,)))

    # explicit per-item audio_lengths (reference: autoencoder.py:1080-1100)
    part = np.array([2 * CFG.frame_length + 1, CFG.frame_length])
    with torch.no_grad():
        _, ref_lens2 = tdac.encode(torch.tensor(audio)[:, None, :],
                                   torch.tensor(part))
    _, lens2 = jdac.encode_with_lengths(params, CFG,
                                        jnp.asarray(audio)[..., None],
                                        jnp.asarray(part))
    np.testing.assert_array_equal(np.asarray(lens2), ref_lens2.numpy())

    with torch.no_grad():
        ref_audio, ref_alens = tdac.decode(ref_codes,
                                           torch.tensor([4, 4]))
    got_audio, got_alens = jdac.decode_with_lengths(
        params, CFG, jnp.asarray(ref_codes.numpy()),
        jnp.asarray([4, 4]))
    np.testing.assert_array_equal(np.asarray(got_alens), ref_alens.numpy())
    np.testing.assert_allclose(np.asarray(got_audio)[..., 0][:, None, :],
                               ref_audio.numpy(), rtol=2e-3, atol=2e-4)


def test_roundtrip_through_pca(models):
    """ae_encode/ae_decode chain (reference: inference.py:218-229)."""
    tdac, params = models
    rng = np.random.default_rng(5)
    audio = _audio(rng, 1, 256)
    comps = np.linalg.qr(rand(rng, CFG.latent_dim, CFG.latent_dim))[0][
        :8].astype(np.float32)  # orthonormal (8, D)
    pca = {"components": jnp.asarray(comps),
           "mean": jnp.asarray(rand(rng, CFG.latent_dim) * 0.01),
           "latent_scale": 2.0}

    zq = jdac.encode_zq(params, CFG, jnp.asarray(audio)[..., None])
    lat = jdac.pca_whiten(zq, pca)
    zq2 = jdac.pca_unwhiten(lat, pca)
    audio2 = jdac.decode_zq(params, CFG, zq2)

    # torch reference of the same chain
    with torch.no_grad():
        zq_t = tdac.encode_zq(torch.tensor(audio)[:, None, :]).float()
        z = (zq_t.transpose(1, 2) - torch.tensor(np.asarray(pca["mean"]))) @ \
            torch.tensor(comps).T
        z = z * pca["latent_scale"]
        z_back = (z / pca["latent_scale"]) @ torch.tensor(comps) + \
            torch.tensor(np.asarray(pca["mean"]))
        ref = tdac.decode_zq(z_back.transpose(1, 2)).numpy()

    np.testing.assert_allclose(np.asarray(lat), z.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(audio2)[..., 0][:, None, :], ref,
                               rtol=2e-3, atol=2e-4)
