"""Polynomial fast-snake (DACConfig.snake_approx) parity gates.

The decoder is bound by the snake activation's VPU sin at the published
config (docs/PERFORMANCE.md §3); sin2_poly replaces it with a
range-reduced degree-4 polynomial.  These tests pin (a) the raw
approximation bound, (b) that the opt-in decode path stays within bf16-
noise of the exact decode, and (c) that encode (codes) is untouched.

NOTE for on-chip (bf16, full-size) comparisons: with RANDOM weights the
30-layer bf16 decoder is chaotic under any evaluation reordering, so
exact-vs-approx can differ by O(0.1) — the SAME magnitude as exact-fused
vs exact-XLA with no approximation anywhere (control measured in
docs/PERFORMANCE.md §3).  These fp32/tiny tests are the meaningful
approximation gates.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dac_config
from echo_tts_tpu.models.dac import dac as jdac
from echo_tts_tpu.ops.activations import sin2_poly


def test_sin2_poly_error_bound():
    """|sin2_poly - sin^2| <= 3e-6 across many periods (Cody-Waite range
    reduction keeps large-|z| error near the polynomial's own 1.6e-6) —
    three orders of magnitude below bf16 resolution either way."""
    z = np.concatenate([
        np.linspace(-50, 50, 200001),
        np.linspace(-0.01, 0.01, 2001),      # tiny args
        np.random.default_rng(0).normal(0, 300, 10000),
    ]).astype(np.float32)
    got = np.asarray(sin2_poly(jnp.asarray(z)))
    exact = np.sin(z.astype(np.float64)) ** 2
    assert float(np.max(np.abs(got - exact))) < 3e-6


def test_snake_approx_matches_exact():
    from echo_tts_tpu.models.dac.conv import snake
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32) * 3)
    alpha = jnp.asarray(np.abs(rng.standard_normal(16)).astype(np.float32)
                        + 0.2)
    exact = np.asarray(snake(x, alpha))
    approx = np.asarray(snake(x, alpha, approx=True))
    # error in snake is (1/alpha)*poly_err <= 2e-6/alpha_min
    assert float(np.max(np.abs(exact - approx))) < 2e-5


def test_decode_zq_approx_close_and_encode_untouched(tiny_models):
    models = tiny_models
    cfg = models.dac_cfg
    cfg_ap = dataclasses.replace(cfg, snake_approx=True)
    rng = np.random.default_rng(2)
    z_q = jnp.asarray(rng.standard_normal(
        (1, 16, cfg.latent_dim)).astype(np.float32))

    exact = np.asarray(jdac.decode_zq(models.dac_params, cfg, z_q))
    approx = np.asarray(jdac.decode_zq(models.dac_params, cfg_ap, z_q))
    # audio in [-1, 1]; layered 1e-6-level snake errors stay ~1e-4
    assert float(np.max(np.abs(exact - approx))) < 1e-3
    assert not np.array_equal(exact, approx)  # the flag actually engaged

    audio = jnp.asarray(np.tanh(rng.standard_normal(
        (1, 8 * cfg.frame_length, 1))).astype(np.float32))
    codes = np.asarray(jdac.encode_codes(models.dac_params, cfg, audio))
    codes_ap = np.asarray(jdac.encode_codes(models.dac_params, cfg_ap,
                                            audio))
    np.testing.assert_array_equal(codes, codes_ap)


def test_streaming_decode_respects_snake_approx(tiny_models):
    """The incremental decoder with snake_approx must equal the one-shot
    approx decode (same state-carry exactness as the exact path)."""
    import echo_tts_tpu.models.dac.streaming as strm
    models = tiny_models
    cfg_ap = dataclasses.replace(models.dac_cfg, snake_approx=True)
    rng = np.random.default_rng(3)
    z_q = jnp.asarray(rng.standard_normal(
        (1, 12, models.dac_cfg.latent_dim)).astype(np.float32))

    full = np.asarray(jdac.decode_zq(models.dac_params, cfg_ap, z_q))
    state = strm.init_decode_state(cfg_ap)
    parts = []
    for s in range(0, 12, 4):
        audio, state = strm.decode_zq_block(models.dac_params, cfg_ap,
                                            state, z_q[:, s:s + 4])
        parts.append(np.asarray(audio))
    np.testing.assert_allclose(np.concatenate(parts, axis=1), full,
                               atol=1e-5)
