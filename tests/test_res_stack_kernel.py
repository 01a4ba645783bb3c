"""Fused decoder residual-stack kernel vs the XLA conv path
(interpret mode on CPU; on-chip usage is the decode benchmark)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.models.dac.conv import residual_unit
from echo_tts_tpu.ops.pallas.res_stack import fused_res_stack

DILS = (1, 3, 9)


def _units(rng, c):
    def conv(k):
        return {"kernel": jnp.asarray(
                    rng.standard_normal((k, c, c)).astype(np.float32)
                    * (k * c) ** -0.5),
                "bias": jnp.asarray(
                    rng.standard_normal(c).astype(np.float32) * 0.01)}
    return [{"snake1": jnp.asarray(1.0 + 0.1 * rng.standard_normal(c)
                                   .astype(np.float32)),
             "conv1": conv(7),
             "snake2": jnp.asarray(1.0 + 0.1 * rng.standard_normal(c)
                                   .astype(np.float32)),
             "conv2": conv(1)} for _ in range(3)]


def _reference(units, x):
    for u, dil in zip(units, DILS):
        x = residual_unit(u, x, dil)
    return x


@pytest.mark.parametrize("c,length,block_l", [
    (128, 512, 128),     # lane-exact channels, several tiles
    (96, 300, 128),      # channel padding + ragged final tile
    (192, 96, 256),      # single tile larger than the sequence
])
def test_fused_res_stack_matches_xla(c, length, block_l):
    rng = np.random.default_rng(c + length)
    units = _units(rng, c)
    x = jnp.asarray(rng.standard_normal((1, length, c))
                    .astype(np.float32) * 0.3)
    ref = _reference(units, x)
    got = fused_res_stack(units, x, block_l=block_l, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_res_stack_batch():
    rng = np.random.default_rng(9)
    units = _units(rng, 128)
    x = jnp.asarray(rng.standard_normal((2, 256, 128))
                    .astype(np.float32) * 0.3)
    ref = _reference(units, x)
    got = fused_res_stack(units, x, block_l=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
