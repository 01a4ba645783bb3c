"""Timestep embedding (reference: model.py:27-43)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_timestep_embedding(timestep: jnp.ndarray, embed_size: int) -> jnp.ndarray:
    """Sinusoidal embedding with frequencies scaled by 1000, [cos, sin] concat.

    timestep: (B,) in model dtype.  Frequencies are float32; the product
    promotes to float32 and the result is cast back to the timestep dtype,
    exactly as the reference does (model.py:35-43).
    """
    assert embed_size % 2 == 0
    half = embed_size // 2
    freqs = 1000.0 * np.exp(
        -np.log(10000.0) * np.arange(half, dtype=np.float32) / half
    ).astype(np.float32)
    args = timestep[..., None].astype(jnp.float32) * jnp.asarray(freqs)[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    return embedding.astype(timestep.dtype)
