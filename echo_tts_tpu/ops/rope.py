"""Rotary position embeddings, TPU-friendly (cos/sin, no complex dtype).

The reference uses complex-valued RoPE over interleaved (even, odd) pairs
(reference: model.py:9-24) and a half-the-heads variant in the DiT joint
attention (reference: model.py:199-202, split along the HEADS axis).
The autoencoder has its own RoPE with the cos/sin table rounded to bfloat16
at build time (reference: autoencoder.py:805-826).

All rotations here are computed in float32 and cast back to the input dtype,
matching the reference cast discipline exactly.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def precompute_freqs_cis(dim: int, end: int, theta: float = 10000.0) -> np.ndarray:
    """cos/sin table of shape (end, dim//2, 2), float32 NUMPY array.

    Equivalent to the reference complex table (model.py:9-14): entry [t, j]
    is (cos(t * theta^(-2j/dim)), sin(...)).
    Pure numpy so callers can cache it and slice it at trace time.
    """
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2)[: dim // 2].astype(np.float32) / dim))
    t = np.arange(end, dtype=np.float32)
    angles = np.outer(t, freqs).astype(np.float32)
    return np.stack([np.cos(angles), np.sin(angles)], axis=-1).astype(np.float32)


def apply_rotary_emb(x: jnp.ndarray, freqs_cis: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs of the last dim of x: (B, S, H, D).

    freqs_cis: (S, D//2, 2) float32 (broadcast over batch and heads),
    mirroring model.py:17-24 where freqs_cis[..., None, :] broadcasts over
    the head axis.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xr = xf.reshape(*x.shape[:-1], -1, 2)
    x_even, x_odd = xr[..., 0], xr[..., 1]
    cos = freqs_cis[..., 0][:, None, :]  # (S, 1, D//2)
    sin = freqs_cis[..., 1][:, None, :]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_odd * cos + x_even * sin
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(dtype)


def apply_rotary_emb_half_heads(x: jnp.ndarray, freqs_cis: jnp.ndarray) -> jnp.ndarray:
    """RoPE on the first half of the HEADS only (model.py:199-202).

    x: (B, S, H, D); the reference chunks along dim=-2 (heads) and rotates
    only the first chunk.
    """
    h = x.shape[-2]
    x1, x2 = x[..., : h // 2, :], x[..., h // 2 :, :]
    return jnp.concatenate([apply_rotary_emb(x1, freqs_cis), x2], axis=-2)
