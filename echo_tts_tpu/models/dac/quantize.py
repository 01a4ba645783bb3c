"""Vector quantization for the S1-DAC codec (NLC layout).

Re-implements (reference: autoencoder.py:117-247):
  * VectorQuantize — factorized, L2-normalized nearest-neighbor lookup
    (ViT-VQGAN style); in/out 1x1 convs become plain matmuls.
  * ResidualVectorQuantize — SoundStream-style stack; `from_codes`
    reconstructs z_q as the sum of out-projected codebook entries.

Parameter layout per codebook i:
  {'in_proj': {'kernel': (D, Dc), 'bias': (Dc,)},
   'out_proj': {'kernel': (Dc, D), 'bias': (D,)},
   'codebook': (N, Dc)}
Codebooks within one RVQ share shapes, so they are STACKED (n_codebooks
leading axis) and scanned.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12):
    """torch F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def vq_encode(p: dict, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One codebook: z (B, T, D) -> (z_q (B, T, D), indices (B, T)).

    Matches VectorQuantize.forward + decode_latents
    (autoencoder.py:130-157): distances between L2-normalized projections
    and L2-normalized codebook; z_q uses the RAW codebook entry.
    """
    z_e = z @ p["in_proj"]["kernel"] + p["in_proj"]["bias"]  # (B, T, Dc)
    enc = _l2_normalize(z_e)
    cb = _l2_normalize(p["codebook"])
    dist = (jnp.sum(enc * enc, axis=-1, keepdims=True)
            - 2.0 * enc @ cb.T
            + jnp.sum(cb * cb, axis=-1)[None, None, :])
    indices = jnp.argmax(-dist, axis=-1)
    z_q = p["codebook"][indices]
    z_q = z_q @ p["out_proj"]["kernel"] + p["out_proj"]["bias"]
    return z_q, indices


def rvq_encode(p: dict, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-stack residual encode (eval path of
    ResidualVectorQuantize.forward, autoencoder.py:184-221).

    p: stacked codebook params (leading axis n_codebooks).
    Returns (z_q_sum (B, T, D), codes (B, n_codebooks, T)).
    """

    def body(carry, pi):
        residual, z_q = carry
        z_q_i, idx = vq_encode(pi, residual)
        return (residual - z_q_i, z_q + z_q_i), idx

    (_, z_q), codes = jax.lax.scan(
        body, (z, jnp.zeros_like(z)), p)
    return z_q, jnp.transpose(codes, (1, 0, 2))


def rvq_from_codes(p: dict, codes: jnp.ndarray) -> jnp.ndarray:
    """ResidualVectorQuantize.from_codes z_q sum
    (autoencoder.py:223-232).  codes: (B, n_codebooks, T)."""

    def body(z_q, inp):
        pi, idx = inp
        z_p = pi["codebook"][idx]
        z_q_i = z_p @ pi["out_proj"]["kernel"] + pi["out_proj"]["bias"]
        return z_q + z_q_i, None

    b, n, t = codes.shape
    d = p["out_proj"]["kernel"].shape[-1]
    init = jnp.zeros((b, t, d), p["out_proj"]["kernel"].dtype)
    z_q, _ = jax.lax.scan(body, init, (p, jnp.transpose(codes, (1, 0, 2))))
    return z_q
