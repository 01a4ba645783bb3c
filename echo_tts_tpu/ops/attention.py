"""Attention ops.

`sdpa` mirrors torch F.scaled_dot_product_attention semantics with boolean
masks (True = attend), fp32 logits/softmax, and 1/sqrt(head_dim) scaling
(reference usage: model.py:148-154, model.py:255-261, autoencoder.py:698-702).

The hot DiT path has a fused Pallas kernel in ops/pallas/joint_attention.py;
this module is the XLA fallback and the reference semantics definition.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: (B, S, H, D); k, v: (B, T, H, D).
    mask: boolean, broadcastable to (B, H, S, T); True = attend.
    Returns (B, S, H, D) in v.dtype.
    """
    d = q.shape[-1]
    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    ) * scale

    if is_causal:
        s, t = q.shape[1], k.shape[1]
        causal = jnp.tril(jnp.ones((s, t), dtype=bool), k=t - s)
        logits = jnp.where(causal[None, None], logits, NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)

    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhst,bthd->bshd", weights, v)


def padding_mask_to_attn(mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) key-padding mask -> (B, 1, 1, T), as in model.py:144-147."""
    return mask[:, None, None, :]
