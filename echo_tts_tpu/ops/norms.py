"""Normalization ops with the reference's exact fp32-island cast discipline.

RMSNorm (reference: model.py:86-104) and LowRankAdaLN
(reference: model.py:46-83) both upcast the activation to float32, normalize,
multiply/modulate, and cast back to the input dtype.  Reproducing the cast
points exactly is required to keep bf16 parity drift within tolerance.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """fp32 RMS norm; weight may be (D,) or (H, D) for QK-norm.

    Matches model.py:99-104: normalize over the LAST axis only, multiply by
    weight in fp32 (weight promotes), cast back.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    out = xf * weight
    return out.astype(dtype)


def low_rank_adaln(
    x: jnp.ndarray,
    cond_embed: jnp.ndarray,
    p: dict,
    eps: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Low-rank AdaLN (reference: model.py:64-83).

    cond_embed: (B, 1, 3*M), chunked into (shift, scale, gate); each is
    refined by a low-rank residual `up(down(silu(c))) + c` where only the
    up-projection carries a bias.  x is RMS-normalized (no weight) in fp32,
    modulated `x * (scale + 1) + shift`, cast back; gate passes through tanh
    in the conditioning dtype.

    p: {'shift_down','scale_down','gate_down': (M, R),
        'shift_up','scale_up','gate_up': {'kernel': (R, M), 'bias': (M,)}}
    """
    shift, scale, gate = jnp.split(cond_embed, 3, axis=-1)

    def refine(c, down, up):
        r = jax.nn.silu(c) @ down
        return r @ up["kernel"] + up["bias"] + c

    shift = refine(shift, p["shift_down"], p["shift_up"])
    scale = refine(scale, p["scale_down"], p["scale_up"])
    gate = refine(gate, p["gate_down"], p["gate_up"])

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    xf = xf * (scale + 1) + shift

    gate = jnp.tanh(gate)
    return xf.astype(dtype), gate
