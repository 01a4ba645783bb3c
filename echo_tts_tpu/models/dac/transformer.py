"""Window-limited causal transformer used inside the S1-DAC quantizer and
encoder (reference: autoencoder.py:503-826).

Differences from the DiT stack that matter for parity:
  * RoPE cos/sin table is rounded to BFLOAT16 at build time even in an fp32
    model (autoencoder.py:805-813: `cache.to(dtype=bf16)`), then applied in
    fp32.  We reproduce the rounding.
  * RMSNorm casts back to the input dtype BEFORE the weight multiply
    (autoencoder.py:726-731) — opposite order from the DiT RMSNorm.
  * Attention is fused-QKV, plain softmax over a window-limited causal mask
    (window W: key j visible to query i iff i-W < j <= i,
    autoencoder.py:762-773), LayerScale residuals (init 1e-2).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...config import AETransformerConfig
from ..dit import KV  # noqa: F401  (type alias reuse)


@functools.lru_cache(maxsize=16)
def _rope_table_bf16(seq_len: int, n_elem: int, base: float) -> np.ndarray:
    """precompute_freqs_cis (autoencoder.py:805-813): (S, n_elem//2, 2),
    values rounded to bf16, returned as float32 numpy."""
    freqs = 1.0 / (base ** (np.arange(0, n_elem, 2)[: n_elem // 2]
                            .astype(np.float32) / n_elem))
    t = np.arange(seq_len, dtype=np.float32)
    angles = np.outer(t, freqs).astype(np.float32)
    table = np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    # round-trip through bf16 (ml_dtypes is a jax dependency)
    import ml_dtypes
    return table.astype(ml_dtypes.bfloat16).astype(np.float32)


def _apply_rope(x: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """apply_rotary_emb (autoencoder.py:815-826): interleaved pairs, fp32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    cos = table[None, :, None, :, 0]
    sin = table[None, :, None, :, 1]
    out = jnp.stack([
        xf[..., 0] * cos - xf[..., 1] * sin,
        xf[..., 1] * cos + xf[..., 0] * sin,
    ], axis=-1)
    return out.reshape(x.shape).astype(dtype)


def _rms_norm_ae(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """AE-style RMSNorm: normalize fp32, cast back, THEN weight
    (autoencoder.py:726-731)."""
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return xf.astype(x.dtype) * weight


def window_causal_mask(length: int, window: int | None) -> np.ndarray:
    """(S, S) bool; True = attend (autoencoder.py:762-784)."""
    i = np.arange(length)[:, None]
    j = np.arange(length)[None, :]
    mask = j <= i
    if window is not None:
        mask &= j >= np.maximum(i - window + 1, 0)
    return mask


def transformer_forward(p: dict, cfg: AETransformerConfig,
                        x: jnp.ndarray) -> jnp.ndarray:
    """WindowLimitedTransformer.forward over NLC input
    (reference: autoencoder.py:786-802 + Transformer.forward:590-608).

    p: {'blocks': stacked (L, ...) {wqkv, wo, w1, w3, w2, attn_norm,
        ffn_norm, attn_ls, ffn_ls}, 'norm': (dim,)}
    (input/output projections are Identity in every published build since
    input_dim == dim everywhere.)
    """
    b, s, d = x.shape
    h, hd = cfg.n_head, cfg.head_dim
    table = jnp.asarray(_rope_table_bf16(s, hd, cfg.rope_base))
    mask = jnp.asarray(window_causal_mask(s, cfg.window_size))[None, None]
    scale = 1.0 / (hd ** 0.5)

    def body(hh, bp):
        xn = _rms_norm_ae(hh, bp["attn_norm"], cfg.norm_eps)
        qkv = xn @ bp["wqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = _apply_rope(q.reshape(b, s, h, hd), table)
        k = _apply_rope(k.reshape(b, s, h, hd), table)
        v = v.reshape(b, s, h, hd)
        logits = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mask, logits, float("-inf"))
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = jnp.einsum("bhst,bthd->bshd", w, v).reshape(b, s, d)
        attn = attn @ bp["wo"]
        hh = hh + bp["attn_ls"] * attn

        xn = _rms_norm_ae(hh, bp["ffn_norm"], cfg.norm_eps)
        ff = (jax.nn.silu(xn @ bp["w1"]) * (xn @ bp["w3"])) @ bp["w2"]
        hh = hh + bp["ffn_ls"] * ff
        return hh, None

    x, _ = jax.lax.scan(body, x, p["blocks"])
    return _rms_norm_ae(x, p["norm"], cfg.norm_eps)
