"""Random parameter initialization for the S1-DAC codec.

Produces pytrees with exactly the shapes tools/convert_dac.py emits from a
torch checkpoint (reference: autoencoder.py:839-1192), so benchmarks and
tests can run the codec without torch or downloaded weights.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...config import DACConfig
from ...ops.pallas.res_stack import DILATIONS


def _split(key, n):
    return list(jax.random.split(key, n))


def _conv(key, k, cin, cout, dtype, scale=None):
    fan_in = k * cin
    w = jax.random.normal(key, (k, cin, cout), jnp.float32)
    w = w * (scale if scale is not None else fan_in ** -0.5)
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def _convt(key, k, cout, cin, dtype):
    # conv_transpose kernel layout (K, C_out, C_in) (models/dac/conv.py)
    w = jax.random.normal(key, (k, cout, cin), jnp.float32) * (k * cin) ** -0.5
    return {"kernel": w.astype(dtype), "bias": jnp.zeros((cout,), dtype)}


def _res_unit(key, dim, dtype):
    k1, k2 = _split(key, 2)
    return {
        "snake1": jnp.ones((dim,), dtype),
        "conv1": _conv(k1, 7, dim, dim, dtype),
        "snake2": jnp.ones((dim,), dtype),
        "conv2": _conv(k2, 1, dim, dim, dtype),
    }


def _transformer(key, n_layers, dim, inter, dtype):
    ks = _split(key, 5)

    def lin(k, i, o):
        w = (jax.random.normal(k, (n_layers, i, o), jnp.float32) * i ** -0.5)
        return w.astype(dtype)

    return {
        "blocks": {
            "wqkv": lin(ks[0], dim, 3 * dim),
            "wo": lin(ks[1], dim, dim),
            "w1": lin(ks[2], dim, inter),
            "w3": lin(ks[3], dim, inter),
            "w2": lin(ks[4], inter, dim),
            "attn_norm": jnp.ones((n_layers, dim), dtype),
            "ffn_norm": jnp.ones((n_layers, dim), dtype),
            "attn_ls": jnp.full((n_layers, dim), 1e-2, dtype),
            "ffn_ls": jnp.full((n_layers, dim), 1e-2, dtype),
        },
        "norm": jnp.ones((dim,), dtype),
    }


def _convnext(key, dim, dtype):
    ks = _split(key, 3)
    inter = 4 * dim
    return {
        "dwconv": {
            "kernel": (jax.random.normal(ks[0], (7, 1, dim), jnp.float32)
                       * 7 ** -0.5).astype(dtype),
            "bias": jnp.zeros((dim,), dtype)},
        "norm": {"weight": jnp.ones((dim,), dtype),
                 "bias": jnp.zeros((dim,), dtype)},
        "pwconv1": {"kernel": (jax.random.normal(ks[1], (dim, inter),
                                                 jnp.float32)
                               * dim ** -0.5).astype(dtype),
                    "bias": jnp.zeros((inter,), dtype)},
        "pwconv2": {"kernel": (jax.random.normal(ks[2], (inter, dim),
                                                 jnp.float32)
                               * inter ** -0.5).astype(dtype),
                    "bias": jnp.zeros((dim,), dtype)},
        "gamma": jnp.full((dim,), 1e-6, dtype),
    }


def _vq_stack(key, n, dim, codebook_dim, codebook_size, dtype):
    ks = _split(key, 3)
    return {
        "in_proj": {
            "kernel": (jax.random.normal(ks[0], (n, dim, codebook_dim),
                                         jnp.float32) * dim ** -0.5
                       ).astype(dtype),
            "bias": jnp.zeros((n, codebook_dim), dtype)},
        "out_proj": {
            "kernel": (jax.random.normal(ks[1], (n, codebook_dim, dim),
                                         jnp.float32)
                       * codebook_dim ** -0.5).astype(dtype),
            "bias": jnp.zeros((n, dim), dtype)},
        "codebook": jax.random.normal(
            ks[2], (n, codebook_size, codebook_dim), jnp.float32
        ).astype(dtype),
    }


def init_dac_params(key: jax.Array, cfg: DACConfig,
                    dtype=jnp.float32) -> dict:
    k_enc, k_dec, k_q = _split(key, 3)

    # Encoder (autoencoder.py:903-929)
    enc_ks = _split(k_enc, 3 + len(cfg.encoder_rates))
    dim = cfg.encoder_dim
    blocks = []
    for bi, (stride, n_t) in enumerate(
            zip(cfg.encoder_rates, cfg.encoder_transformer_layers)):
        in_dim, out_dim = dim, dim * 2
        dim = out_dim
        bks = _split(enc_ks[bi], 5)
        blk = {
            "res_units": [_res_unit(bks[ri], in_dim, dtype)
                          for ri in range(3)],
            "snake": jnp.ones((in_dim,), dtype),
            "down": _conv(bks[3], 2 * stride, in_dim, out_dim, dtype),
        }
        if n_t:
            tcfg = cfg.encoder_transformer_config(out_dim, n_t)
            blk["transformer"] = _transformer(
                bks[4], n_t, out_dim, tcfg.intermediate_size, dtype)
        blocks.append(blk)
    encoder = {
        "conv_in": _conv(enc_ks[-3], 7, 1, cfg.encoder_dim, dtype),
        "blocks": blocks,
        "snake_out": jnp.ones((dim,), dtype),
        "conv_out": _conv(enc_ks[-2], 3, dim, cfg.latent_dim, dtype),
    }

    # Decoder (autoencoder.py:971-998)
    dec_ks = _split(k_dec, 3 + len(cfg.decoder_rates))
    dblocks = []
    ch = cfg.decoder_dim
    for bi, stride in enumerate(cfg.decoder_rates):
        in_dim = ch // (2 ** bi)
        out_dim = ch // (2 ** (bi + 1))
        bks = _split(dec_ks[bi], 4)
        dblocks.append({
            "snake": jnp.ones((in_dim,), dtype),
            "up": _convt(bks[0], 2 * stride, out_dim, in_dim, dtype),
            "res_units": [_res_unit(bks[ri + 1], out_dim, dtype)
                          for ri in range(3)],
        })
    final_dim = ch // (2 ** len(cfg.decoder_rates))
    decoder = {
        "conv_in": _conv(dec_ks[-3], 7, cfg.latent_dim, ch, dtype),
        "blocks": dblocks,
        "snake_out": jnp.ones((final_dim,), dtype),
        "conv_out": _conv(dec_ks[-2], 7, final_dim, 1, dtype),
    }

    # Quantizer (autoencoder.py:376-496)
    q_ks = _split(k_q, 4 + 2 * len(cfg.downsample_factor))
    d = cfg.latent_dim
    down, up = [], []
    for i, factor in enumerate(cfg.downsample_factor):
        dks = _split(q_ks[2 * i], 2)
        uks = _split(q_ks[2 * i + 1], 2)
        down.append({"conv": _conv(dks[0], factor, d, d, dtype),
                     "convnext": _convnext(dks[1], d, dtype)})
        up.append({"convt": _convt(uks[0], factor, d, d, dtype),
                   "convnext": _convnext(uks[1], d, dtype)})
    qcfg = cfg.quantizer_transformer_config()
    quantizer = {
        "downsample": down,
        "upsample": up,
        "pre": _transformer(q_ks[-4], qcfg.n_layer, d,
                            qcfg.intermediate_size, dtype),
        "post": _transformer(q_ks[-3], qcfg.n_layer, d,
                             qcfg.intermediate_size, dtype),
        "semantic": _vq_stack(q_ks[-2], 1, d, cfg.codebook_dim,
                              cfg.semantic_codebook_size, dtype),
        "residual": _vq_stack(q_ks[-1], cfg.n_codebooks, d, cfg.codebook_dim,
                              cfg.codebook_size, dtype),
    }
    return {"encoder": encoder, "decoder": decoder, "quantizer": quantizer}


def init_pca_params(key: jax.Array, latent_size: int = 80,
                    codec_dim: int = 1024) -> dict:
    """Random orthonormal-ish PCA state (reference: inference.py:86-99)."""
    w = jax.random.normal(key, (latent_size, codec_dim), jnp.float32)
    w = w / jnp.linalg.norm(w, axis=1, keepdims=True)
    return {"components": w,
            "mean": jnp.zeros((codec_dim,), jnp.float32),
            "latent_scale": 1.0}
