"""Fish S1-DAC codec top level, NLC layout, pure functions.

Re-implements (reference: autoencoder.py:839-1138):
  * Encoder: causal conv stack, dims 64->128->256->512->1024,
    strides (2,4,8,8), 3 dilated residual units + snake per block, a
    window-512 causal transformer in the LAST block only
    (encoder_transformer_layers=[0,0,0,4], autoencoder.py:1188).
  * Decoder: mirror conv stack 1536->96, rates (8,8,4,2), final conv+tanh.
    The reference DecoderBlock builds but NEVER REGISTERS its transformer
    (autoencoder.py:944-965), so the decoder has no transformer here either.
  * DownsampleResidualVectorQuantize: conv downsample x(2,2) -> pre_module
    (window-128 causal transformer) -> semantic RVQ (1 codebook, 4096) +
    residual RVQ (9 codebooks, 1024) -> post_module -> conv upsample.
  * encode_zq / decode_zq — the two entry points the TTS pipeline uses
    (autoencoder.py:1116-1132): zq lives BETWEEN the quantizers and the
    post_module.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...config import DACConfig
from ...ops.pallas.res_stack import (DILATIONS, fused_res_stack,
                                     res_stack_eligible)
from .conv import (causal_conv1d, causal_conv_transpose1d, convnext_block,
                   residual_unit, snake)
from .quantize import rvq_encode, rvq_from_codes
from .transformer import transformer_forward


def _res_stack(res_units, x: jnp.ndarray,
               approx_snake: bool = False) -> jnp.ndarray:
    """Three dilated residual units; fused Pallas chain on a single real
    accelerator at bandwidth-bound shapes (ops/pallas/res_stack.py), the
    unrolled XLA convs otherwise."""
    if res_stack_eligible(x.shape[1], x.shape[2]):
        return fused_res_stack(res_units, x, approx_snake=approx_snake)
    for ri, dil in enumerate(DILATIONS):
        x = residual_unit(res_units[ri], x, dil, approx_snake=approx_snake)
    return x


# ---------------------------------------------------------------------------
# Encoder / Decoder conv stacks
# ---------------------------------------------------------------------------

def encoder_forward(p: dict, cfg: DACConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """audio: (B, L, 1) -> (B, L/512, 1024) (reference: autoencoder.py:903-929)."""
    x = causal_conv1d(audio, p["conv_in"]["kernel"], p["conv_in"]["bias"])
    dim = cfg.encoder_dim
    for bi, (stride, n_t) in enumerate(
            zip(cfg.encoder_rates, cfg.encoder_transformer_layers)):
        dim *= 2
        bp = p["blocks"][bi]
        x = _res_stack(bp["res_units"], x)
        x = snake(x, bp["snake"])
        x = causal_conv1d(x, bp["down"]["kernel"], bp["down"]["bias"],
                          stride=stride)
        if n_t:
            x = transformer_forward(
                bp["transformer"],
                cfg.encoder_transformer_config(dim, n_t), x)
    x = snake(x, p["snake_out"])
    x = causal_conv1d(x, p["conv_out"]["kernel"], p["conv_out"]["bias"])
    return x


def decoder_forward(p: dict, cfg: DACConfig, z: jnp.ndarray) -> jnp.ndarray:
    """z: (B, T, 1024) -> audio (B, T*512, 1) in [-1, 1]
    (reference: autoencoder.py:932-998).  cfg.snake_approx swaps the
    decoder's snakes for the polynomial sin^2 (conv.py:sin2_poly)."""
    ap = cfg.snake_approx
    x = causal_conv1d(z, p["conv_in"]["kernel"], p["conv_in"]["bias"])
    for bi, stride in enumerate(cfg.decoder_rates):
        bp = p["blocks"][bi]
        x = snake(x, bp["snake"], approx=ap)
        x = causal_conv_transpose1d(x, bp["up"]["kernel"], bp["up"]["bias"],
                                    stride=stride)
        x = _res_stack(bp["res_units"], x, approx_snake=ap)
    x = snake(x, p["snake_out"], approx=ap)
    x = causal_conv1d(x, p["conv_out"]["kernel"], p["conv_out"]["bias"])
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# Quantizer
# ---------------------------------------------------------------------------

def _downsample(p: dict, cfg: DACConfig, z: jnp.ndarray) -> jnp.ndarray:
    for i, factor in enumerate(cfg.downsample_factor):
        z = causal_conv1d(z, p[i]["conv"]["kernel"], p[i]["conv"]["bias"],
                          stride=factor)
        z = convnext_block(p[i]["convnext"], z)
    return z


def _upsample(p: dict, cfg: DACConfig, z: jnp.ndarray) -> jnp.ndarray:
    # reversed(enumerate(factor)) in the reference (autoencoder.py:427-435)
    for i, factor in enumerate(reversed(cfg.downsample_factor)):
        z = causal_conv_transpose1d(z, p[i]["convt"]["kernel"],
                                    p[i]["convt"]["bias"], stride=factor)
        z = convnext_block(p[i]["convnext"], z)
    return z


def quantizer_encode_codes(p: dict, cfg: DACConfig,
                           z: jnp.ndarray) -> jnp.ndarray:
    """z: encoder output (B, T, 1024) -> codes (B, 10, T/4)
    (reference: autoencoder.py:451-469, eval path)."""
    z = _downsample(p["downsample"], cfg, z)
    z = transformer_forward(p["pre"], cfg.quantizer_transformer_config(), z)
    sem_zq, sem_codes = rvq_encode(p["semantic"], z)
    residual = z - sem_zq
    _, res_codes = rvq_encode(p["residual"], residual)
    return jnp.concatenate([sem_codes, res_codes], axis=1)


def zq_from_codes(p: dict, cfg: DACConfig, codes: jnp.ndarray) -> jnp.ndarray:
    """codes (B, 10, T) -> z_q (B, T, 1024): clamp then sum semantic +
    residual from_codes (reference: autoencoder.py:1117-1126)."""
    sem = jnp.clip(codes[:, :1], 0, cfg.semantic_codebook_size - 1)
    res = jnp.clip(codes[:, 1:], 0, cfg.codebook_size - 1)
    return (rvq_from_codes(p["semantic"], sem)
            + rvq_from_codes(p["residual"], res))


# ---------------------------------------------------------------------------
# DAC top (reference: autoencoder.py:1001-1138)
# ---------------------------------------------------------------------------

def encode_codes(params: dict, cfg: DACConfig,
                 audio: jnp.ndarray) -> jnp.ndarray:
    """audio (B, L, 1) -> codes (B, 10, ceil(L/2048)); right-pads to a
    frame_length multiple (autoencoder.py:1088-1100)."""
    length = audio.shape[1]
    right = math.ceil(length / cfg.frame_length) * cfg.frame_length - length
    audio = jnp.pad(audio, ((0, 0), (0, right), (0, 0)))
    z = encoder_forward(params["encoder"], cfg, audio)
    return quantizer_encode_codes(params["quantizer"], cfg, z)


def encode_zq(params: dict, cfg: DACConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """audio (B, L, 1) -> z_q (B, ceil(L/2048), 1024)
    (reference: autoencoder.py:1116-1126; NLC instead of NCL)."""
    codes = encode_codes(params, cfg, audio)
    return zq_from_codes(params["quantizer"], cfg, codes)


def decode_zq(params: dict, cfg: DACConfig, z_q: jnp.ndarray) -> jnp.ndarray:
    """z_q (B, T, 1024) -> audio (B, T*2048, 1)
    (reference: autoencoder.py:1128-1132)."""
    q = params["quantizer"]
    z = transformer_forward(q["post"], cfg.quantizer_transformer_config(), z_q)
    z = _upsample(q["upsample"], cfg, z)
    return decoder_forward(params["decoder"], cfg, z)


def decode_codes(params: dict, cfg: DACConfig,
                 codes: jnp.ndarray) -> jnp.ndarray:
    """codes -> audio; quantizer.decode + decoder
    (reference: autoencoder.py:486-496, 1102-1108)."""
    return decode_zq(params, cfg, zq_from_codes(params["quantizer"], cfg, codes))


# ---------------------------------------------------------------------------
# Analytic delay / length plumbing (reference: autoencoder.py:1044-1108)
# ---------------------------------------------------------------------------

def _conv_layer_specs(cfg: DACConfig):
    """Ordered (is_transpose, kernel, stride, dilation) for every conv in
    the codec, in the reference's module-registration order (encoder ->
    quantizer -> decoder; autoencoder.py:1028-1041 walks `self.modules()`).
    k=1 convs are length-neutral but kept for exact order fidelity."""
    specs = []
    # Encoder (autoencoder.py:903-929): conv_in k7; per block 3 residual
    # units (k7 dilated + k1) then the k=2s strided down conv; conv_out k3.
    specs.append((False, 7, 1, 1))
    for stride in cfg.encoder_rates:
        for dil in DILATIONS:
            specs += [(False, 7, 1, dil), (False, 1, 1, 1)]
        specs.append((False, 2 * stride, stride, 1))
    specs.append((False, 3, 1, 1))
    # Quantizer (autoencoder.py:398-435): VQ 1x1 in/out projs, then
    # downsample (conv k=f s=f + ConvNeXt dwconv k7), then upsample
    # (transposed conv k=f s=f + ConvNeXt dwconv k7).
    for _ in range(1 + cfg.n_codebooks):
        specs += [(False, 1, 1, 1), (False, 1, 1, 1)]
    for factor in cfg.downsample_factor:
        specs += [(False, factor, factor, 1), (False, 7, 1, 1)]
    for factor in reversed(cfg.downsample_factor):
        specs += [(True, factor, factor, 1), (False, 7, 1, 1)]
    # Decoder (autoencoder.py:971-998): conv_in k7; per block transposed
    # k=2s up conv then 3 residual units; conv_out k7.
    specs.append((False, 7, 1, 1))
    for stride in cfg.decoder_rates:
        specs.append((True, 2 * stride, stride, 1))
        for dil in DILATIONS:
            specs += [(False, 7, 1, dil), (False, 1, 1, 1)]
    specs.append((False, 7, 1, 1))
    return specs


def get_output_length(cfg: DACConfig, input_length: int) -> int:
    """Encoder output length for a given sample count
    (reference: autoencoder.py:1045-1049)."""
    length = input_length
    for stride in cfg.encoder_rates:
        length = math.ceil(length / stride)
    return length


def get_delay(cfg: DACConfig) -> int:
    """Analytic codec delay in samples (reference: autoencoder.py:1052-1068):
    walk every conv backwards through receptive-field arithmetic from a
    zero-length output and halve the required input length."""
    l_out = get_output_length(cfg, 0)
    length = l_out
    for is_t, k, s, d in reversed(_conv_layer_specs(cfg)):
        if is_t:
            length = (length - d * (k - 1) - 1) / s + 1
        else:
            length = (length - 1) * s + d * (k - 1) + 1
        length = math.ceil(length)
    return (length - l_out) // 2


def encode_with_lengths(params: dict, cfg: DACConfig, audio: jnp.ndarray,
                        audio_lengths: Optional[jnp.ndarray] = None):
    """encode() with per-item length plumbing
    (reference: autoencoder.py:1080-1100): returns (codes (B, 10, T),
    indices_lens (B,) = ceil(valid_samples / frame_length))."""
    length = audio.shape[1]
    right = math.ceil(length / cfg.frame_length) * cfg.frame_length - length
    if audio_lengths is None:
        audio_lengths = jnp.full((audio.shape[0],), length + right,
                                 jnp.int32)
    codes = encode_codes(params, cfg, audio)
    indices_lens = jnp.ceil(audio_lengths / cfg.frame_length).astype(
        jnp.int32)
    return codes, indices_lens


def decode_with_lengths(params: dict, cfg: DACConfig, codes: jnp.ndarray,
                        feature_lengths: jnp.ndarray):
    """decode() with length plumbing (reference: autoencoder.py:1102-1108):
    returns (audio (B, T*frame_length, 1), audio_lengths (B,))."""
    audio = decode_codes(params, cfg, codes)
    return audio, feature_lengths * cfg.frame_length


# ---------------------------------------------------------------------------
# PCA whitening between codec space (1024) and DiT latent space (80)
# (reference: inference.py:86-99, 218-229)
# ---------------------------------------------------------------------------

def pca_whiten(z_q: jnp.ndarray, pca: dict) -> jnp.ndarray:
    """z_q (B, T, 1024) -> latents (B, T, 80):
    (z_q - mean) @ W^T * scale (inference.py:218-224)."""
    z = (z_q.astype(jnp.float32) - pca["mean"]) @ pca["components"].T
    return z * pca["latent_scale"]


def pca_unwhiten(latents: jnp.ndarray, pca: dict) -> jnp.ndarray:
    """latents (B, T, 80) -> z_q (B, T, 1024):
    (z / scale) @ W + mean (inference.py:227-229)."""
    return (latents / pca["latent_scale"]) @ pca["components"] + pca["mean"]
