"""Causal 1D conv machinery for the S1-DAC codec, NLC layout.

Re-implements the reference conv stack (reference: autoencoder.py:38-109,
264-373) in (batch, time, channels) layout — TPU/XLA's preferred layout —
with weight-norm already folded into plain kernels by the converter.

Causal padding amounts are pure functions of static lengths, so they are
resolved at trace time (the reference computes them from runtime shapes,
autoencoder.py:49-56, which is equivalent under static shapes).
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from ...ops.activations import sin2_poly

_DN = ("NHC", "HIO", "NHC")


def causal_conv1d(x: jnp.ndarray, kernel: jnp.ndarray,
                  bias: Optional[jnp.ndarray], *, stride: int = 1,
                  dilation: int = 1, groups: int = 1,
                  history: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """CausalConvNet.forward (reference: autoencoder.py:285-289).

    x: (B, L, C_in); kernel: (K, C_in // groups, C_out).
    Left-pad (k_eff - stride), right-pad so strides cover the length:
    output length = ceil(L / stride).

    `history` (B, k_eff - stride, C_in) replaces the causal zero left-pad
    with the previous block's raw input tail — the streaming-decode state
    (models/dac/streaming.py).  Zeros history == the one-shot left pad, so
    block-0 streaming is exactly the one-shot op.

    XLA's TPU conv lowering runs far below MXU peak for these narrow-channel
    1-D shapes (measured: the S1-DAC decoder at 365 ms vs ~30 ms roofline),
    so the hot cases lower to explicit MXU matmuls instead:
      * stride-1 dense conv  -> sum over K of shifted-slice matmuls
      * depthwise (groups=C) -> sum over K of shifted elementwise multiplies
      * strided conv         -> reshape L into (L/s, s*C) then one matmul
                                per tap group (K multiple of s) or the
                                general conv otherwise
    """
    k = kernel.shape[0]
    k_eff = (k - 1) * dilation + 1
    pad_left = k_eff - stride
    length = x.shape[1]
    # get_extra_padding_for_conv1d (autoencoder.py:49-56) with
    # padding_total = k_eff - stride reduces to ceil(L/s)*s - L.
    extra = math.ceil(length / stride) * stride - length
    if history is not None:
        if history.shape[1] != pad_left or extra != 0:
            raise ValueError(
                f"streaming conv needs history length {pad_left} (got "
                f"{history.shape[1]}) and block length % stride == 0")
        x = jnp.concatenate([history.astype(x.dtype), x], axis=1)
    else:
        x = jnp.pad(x, ((0, 0), (pad_left, extra), (0, 0)))
    out_len = (length + extra) // stride

    if groups == 1 and stride == 1:
        # y[t] = sum_k x_pad[t + k*d] @ W[k]
        out = jnp.zeros((x.shape[0], out_len, kernel.shape[2]), x.dtype)
        for kk in range(k):
            out = out + x[:, kk * dilation: kk * dilation + out_len] @ kernel[kk]
    elif groups == x.shape[-1] and kernel.shape[1] == 1 and stride == 1:
        # depthwise: y[t, c] = sum_k x_pad[t + k*d, c] * W[k, 0, c]
        out = jnp.zeros((x.shape[0], out_len, kernel.shape[2]), x.dtype)
        for kk in range(k):
            out = out + (x[:, kk * dilation: kk * dilation + out_len]
                         * kernel[kk, 0])
    elif groups == 1 and dilation == 1 and k % stride == 0:
        # strided: fold stride into channels; y[i] touches x[i*s - pad_left
        # + 0 .. K); with left pad the window is x_pad[i*s : i*s + K].
        # Split taps into K/s groups of s: tap group g covers
        # x_pad[(i+g)*s : (i+g+1)*s] -> reshape to (L/s, s*C) @ W_g
        b, lp, c = x.shape
        n = lp // stride
        xs = x.reshape(b, n, stride * c)
        w = kernel.reshape(k // stride, stride * c, kernel.shape[2])
        out = jnp.zeros((b, out_len, kernel.shape[2]), x.dtype)
        for g in range(k // stride):
            out = out + xs[:, g: g + out_len] @ w[g]
    else:
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(stride,), padding="VALID",
            rhs_dilation=(dilation,), dimension_numbers=_DN,
            feature_group_count=groups)
    if bias is not None:
        out = out + bias
    return out


def causal_conv_transpose1d(x: jnp.ndarray, kernel: jnp.ndarray,
                            bias: Optional[jnp.ndarray], *, stride: int,
                            history: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """CausalTransConvNet.forward (reference: autoencoder.py:310-316).

    kernel: (K, C_out, C_in) — `transpose_kernel=True` layout matching
    torch ConvTranspose1d.  Output length = L * stride (the VALID transpose
    output right-unpadded by K - stride).

    `history` (B, K/stride - 1, C_in): previous block's raw input tail for
    streaming decode (requires K % stride == 0); zeros == one-shot.

    Lowered to matmuls: output position n = i*s + j (j < s) receives
    x[i - g] @ W[j + g*s] for each tap group g < K/s, so the whole op is
    K/s matmuls of (L, C_in) @ (C_in, s*C_out) with shifted inputs.
    """
    k = kernel.shape[0]
    b, length, c_in = x.shape
    c_out = kernel.shape[1]
    if history is not None and (k % stride != 0
                                or history.shape[1] != k // stride - 1):
        raise ValueError(
            f"streaming transpose conv needs K % stride == 0 and history "
            f"length {k // stride - 1}, got K={k} s={stride} "
            f"hist={history.shape[1]}")
    if k % stride == 0:
        n_hist = k // stride - 1
        if history is not None and n_hist > 0:
            xfull = jnp.concatenate([history.astype(x.dtype), x], axis=1)
        else:
            xfull = (x if n_hist == 0 else
                     jnp.pad(x, ((0, 0), (n_hist, 0), (0, 0))))
        # w_g: (C_in, s*C_out) for tap group g (taps g*s + j, j < s);
        # xfull[n_hist - g : n_hist - g + L] is x shifted right by g.
        out = jnp.zeros((b, length, stride * c_out), x.dtype)
        for g in range(k // stride):
            w_g = (kernel[g * stride:(g + 1) * stride]  # (s, C_out, C_in)
                   .transpose(2, 0, 1).reshape(c_in, stride * c_out))
            out = out + xfull[:, n_hist - g: n_hist - g + length] @ w_g
        out = out.reshape(b, length * stride, c_out)
    else:
        out = jax.lax.conv_transpose(
            x, kernel, strides=(stride,), padding="VALID",
            dimension_numbers=_DN, transpose_kernel=True)
        pad = k - stride
        if pad > 0:
            out = out[:, :-pad]
    if bias is not None:
        out = out + bias
    return out


def snake(x: jnp.ndarray, alpha: jnp.ndarray,
          approx: bool = False) -> jnp.ndarray:
    """Snake activation x + (1/(a+1e-9)) sin^2(a x)
    (reference: autoencoder.py:96-109).  alpha: (C,) in NLC.
    approx=True uses sin2_poly (<=1.6e-6 abs error in sin^2 — below bf16
    rounding of the surrounding compute)."""
    if approx:
        # sin2_poly computes in f32; cast back so the approx path keeps
        # exactly the exact path's dtype flow (bf16 stays bf16).
        s2 = sin2_poly(alpha * x).astype(x.dtype)
        return x + (1.0 / (alpha + 1e-9)) * s2
    return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(alpha * x))


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias


def convnext_block(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """1D ConvNeXt block (reference: autoencoder.py:333-373):
    causal depthwise k7 -> LN(1e-6) -> Linear 4x -> GELU(exact) -> Linear
    -> layer-scale gamma -> residual."""
    inp = x
    dim = x.shape[-1]
    x = causal_conv1d(x, p["dwconv"]["kernel"], p["dwconv"]["bias"],
                      groups=dim)
    x = layer_norm(x, p["norm"]["weight"], p["norm"]["bias"], 1e-6)
    x = x @ p["pwconv1"]["kernel"] + p["pwconv1"]["bias"]
    x = jax.nn.gelu(x, approximate=False)
    x = x @ p["pwconv2"]["kernel"] + p["pwconv2"]["bias"]
    x = p["gamma"] * x
    return inp + x


def residual_unit(p: dict, x: jnp.ndarray, dilation: int,
                  approx_snake: bool = False) -> jnp.ndarray:
    """Snake -> causal k7 dilated conv -> Snake -> causal k1 conv, residual
    (reference: autoencoder.py:879-900; causal branch pads nothing since
    causal convs are length-preserving at stride 1)."""
    y = snake(x, p["snake1"], approx=approx_snake)
    y = causal_conv1d(y, p["conv1"]["kernel"], p["conv1"]["bias"],
                      dilation=dilation)
    y = snake(y, p["snake2"], approx=approx_snake)
    y = causal_conv1d(y, p["conv2"]["kernel"], p["conv2"]["bias"])
    return x + y
