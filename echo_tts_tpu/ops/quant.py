"""Int8 quantized matmuls for the DiT hot loop (opt-in serving mode).

The v5e MXU executes int8xint8->int32 at ~2x its bf16 FLOP rate, and the
denoise loop is compute-closed at ~94% bf16 MFU (docs/PERFORMANCE.md) --
so int8 is the one remaining on-hardware throughput lever that does not
change the sampler's semantics or step count.  The reference has no
quantization support (its production dtype is bf16, handler.py:345);
like the polynomial snake and the few-step recipe, this is a TPU-native,
clearly-labeled NON-PARITY serving mode, default OFF.

Recipe (standard W8A8 dynamic quantization):
  * weights: symmetric per-output-channel int8, quantized once offline
    (`quantize_weight_int8`); scales kept in float32.
  * activations: symmetric per-row (per-token) dynamic int8, computed
    inside the compiled program (`int8_dot`); the abs-max reduce and the
    rescale are VPU work that XLA fuses around the MXU call.
  * accumulation: int32 (exact -- max |acc| = 127*127*K fits int32 for
    any K < 2^17; the DiT's largest contraction is K=5888).

Only the scanned per-layer projection/MLP weights are quantized (where
the FLOPs are); norms, AdaLN, embeddings, logit math and the attention
contractions stay in bf16/f32.  `qdot` dispatches on the weight leaf
type so the forward code has a single code path for both modes.
"""
from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp

# Weight leaves quantized by quantize_weight_int8 become dicts with these
# keys; qdot / is_quantized dispatch on Q8_KEY.
Q8_KEY = "q8"
SCALE_KEY = "s"

QuantizedWeight = dict


def is_quantized(w) -> bool:
    return isinstance(w, dict) and Q8_KEY in w


def quantize_weight_int8(w: jnp.ndarray) -> QuantizedWeight:
    """Symmetric per-output-channel int8 quantization of a weight matrix.

    w: (..., K, N) -- plain (K, N) or scan-stacked (L, K, N).  The scale
    is the per-column abs-max over K (axis -2), so each output channel
    uses the full [-127, 127] range.  Returns {"q8": int8 (..., K, N),
    "s": float32 (..., N)}.
    """
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)                 # (..., N)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -127, 127)
    return {Q8_KEY: q.astype(jnp.int8), SCALE_KEY: scale.astype(jnp.float32)}


def dequantize_weight(qw: QuantizedWeight, dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of quantize_weight_int8 (up to rounding)."""
    return (qw[Q8_KEY].astype(jnp.float32)
            * qw[SCALE_KEY][..., None, :]).astype(dtype)


def int8_dot(x: jnp.ndarray, w8: jnp.ndarray, w_scale: jnp.ndarray,
             out_dtype=None) -> jnp.ndarray:
    """x @ dequant(w8) with dynamic per-row int8 activation quantization.

    x: (..., K) float; w8: (K, N) int8; w_scale: (N,) float32.
    The int8xint8 contraction accumulates in int32 on the MXU; the two
    scale multiplies run fused on the VPU.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)   # (..., 1)
    x_scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w8,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


def qdot(x: jnp.ndarray, w: Union[jnp.ndarray, QuantizedWeight]
         ) -> jnp.ndarray:
    """`x @ w` that transparently takes the int8 path for quantized leaves
    (and the QAT fake-quant path for {QAT_KEY: w} leaves, train/distill.py).

    This is the single matmul entry the DiT block body uses; whether a
    model runs bf16, W8A8, or quantization-aware training is decided
    entirely by the parameter tree (see quantize_dit_params /
    qat_tag_dit_params), never by a flag threaded through the forward
    code.
    """
    if isinstance(w, dict):
        if Q8_KEY in w:
            return int8_dot(x, w[Q8_KEY], w[SCALE_KEY])
        if Q4_KEY in w:
            return int4_dot(x, w[Q4_KEY], w[SCALE_KEY])
        if QAT_KEY in w:
            return qat_dot(x, w[QAT_KEY])
    return x @ w


# ---------------------------------------------------------------------------
# Parameter-tree transforms
# ---------------------------------------------------------------------------

# The hot-loop weights: every one of these is applied to (G*B, S, .) rows
# on every one of the sampler's denoise steps.  Static-KV projections
# (wk_text/wv_text/...), encoders, AdaLN, in/out projections run once per
# request (prefill) or are rank-reduced -- quantizing them buys nothing
# measurable and widens the error surface, so they stay bf16.
DIT_BLOCK_QUANT_KEYS = (
    ("attn", "wq"), ("attn", "wk"), ("attn", "wv"),
    ("attn", "gate"), ("attn", "wo"),
    ("mlp", "w1"), ("mlp", "w2"), ("mlp", "w3"),
)


def quantize_dit_params(params: dict) -> dict:
    """Return a copy of a DiT parameter tree with the scanned per-layer
    projection/MLP weights replaced by int8 QuantizedWeight leaves.

    Everything else (encoders, static-KV projections, AdaLN, norms,
    in/out projections, cond MLP) is shared by reference, unchanged.
    Idempotent: already-quantized leaves are left alone.
    """
    out = dict(params)
    blocks = dict(params["blocks"])
    for group in dict.fromkeys(g for g, _ in DIT_BLOCK_QUANT_KEYS):
        blocks[group] = dict(blocks[group])
    for group, key in DIT_BLOCK_QUANT_KEYS:
        leaf = blocks[group][key]
        if not is_quantized(leaf):
            blocks[group][key] = quantize_weight_int8(leaf)
    out["blocks"] = blocks
    return out


def dit_params_are_quantized(params: dict) -> bool:
    """True iff every hot-loop leaf is quantized.

    Checks all DIT_BLOCK_QUANT_KEYS (not a single probe leaf) and raises
    on a mixed tree -- a partially quantized checkpoint (interrupted
    transform, hand-built tree) must fail loudly instead of silently
    serving mixed bf16/int8 numerics."""
    states = {f"{g}.{k}": is_quantized(params["blocks"][g][k])
              for g, k in DIT_BLOCK_QUANT_KEYS}
    if all(states.values()):
        return True
    if not any(states.values()):
        return False
    quantized = sorted(k for k, v in states.items() if v)
    raise ValueError(
        "partially quantized DiT parameter tree: quantized leaves "
        f"{quantized} but not the rest -- re-run quantize_dit_params "
        "on the full tree")


# ---------------------------------------------------------------------------
# W4A8 (int4 weights, int8 activations) — MEASURED NEGATIVE RESULT
# (VERDICT r4 item 5b; numbers in docs/PERFORMANCE.md §13).  The hot-loop
# weights are ~1.9 GB int8; 4-bit storage would halve their per-step HBM
# reads again — a real lever on the weight-bandwidth-bound streaming
# first block (M=120 rows).  Three legs were measured on the chip:
#   1. jnp.int4 dtype: NOT LOWERABLE on the current axon/v5e backend —
#      in-program int4->int8 converts fail UNIMPLEMENTED, and passing an
#      int4 array across a jit boundary hits a device_put relayout
#      recursion.  Dead on this stack.
#   2. Nibble-packed int8, adjacent-K pairs: the interleaving unpack
#      (stack+reshape) is VPU-catastrophic — 366 ms vs w8a8's 42 ms on
#      40x the 24-layer scan at M=120.
#   3. Nibble-packed int8, K-halves layout (unpack = two shifts + a
#      concat, no interleave — the code below): 59.5 ms vs w8a8's
#      45.1 ms at the same shape.  XLA materializes the unpacked int8
#      operand in HBM, so the packed read + unpacked write + dot read
#      exceeds just reading int8.
# The only remaining avenue is a Pallas kernel unpacking in VMEM; given
# the Pallas-int8 negative result (§11: XLA pipelines the quant+dot scan
# better at every tiling), W4A8 stays an available-but-rejected mode.
# The packed representation is kept portable (plain int8 ops) so the
# experiment reruns anywhere: examples/bench_kv_quant.py --w4a8.
# ---------------------------------------------------------------------------

Q4_KEY = "q4"  # K-halves nibble-packed int8: byte r = w[r] | (w[r+K/2] << 4)


def quantize_weight_int4(w: jnp.ndarray) -> QuantizedWeight:
    """Symmetric per-output-channel int4 ([-7, 7]) quantization, stored
    nibble-packed two-per-int8-byte (see block comment above; jnp.int4
    itself is not lowerable on this TPU stack).  Packing pairs row r
    with row r + K/2 so the unpack is a concatenate, never an
    interleave.  Requires an even contraction dim."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2)
    scale = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wf / scale[..., None, :]), -7, 7).astype(
        jnp.int32)
    half = q.shape[-2] // 2
    if 2 * half != q.shape[-2]:
        raise ValueError(f"int4 packing needs an even K, got {q.shape}")
    packed = (q[..., :half, :] & 0xF) | ((q[..., half:, :] & 0xF) << 4)
    return {Q4_KEY: packed.astype(jnp.int8),
            SCALE_KEY: scale.astype(jnp.float32)}


def unpack_weight_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """(..., K/2, N) packed int8 -> (..., K, N) int8 in [-7, 7].  The low
    nibble sign-extends via an arithmetic shift pair; the high nibble via
    one arithmetic shift.  Bit-exact (pinned by tests/test_quant.py)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    return jnp.concatenate([lo, hi], axis=-2)


def int4_dot(x: jnp.ndarray, w4p: jnp.ndarray, w_scale: jnp.ndarray,
             out_dtype=None) -> jnp.ndarray:
    """x @ dequant(unpack(w4p)) with dynamic per-row int8 activation
    quantization — the W4A8 twin of int8_dot (the unpacked int8 weights
    hit the MXU; there is no int4 systolic mode on v5e)."""
    if out_dtype is None:
        out_dtype = x.dtype
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, unpack_weight_int4(w4p),
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * x_scale * w_scale).astype(out_dtype)


def quantize_dit_params_int4(params: dict) -> dict:
    """quantize_dit_params, int4 edition (same hot-loop leaves)."""
    out = dict(params)
    blocks = dict(params["blocks"])
    for group in dict.fromkeys(g for g, _ in DIT_BLOCK_QUANT_KEYS):
        blocks[group] = dict(blocks[group])
    for group, key in DIT_BLOCK_QUANT_KEYS:
        leaf = blocks[group][key]
        if not isinstance(leaf, dict):
            blocks[group][key] = quantize_weight_int4(leaf)
    out["blocks"] = blocks
    return out


# ---------------------------------------------------------------------------
# Int8 static-KV quantization (opt-in, VERDICT r4 item 5a).
#
# The prefilled text/speaker KV is per-request CONSTANT: it is built once
# and read by all 24 layers on every one of the sampler's 40 steps.
# Storing it int8 halves its HBM footprint (the B=8 x 6400-latent
# worst case is ~3.7 GB bf16) and halves the KV read bandwidth of every
# step.  The quantization is per-token-per-head symmetric (scale over the
# head_dim axis), and the scales FOLD INTO the attention's existing
# per-column machinery: K·s ≡ scaling the logits column, V·s ≡ scaling
# the softmax weights column — the same identity the speaker-KV scale
# already uses (models/dit.py:_joint_attention_static), so the kernel
# only needs per-(head, column) scale inputs, no dequantized KV is ever
# materialized in HBM, and the int8->bf16 tile cast happens in VMEM.
# ---------------------------------------------------------------------------

KV_Q8_KEYS = ("k8", "ks", "v8", "vs")


def quantize_kv_int8(k: jnp.ndarray, v: jnp.ndarray) -> dict:
    """Static KV (L, B, T, H, Dh) bf16 pair -> {"k8", "ks", "v8", "vs"}
    with int8 arrays and float32 per-(L, B, T, H) scales."""
    def q(a):
        af = a.astype(jnp.float32)
        amax = jnp.max(jnp.abs(af), axis=-1)                # (..., H)
        s = jnp.maximum(amax, 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(af / s[..., None]), -127,
                      127).astype(jnp.int8)
        return q8, s.astype(jnp.float32)

    k8, ks = q(k)
    v8, vs = q(v)
    return {"k8": k8, "ks": ks, "v8": v8, "vs": vs}


def dequantize_kv(q: dict, dtype=jnp.bfloat16):
    """Inverse of quantize_kv_int8 (tests / fallbacks)."""
    k = (q["k8"].astype(jnp.float32) * q["ks"][..., None]).astype(dtype)
    v = (q["v8"].astype(jnp.float32) * q["vs"][..., None]).astype(dtype)
    return k, v


def kv_is_quantized(kv) -> bool:
    return isinstance(kv, dict) and all(x in kv for x in KV_Q8_KEYS)


# ---------------------------------------------------------------------------
# Quantization-aware training (QAT) — fake-quant with straight-through
# gradients, so a distilled student can be trained ROBUST to int8 serving
# (train/distill.py quant_aware=True).  The forward applies the same
# quantization decisions as int8_dot (per-channel weights, dynamic
# per-row activations, symmetric 127) in f32 arithmetic; gradients pass
# straight through the rounding (scales are stop_gradient'd, the
# standard recipe).
# ---------------------------------------------------------------------------

QAT_KEY = "qat"


def _round_ste(v: jnp.ndarray) -> jnp.ndarray:
    return v + jax.lax.stop_gradient(jnp.round(v) - v)


def qat_dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """x @ w with W8A8 fake quantization on both operands.

    Matches int8_dot's values up to f32-vs-int32 accumulation order;
    d/dw is the plain matmul gradient inside the clip range (STE)."""
    xf = x.astype(jnp.float32)
    x_scale = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
        / 127.0)
    xq = jnp.clip(_round_ste(xf / x_scale), -127, 127)

    wf = w.astype(jnp.float32)
    w_scale = jax.lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-12)
        / 127.0)
    wq = jnp.clip(_round_ste(wf / w_scale), -127, 127)

    out = jnp.matmul(xq, wq) * x_scale * w_scale[..., 0, :]
    return out.astype(x.dtype)


def qat_tag_dit_params(params: dict) -> dict:
    """Tag the hot-loop weight leaves for the QAT forward (shares every
    array by reference — pure pytree relabeling, applied INSIDE the loss
    so optimizer state stays on the plain tree)."""
    out = dict(params)
    blocks = dict(params["blocks"])
    for group in dict.fromkeys(g for g, _ in DIT_BLOCK_QUANT_KEYS):
        blocks[group] = dict(blocks[group])
    for group, key in DIT_BLOCK_QUANT_KEYS:
        leaf = blocks[group][key]
        if not isinstance(leaf, dict):
            blocks[group][key] = {QAT_KEY: leaf}
    out["blocks"] = blocks
    return out
