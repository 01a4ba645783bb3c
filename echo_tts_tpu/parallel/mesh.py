"""Device mesh + sharding rules for the TPU-native Echo-TTS framework.

The reference is single-GPU (SURVEY.md §2e: no torch.distributed anywhere);
scale-out here is designed TPU-first: a 2-D ``(data, model)``
`jax.sharding.Mesh`, parameter/activation `NamedSharding`s, and XLA-inserted
collectives over ICI.  Tensor parallelism follows the Megatron pattern mapped
onto the EchoDiT layout (see models/dit.py for the pytree schema):

  * attention wq/wk/wv/gate and per-segment wk_*/wv_* shard their OUTPUT
    (head) dimension over ``model``; wo shards its INPUT dimension, so the
    block needs a single psum (inserted by GSPMD) at the wo output.
  * SwiGLU w1/w3 shard the hidden dimension; w2 shards its input — again one
    psum per MLP.
  * q_norm/k_norm (L, H, Dh) shard the head axis H.
  * LowRankAdaLN, RMSNorm scales, embeddings and in/out projections are
    replicated (tiny relative to the blocks).
  * KV caches (L, B, S, H, Dh) shard batch over ``data`` and heads over
    ``model``.
  * Batch-bearing activations shard their leading axis over ``data``.

All head counts in the published config (16, 10, 10) are NOT divisible by
e.g. 4-way model parallelism except tp in {1, 2}; GSPMD handles uneven
sharding, but for efficiency prefer tp ∈ {1, 2, 4, 8} on the DiT's 16 heads
and let the 10-head encoders fall where they may (GSPMD pads).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
) -> Mesh:
    """Build a (data, model) mesh.  With neither dp nor tp given, all devices
    go to data parallelism (the serving-friendly default: requests are
    independent)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None and dp is None:
        dp, tp = n, 1
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _enc_blocks_spec() -> dict:
    """PartitionSpecs for one stacked encoder-block pytree
    (leading axis = layers, always unsharded)."""
    col = P(None, None, MODEL_AXIS)   # shard output/hidden dim
    row = P(None, MODEL_AXIS, None)   # shard input dim
    return {
        "attn": {
            "wq": col, "wk": col, "wv": col, "gate": col, "wo": row,
            "q_norm": P(None, MODEL_AXIS, None),
            "k_norm": P(None, MODEL_AXIS, None),
        },
        "mlp": {"w1": col, "w3": col, "w2": row},
        "attn_norm": P(), "mlp_norm": P(),
    }


def dit_param_specs(blockwise: bool = True) -> dict:
    """PartitionSpec pytree matching init_dit_params / tools.convert output."""
    col = P(None, None, MODEL_AXIS)
    row = P(None, MODEL_AXIS, None)
    rep2 = {"kernel": P(), "bias": P()}
    adaln = {
        "shift_down": P(), "scale_down": P(), "gate_down": P(),
        "shift_up": {"kernel": P(), "bias": P()},
        "scale_up": {"kernel": P(), "bias": P()},
        "gate_up": {"kernel": P(), "bias": P()},
    }
    blocks_attn = {
        "wq": col, "wk": col, "wv": col, "gate": col, "wo": row,
        "wk_text": col, "wv_text": col,
        "wk_speaker": col, "wv_speaker": col,
        "q_norm": P(None, MODEL_AXIS, None),
        "k_norm": P(None, MODEL_AXIS, None),
    }
    if blockwise:
        blocks_attn["wk_latent"] = col
        blocks_attn["wv_latent"] = col
    specs = {
        "text_encoder": {"embedding": P(), "blocks": _enc_blocks_spec()},
        "speaker_encoder": {"in_proj": rep2, "blocks": _enc_blocks_spec()},
        "text_norm": P(), "speaker_norm": P(),
        "cond": {"w0": P(), "w1": P(), "w2": P()},
        "in_proj": rep2,
        "blocks": {
            "attn": blocks_attn,
            "mlp": {"w1": col, "w3": col, "w2": row},
            "attn_adaln": adaln,
            "mlp_adaln": adaln,
        },
        "out_norm": P(), "out_proj": rep2,
    }
    if blockwise:
        specs["latent_encoder"] = {"in_proj": rep2,
                                   "blocks": _enc_blocks_spec()}
        specs["latent_norm"] = P()
    return specs


def kv_cache_spec() -> P:
    """KV caches are (L, B, S, H, Dh): batch over data, heads over model."""
    return P(None, DATA_AXIS, None, MODEL_AXIS, None)


def batch_spec(ndim: int) -> P:
    """Leading-axis data sharding for an activation of rank `ndim`."""
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def to_named(specs, mesh: Mesh):
    """PartitionSpec pytree -> NamedSharding pytree."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))


def _divisible_spec(leaf, spec: P, mesh: Mesh) -> P:
    """Drop spec axes that do not divide the leaf's dimension evenly.

    device_put refuses uneven NamedShardings (unlike GSPMD's internal
    padding of intermediates), so e.g. the 10-head text/speaker encoder
    norms at tp=4 fall back to replication while everything divisible
    stays sharded — the tp config keeps working instead of crashing on
    placement."""
    names = []
    for i, ax in enumerate(spec):
        if ax is not None and leaf.shape[i] % mesh.shape[ax] != 0:
            ax = None
        names.append(ax)
    return P(*names)


def shard_params(params: dict, mesh: Mesh, blockwise: bool = True) -> dict:
    """Place a parameter pytree onto the mesh with TP sharding; axes that
    don't divide their mesh axis are replicated (see _divisible_spec).

    Composes with the int8 serving mode (ops/quant.py): a quantized leaf
    {'q8': (L, K, N) int8, 's': (L, N) f32} shards q8 exactly like the
    bf16 kernel it replaced, and the per-output-channel scale follows the
    kernel's OUTPUT axis (so col-sharded weights shard their scales, row-
    sharded weights replicate them).  int32 accumulation makes the TP
    matmul partial-sum psum exact, so sharded == unsharded bit-for-bit on
    the quantized contractions."""
    from ..ops.quant import Q8_KEY, SCALE_KEY, is_quantized

    specs = dit_param_specs(blockwise)

    def place(leaf, spec):
        return jax.device_put(
            leaf, NamedSharding(mesh, _divisible_spec(leaf, spec, mesh)))

    def place_leaf(s, leaf):
        if is_quantized(leaf):
            # drop the contraction (K, axis -2) entry for the scale
            entries = list(s) + [None] * (leaf[Q8_KEY].ndim - len(list(s)))
            s_scale = P(*(entries[:-2] + entries[-1:]))
            return {Q8_KEY: place(leaf[Q8_KEY], s),
                    SCALE_KEY: place(leaf[SCALE_KEY], s_scale)}
        return place(leaf, s)

    return jax.tree.map(place_leaf, specs, params,
                        is_leaf=lambda x: isinstance(x, P))
