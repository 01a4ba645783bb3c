"""Sequence-parallel (SP/CP) speaker prefill.

The speaker encoder runs 14 causal layers over up to 1600 patches (a
6400-latent / 5-minute reference, inference.py:322).  Under a mesh the
sampler already shards batch and heads; this module shards the PREFILL's
patch axis over `model`, so very long references prefill in ~1/tp the
time per chip (SURVEY §2e's optional SP/CP row).

Engage decision, backed by on-chip numbers (docs/PERFORMANCE.md §10,
examples/bench_long_reference.py): single-chip speaker prefill measures
36.0 / 45.8 / 53.2 ms at the 640 / 2816 / 6400 buckets — the causal
encoder is matmul-bound, not quadratic-bound, at serving widths, so SP
has at most ~40 ms to win per request and is NOT engaged by the serving
path on one chip.  It exists for the multi-chip regime: sharded-training
prefill towers and references far beyond the 6400 bucket, where the
O(N²/tp) attention term finally dominates.

Design note — gathered-KV sequence parallelism, not a ring: each layer
all-gathers K/V and computes only the local queries' attention.  At the
published widths a full layer's K/V is ~16 MB (1600×1280×2×f32·?), so a
ring schedule's extra complexity buys nothing — the all-gather is a few
hundred µs on ICI, while the O(N²/tp) attention and O(N/tp) MLP work is
what actually shrinks.  Queries never leave their shard; outputs are
mathematically identical to the unsharded encoder (each query row sees
the same causal key set; pinned in tests/test_parallel.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import EchoDiTConfig
from ..models import dit as _dit
from ..ops.norms import rms_norm
from ..ops.rope import apply_rotary_emb


def _sp_patch_encoder(blocks: dict, cfg: EchoDiTConfig, x: jnp.ndarray,
                      n_total: int, axis: str) -> jnp.ndarray:
    """shard_map body: x (B, N_local, D) — this shard's patches; returns
    the encoded local patches.  Causality over GLOBAL positions."""
    b, n_local, d = x.shape
    h, dh = cfg.speaker_num_heads, cfg.speaker_head_dim
    eps = cfg.norm_eps
    shard = jax.lax.axis_index(axis)
    offset = shard * n_local

    freqs_full = _dit._freqs(dh, n_total)
    freqs_local = jax.lax.dynamic_slice_in_dim(freqs_full, offset,
                                               n_local, 0)
    # global causal visibility: key column j visible to local query row i
    # iff j <= offset + i
    col = jnp.arange(n_total)[None, :]
    row = offset + jnp.arange(n_local)[:, None]
    vis = (col <= row)[None, None]           # (1, 1, n_local, n_total)
    scale = 1.0 / (dh ** 0.5)

    def body(hh, bp):
        ap = bp["attn"]
        xn = rms_norm(hh, bp["attn_norm"], eps)
        q = (xn @ ap["wq"]).reshape(b, n_local, h, dh)
        k = (xn @ ap["wk"]).reshape(b, n_local, h, dh)
        v = (xn @ ap["wv"]).reshape(b, n_local, h, dh)
        gate = xn @ ap["gate"]
        q = rms_norm(q, ap["q_norm"], eps)
        k = rms_norm(k, ap["k_norm"], eps)
        q = apply_rotary_emb(q, freqs_local)
        k = apply_rotary_emb(k, freqs_local)
        # K/V ride the ICI once per layer; queries stay local
        k_all = jax.lax.all_gather(k, axis, axis=1, tiled=True)
        v_all = jax.lax.all_gather(v, axis, axis=1, tiled=True)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k_all,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(vis, logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(v_all.dtype)
        attn = jnp.einsum("bhnm,bmhd->bnhd", w, v_all).reshape(b, n_local,
                                                               d)
        hh = hh + (attn * jax.nn.sigmoid(gate)) @ ap["wo"]
        hh = hh + _dit._mlp(bp["mlp"],
                            rms_norm(hh, bp["mlp_norm"], eps))
        return hh, None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


@functools.lru_cache(maxsize=8)
def _sp_core(cfg: EchoDiTConfig, mesh, axis: str):
    """lru-cached jit core (the repo's hot-entry-point rule): the 14-layer
    scan traces once per (config, mesh, shape); eager callers pay one
    dispatch, not per-op tunnel round trips."""

    @jax.jit
    def run(params, speaker_latent):
        b, s, d = speaker_latent.shape
        ps = cfg.speaker_patch_size
        n = s // ps
        p = params["speaker_encoder"]
        x = speaker_latent.reshape(b, n, d * ps)
        x = (x @ p["in_proj"]["kernel"] + p["in_proj"]["bias"]) / 6.0

        state = jax.shard_map(
            lambda blocks, xs: _sp_patch_encoder(blocks, cfg, xs, n, axis),
            mesh=mesh,
            in_specs=(P(), P(None, axis, None)),   # weights replicated
            out_specs=P(None, axis, None),
        )(p["blocks"], x)

        state = rms_norm(state, params["speaker_norm"], cfg.norm_eps)
        blk = params["blocks"]["attn"]
        return _dit._stacked_kv(state, blk["wk_speaker"],
                                blk["wv_speaker"], blk["k_norm"],
                                cfg.norm_eps, cfg.num_heads)

    return run


def get_kv_cache_speaker_sp(params: dict, cfg: EchoDiTConfig,
                            speaker_latent: jnp.ndarray, mesh,
                            axis: str = "model"):
    """Sequence-parallel twin of dit.get_kv_cache_speaker: the patch axis
    shards over `axis`; the returned (L, B, T, H, Dh) KV is sharded over
    its T axis (GSPMD re-shards as the consumer requires).

    The patch count must divide the mesh axis; callers pad the reference
    to a bucket (serve/presets.py) whose patch count does."""
    s = speaker_latent.shape[1]
    ps = cfg.speaker_patch_size
    if s % ps != 0:
        raise ValueError(f"latent length {s} must be divisible by "
                         f"speaker_patch_size {ps}")
    n = s // ps
    tp = mesh.shape[axis]
    if n % tp != 0:
        raise ValueError(
            f"speaker patch count {n} must divide the '{axis}' axis ({tp})"
            " for sequence-parallel prefill; pad to a bucket that does")
    return _sp_core(cfg, mesh, axis)(params, speaker_latent)
