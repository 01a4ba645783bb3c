"""EchoDiT and its text/speaker/latent encoders — TPU-native JAX.

This re-implements the semantics of the reference PyTorch model
(reference: model.py:472-642) as pure functions over a parameter pytree:

  * Transformer blocks are STACKED along a leading layer axis and executed
    with `jax.lax.scan`, so the 24-layer DiT traces/compiles once per layer
    shape instead of 24 times.
  * KV "caches" are plain arrays (L, B, S, H, Dh) computed once per request
    by the prefill functions and closed over by the sampler; nothing is
    mutated (the reference's in-place speaker-KV scaling, inference.py:408-414,
    becomes a per-layer multiplicative factor applied inside attention).
  * CFG sharing: the sampler runs guidance branches as a leading multiple of
    the batch (q-batch = G*B) while the KV stays at batch B and is broadcast
    inside attention — the reference materializes concat(cond,cond,cond)
    (inference.py:471-472); we avoid the 3x KV memory and bandwidth.

Parameter layout (all linears stored as (in, out) kernels; converted from
torch's (out, in) by tools/convert.py):

  params = {
    'text_encoder': {'embedding': (V, Dt), 'blocks': ENC_BLOCKS(Lt, Dt)},
    'speaker_encoder': {'in_proj': {'kernel','bias'}, 'blocks': ENC_BLOCKS},
    'latent_encoder': ... (present iff cfg.blockwise),
    'text_norm','speaker_norm'[,'latent_norm']: (Dt,),
    'cond': {'w0': (Te, M), 'w1': (M, M), 'w2': (M, 3M)},
    'in_proj': {'kernel': (80, M), 'bias': (M,)},
    'blocks': {   # stacked (L, ...)
      'attn': {'wq','wk','wv','wo','gate': (L, M, M),
               'wk_text','wv_text','wk_speaker','wv_speaker'
               [,'wk_latent','wv_latent']: (L, Dt, M),
               'q_norm','k_norm': (L, H, Dh)},
      'mlp': {'w1','w3': (L, M, F), 'w2': (L, F, M)},
      'attn_adaln','mlp_adaln': {'shift_down','scale_down','gate_down': (L, M, R),
               'shift_up','scale_up','gate_up': {'kernel': (L, R, M), 'bias': (L, M)}},
    },
    'out_norm': (M,), 'out_proj': {'kernel': (M, 80), 'bias': (80,)},
  }

  ENC_BLOCKS = {'attn': {'wq','wk','wv','wo','gate': (L, D, D),
                         'q_norm','k_norm': (L, H, Dh)},
                'mlp': {'w1','w3': (L, D, F), 'w2': (L, F, D)},
                'attn_norm','mlp_norm': (L, D)}
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EchoDiTConfig
from ..ops.attention import sdpa
from ..ops.embeddings import get_timestep_embedding
from ..ops.norms import low_rank_adaln, rms_norm
from ..ops.pallas.joint_attention import (
    fits_vmem,
    fits_vmem_flash,
    fused_joint_attention,
    fused_joint_attention_sharded,
    shardable,
)
from ..ops.quant import qdot
from ..ops.rope import (
    apply_rotary_emb,
    apply_rotary_emb_half_heads,
    precompute_freqs_cis,
)

KV = Tuple[jnp.ndarray, jnp.ndarray]  # (L, B, S, H, Dh) each


@functools.lru_cache(maxsize=64)
def _freqs_np(head_dim: int, end: int) -> np.ndarray:
    return precompute_freqs_cis(head_dim, end)


def _freqs(head_dim: int, end: int) -> jnp.ndarray:
    return jnp.asarray(_freqs_np(head_dim, end))


# ---------------------------------------------------------------------------
# Shared blocks
# ---------------------------------------------------------------------------

def _mlp(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """SwiGLU MLP (reference: model.py:296-308).

    `qdot` is `@` for plain bf16 kernels and the int8 MXU path when the
    parameter tree was quantized (ops/quant.py, opt-in serving mode)."""
    return qdot(jax.nn.silu(qdot(x, p["w1"])) * qdot(x, p["w3"]), p["w2"])


def _self_attention(
    p: dict,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    freqs: jnp.ndarray,
    *,
    num_heads: int,
    is_causal: bool,
    eps: float,
) -> jnp.ndarray:
    """Encoder self-attention with sigmoid output gate
    (reference: model.py:106-161)."""
    b, s, d = x.shape
    q = (x @ p["wq"]).reshape(b, s, num_heads, -1)
    k = (x @ p["wk"]).reshape(b, s, num_heads, -1)
    v = (x @ p["wv"]).reshape(b, s, num_heads, -1)
    gate = x @ p["gate"]

    q = rms_norm(q, p["q_norm"], eps)
    k = rms_norm(k, p["k_norm"], eps)

    q = apply_rotary_emb(q, freqs[:s])
    k = apply_rotary_emb(k, freqs[:s])

    attn_mask = mask[:, None, None, :] if mask is not None else None
    out = sdpa(q, k, v, mask=attn_mask, is_causal=is_causal)
    out = out.reshape(b, s, d)
    out = out * jax.nn.sigmoid(gate)
    return out @ p["wo"]


def _encoder_blocks(
    blocks: dict,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    freqs: jnp.ndarray,
    *,
    num_heads: int,
    is_causal: bool,
    eps: float,
) -> jnp.ndarray:
    """Pre-RMSNorm residual blocks, scanned over the stacked layer axis
    (reference: model.py:311-339)."""

    def body(h, p):
        h = h + _self_attention(
            p["attn"], rms_norm(h, p["attn_norm"], eps), mask, freqs,
            num_heads=num_heads, is_causal=is_causal, eps=eps,
        )
        h = h + _mlp(p["mlp"], rms_norm(h, p["mlp_norm"], eps))
        return h, None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------

def text_encoder(params: dict, cfg: EchoDiTConfig, input_ids: jnp.ndarray,
                 mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Byte-level text encoder, 14 non-causal blocks
    (reference: model.py:392-427)."""
    p = params["text_encoder"]
    x = p["embedding"][input_ids]
    freqs = _freqs(cfg.text_head_dim, input_ids.shape[1])
    return _encoder_blocks(
        p["blocks"], x, mask, freqs,
        num_heads=cfg.text_num_heads, is_causal=False, eps=cfg.norm_eps,
    )


def _patch_encoder(p: dict, cfg: EchoDiTConfig, latent: jnp.ndarray) -> jnp.ndarray:
    """SpeakerEncoder-style patchify + causal blocks
    (reference: model.py:429-469).  Used for both the speaker and the
    blockwise latent encoder (model.py:519-527)."""
    b, s, d = latent.shape
    ps = cfg.speaker_patch_size
    if s % ps != 0:
        raise ValueError(
            f"latent length {s} must be divisible by speaker_patch_size {ps}; "
            "crop with get_speaker_latent_and_mask (divis_by_patch_size)")
    x = latent.reshape(b, s // ps, d * ps)
    x = x @ p["in_proj"]["kernel"] + p["in_proj"]["bias"]
    x = x / 6.0  # activation-dynamics scale (reference: model.py:462)
    freqs = _freqs(cfg.speaker_head_dim, x.shape[1])
    return _encoder_blocks(
        p["blocks"], x, None, freqs,
        num_heads=cfg.speaker_num_heads, is_causal=True, eps=cfg.norm_eps,
    )


# ---------------------------------------------------------------------------
# KV prefill (one-time per request; reference: model.py:606-636)
# ---------------------------------------------------------------------------

def _stacked_kv(state: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray,
                k_norm: jnp.ndarray, eps: float, num_heads: int) -> KV:
    """Project encoder state through per-layer KV weights for all layers at
    once.  k gets the (shared-weights) k_norm, as in model.py:270-282."""
    b, s, _ = state.shape
    l = wk.shape[0]
    k = jnp.einsum("bsd,ldm->lbsm", state, wk).reshape(l, b, s, num_heads, -1)
    v = jnp.einsum("bsd,ldm->lbsm", state, wv).reshape(l, b, s, num_heads, -1)
    k = rms_norm(k, k_norm[:, None, None], eps)
    return k, v


def get_kv_cache_text(params: dict, cfg: EchoDiTConfig,
                      text_input_ids: jnp.ndarray,
                      text_mask: Optional[jnp.ndarray]) -> KV:
    state = text_encoder(params, cfg, text_input_ids, text_mask)
    state = rms_norm(state, params["text_norm"], cfg.norm_eps)
    blk = params["blocks"]["attn"]
    return _stacked_kv(state, blk["wk_text"], blk["wv_text"],
                       blk["k_norm"], cfg.norm_eps, cfg.num_heads)


def get_kv_cache_speaker(params: dict, cfg: EchoDiTConfig,
                         speaker_latent: jnp.ndarray) -> KV:
    state = _patch_encoder(params["speaker_encoder"], cfg, speaker_latent)
    state = rms_norm(state, params["speaker_norm"], cfg.norm_eps)
    blk = params["blocks"]["attn"]
    return _stacked_kv(state, blk["wk_speaker"], blk["wv_speaker"],
                       blk["k_norm"], cfg.norm_eps, cfg.num_heads)


def get_kv_cache_latent(params: dict, cfg: EchoDiTConfig,
                        prefix_latent: jnp.ndarray) -> KV:
    """Blockwise latent-prefix KV: encoder output positions sit at
    idx * patch_size in RoPE space (reference: model.py:623-636), and RoPE is
    applied to k on HALF the heads (model.py:284-293)."""
    state = _patch_encoder(params["latent_encoder"], cfg, prefix_latent)
    state = rms_norm(state, params["latent_norm"], cfg.norm_eps)
    blk = params["blocks"]["attn"]
    k, v = _stacked_kv(state, blk["wk_latent"], blk["wv_latent"],
                       blk["k_norm"], cfg.norm_eps, cfg.num_heads)
    s = state.shape[1]
    table = _freqs_np(cfg.head_dim, s * cfg.speaker_patch_size)
    freqs_latent = jnp.asarray(
        table[np.arange(s) * cfg.speaker_patch_size])
    k = jax.vmap(lambda kl: apply_rotary_emb_half_heads(kl, freqs_latent))(k)
    return k, v


def concat_static_kv(
    cfg: EchoDiTConfig,
    kv_text: KV,
    kv_speaker: KV,
    kv_latent: Optional[KV] = None,
) -> Tuple[KV, jnp.ndarray]:
    """Concatenate the per-request-constant KV segments once (per sampler
    call / per streaming block) instead of per layer per step.

    Segment order: [latent?, text, speaker].  Returns ((k, v) stacked
    (L, B, T, H, Dh), spk_cols (T,) bool marking speaker columns — the
    target of the functional speaker-KV scale).
    """
    k_parts = [kv_text[0], kv_speaker[0]]
    v_parts = [kv_text[1], kv_speaker[1]]
    lengths = [kv_text[0].shape[2], kv_speaker[0].shape[2]]
    if kv_latent is not None:
        k_parts.insert(0, kv_latent[0])
        v_parts.insert(0, kv_latent[1])
        lengths.insert(0, kv_latent[0].shape[2])
    k = jnp.concatenate(k_parts, axis=2)
    v = jnp.concatenate(v_parts, axis=2)
    total = sum(lengths)
    spk_cols = np.zeros((total,), bool)
    spk_cols[total - lengths[-1]:] = True
    return (k, v), jnp.asarray(spk_cols)


def static_attention_mask(
    cfg: EchoDiTConfig,
    text_mask: jnp.ndarray,                 # (GB, T_text) bool
    speaker_mask: jnp.ndarray,              # (GB, S_spk) bool, UNsubsampled
    latent_mask: Optional[jnp.ndarray] = None,  # (GB, T_lat) bool
) -> jnp.ndarray:
    """Per-branch key mask over the concatenated static segments, with the
    speaker mask subsampled by patch_size (model.py:581)."""
    parts = [text_mask, speaker_mask[..., :: cfg.speaker_patch_size]]
    if latent_mask is not None:
        parts.insert(0, latent_mask)
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# Incremental latent-prefix encoding (streaming; framework addition)
#
# The reference re-encodes the FULL zero-padded prefix buffer every block
# (inference_blockwise.py:72-73) — O(total^2) encoder work over a stream.
# The latent encoder is strictly causal (model.py:429-469 with
# is_causal=True), so patches encoded once never change: these helpers
# carry per-layer K/V for the patch encoder and a DiT latent-KV buffer,
# encoding only each block's NEW patches.  Outputs are mathematically
# identical to get_kv_cache_latent on the real prefix (each query row sees
# exactly the same visible key set) — pinned in tests/test_blockwise_parity.
# ---------------------------------------------------------------------------

def init_latent_inc_state(cfg: EchoDiTConfig, batch: int, max_patches: int,
                          dtype=jnp.bfloat16) -> dict:
    """Zero state: encoder per-layer K/V buffers + the DiT latent-KV
    buffer, all preallocated at max_patches (static shapes; columns beyond
    "pos" are zeros and masked by latent_prefix_mask_dynamic)."""
    enc_shape = (cfg.speaker_num_layers, batch, max_patches,
                 cfg.speaker_num_heads, cfg.speaker_head_dim)
    dit_shape = (cfg.num_layers, batch, max_patches, cfg.num_heads,
                 cfg.head_dim)
    return {
        "enc_k": jnp.zeros(enc_shape, dtype),
        "enc_v": jnp.zeros(enc_shape, dtype),
        "lat_k": jnp.zeros(dit_shape, dtype),
        "lat_v": jnp.zeros(dit_shape, dtype),
        "pos": jnp.zeros((), jnp.int32),     # patches encoded so far
    }


def latent_kv_append_block(params: dict, cfg: EchoDiTConfig, state: dict,
                           latent_block: jnp.ndarray) -> dict:
    """Encode ONE block's latents through the causal patch encoder with
    carried KV and append the resulting DiT latent-KV columns.

    latent_block: (B, S_block, latent) with S_block % patch_size == 0.
    Returns the updated state; state["lat_k"/"lat_v"] replace
    get_kv_cache_latent's output (same RoPE-at-idx*patch_size convention),
    valid for columns < pos."""
    p = params["latent_encoder"]
    b, s, d = latent_block.shape
    ps = cfg.speaker_patch_size
    if s % ps != 0:
        raise ValueError(f"block length {s} must be divisible by "
                         f"speaker_patch_size {ps}")
    n_new = s // ps
    max_patches = state["enc_k"].shape[2]
    pos = state["pos"]
    eps = cfg.norm_eps
    h_enc, dh_enc = cfg.speaker_num_heads, cfg.speaker_head_dim

    x = latent_block.reshape(b, n_new, d * ps)
    x = (x @ p["in_proj"]["kernel"] + p["in_proj"]["bias"]) / 6.0

    freqs_full = _freqs(dh_enc, max_patches)
    freqs_new = jax.lax.dynamic_slice_in_dim(freqs_full, pos, n_new, 0)
    # causal visibility over absolute patch positions: column j is visible
    # to new-query row i iff j <= pos + i (zeros beyond pos+i are masked)
    col = jnp.arange(max_patches)[None, :]
    row = pos + jnp.arange(n_new)[:, None]
    vis = (col <= row)[None, None]          # (1, 1, n_new, max_patches)

    def body(h, xs):
        bp, k_cache, v_cache = xs
        xn = rms_norm(h, bp["attn_norm"], eps)
        ap = bp["attn"]
        q = (xn @ ap["wq"]).reshape(b, n_new, h_enc, dh_enc)
        k = (xn @ ap["wk"]).reshape(b, n_new, h_enc, dh_enc)
        v = (xn @ ap["wv"]).reshape(b, n_new, h_enc, dh_enc)
        gate = xn @ ap["gate"]
        q = rms_norm(q, ap["q_norm"], eps)
        k = rms_norm(k, ap["k_norm"], eps)
        q = apply_rotary_emb(q, freqs_new)
        k = apply_rotary_emb(k, freqs_new)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, pos, 0, 0))
        logits = jnp.einsum("bnhd,bmhd->bhnm", q,
                            k_cache.astype(q.dtype),
                            preferred_element_type=jnp.float32)
        logits = logits * (1.0 / (dh_enc ** 0.5))  # sdpa's exact scaling
        logits = jnp.where(vis, logits, -jnp.inf)
        w = jax.nn.softmax(logits, axis=-1).astype(v_cache.dtype)
        attn = jnp.einsum("bhnm,bmhd->bnhd", w, v_cache)
        attn = attn.reshape(b, n_new, -1).astype(h.dtype)
        h = h + (attn * jax.nn.sigmoid(gate)) @ ap["wo"]
        h = h + _mlp(bp["mlp"], rms_norm(h, bp["mlp_norm"], eps))
        return h, (k_cache, v_cache)

    x, (enc_k, enc_v) = jax.lax.scan(
        body, x, (p["blocks"], state["enc_k"], state["enc_v"]))

    # DiT latent-KV columns for the new patches (get_kv_cache_latent twin)
    stt = rms_norm(x, params["latent_norm"], cfg.norm_eps)
    blk = params["blocks"]["attn"]
    k_new, v_new = _stacked_kv(stt, blk["wk_latent"], blk["wv_latent"],
                               blk["k_norm"], cfg.norm_eps, cfg.num_heads)
    # RoPE at absolute idx*patch_size on half the heads, via a stride-ps
    # table sliced at pos (positions (pos+i)*ps)
    table = jnp.asarray(
        _freqs_np(cfg.head_dim, max_patches * ps)[::ps])
    freqs_lat = jax.lax.dynamic_slice_in_dim(table, pos, n_new, 0)
    k_new = jax.vmap(
        lambda kl: apply_rotary_emb_half_heads(kl, freqs_lat))(k_new)

    lat_k = jax.lax.dynamic_update_slice(
        state["lat_k"], k_new.astype(state["lat_k"].dtype),
        (0, 0, pos, 0, 0))
    lat_v = jax.lax.dynamic_update_slice(
        state["lat_v"], v_new.astype(state["lat_v"].dtype),
        (0, 0, pos, 0, 0))
    return {"enc_k": enc_k, "enc_v": enc_v, "lat_k": lat_k,
            "lat_v": lat_v, "pos": pos + n_new}


def latent_prefix_mask_dynamic(batch_size: int, num_latents: int,
                               start_pos,
                               patch_size: int) -> jnp.ndarray:
    """position * patch_size < start_pos (reference: model.py:243-244),
    computed in-graph — start_pos may be a TRACED scalar, so one compiled
    block program serves every block position."""
    positions = jnp.arange(num_latents) * patch_size
    return jnp.broadcast_to(positions < start_pos,
                            (batch_size, num_latents))


def latent_prefix_mask(batch_size: int, num_latents: int, start_pos: int,
                       patch_size: int) -> np.ndarray:
    """Concrete (numpy) view of latent_prefix_mask_dynamic for host-side
    callers and tests."""
    return np.asarray(latent_prefix_mask_dynamic(
        batch_size, num_latents, int(start_pos), patch_size))


# ---------------------------------------------------------------------------
# Joint attention + DiT forward
# ---------------------------------------------------------------------------

def _select_attention_impl(cfg: EchoDiTConfig, s: int, t_static: int,
                           head_dim: int, *, mesh=None,
                           kv_batch: Optional[int] = None,
                           q_batch: int = 3) -> str:
    """Resolve cfg.attention_impl at trace time.

    "auto" picks the fused Pallas kernel on a single accelerator when the
    (S, T) logits fit VMEM.  Under a mesh (caller passes the
    (data, model) Mesh it placed the arrays on) the kernel runs per shard
    through shard_map — fused_joint_attention_sharded — provided batch and
    heads divide the mesh axes evenly.  On CPU (tests, parity) the kernel
    runs in interpreter mode.  Multi-device WITHOUT an explicit mesh falls
    back to the partitionable XLA einsums (GSPMD cannot partition a Mosaic
    kernel on its own)."""
    if cfg.attention_impl == "xla":
        return "xla"
    on_cpu = jax.default_backend() == "cpu"
    suffix = "_interpret" if on_cpu else ""
    # Whole-row kernel when the (S, T) logits fit VMEM, the blocked flash
    # variant otherwise (fused_joint_attention auto-selects internally).
    fits = (fits_vmem(s, t_static, head_dim)
            or fits_vmem_flash(s, t_static, head_dim, q_batch))
    if mesh is not None:
        ok = (shardable(mesh, kv_batch, cfg.num_heads, "data", "model")
              and fits)
        if cfg.attention_impl == "pallas":
            if not ok:
                raise ValueError(
                    "attention_impl='pallas' under a mesh needs batch % "
                    "data and num_heads % model to be 0, and the KV rows "
                    f"to fit VMEM; got batch={kv_batch}, "
                    f"heads={cfg.num_heads}, mesh={dict(mesh.shape)}, "
                    f"fits={fits}")
            return "pallas_shmap" + suffix
        # auto: fused per-shard kernel on real chips, XLA on CPU (the
        # interpreter is for correctness tests only, never a default).
        return "pallas_shmap" if ok and not on_cpu else "xla"
    if cfg.attention_impl == "pallas":
        return "pallas" + suffix
    if not on_cpu and jax.device_count() == 1 and fits:
        return "pallas"
    return "xla"

def _joint_attention(
    p: dict,
    x: jnp.ndarray,
    text_mask: jnp.ndarray,
    speaker_mask: jnp.ndarray,
    latent_mask: Optional[jnp.ndarray],
    freqs_q: jnp.ndarray,
    kv_text: Tuple[jnp.ndarray, jnp.ndarray],
    kv_speaker: Tuple[jnp.ndarray, jnp.ndarray],
    kv_latent: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    speaker_scale: jnp.ndarray,
    *,
    num_heads: int,
    eps: float,
    impl: str = "xla",
    mesh=None,
) -> jnp.ndarray:
    """DiT joint attention over [self, latent-prefix, text, speaker] segments
    (reference: model.py:204-268).

    Q-batch is G*B while KV batch is B (G = CFG guidance branches); KV is
    broadcast across G inside the einsums (or the Pallas kernel's index
    map).  `speaker_scale` is a scalar multiplying the speaker K and V —
    applied as a logit scale pre-softmax and a weight scale post-softmax
    (xla path) or directly to the cached K/V (pallas path); both are
    mathematically identical to scaling the cache (inference.py:408-414)
    without rewriting it.

    impl: "xla" | "pallas" | "pallas_interpret" (resolved by dit_forward).
    """
    gb, s, d = x.shape
    k_text, v_text = kv_text
    k_spk, v_spk = kv_speaker
    b = k_text.shape[0]
    g = gb // b
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)

    q = qdot(x, p["wq"]).reshape(gb, s, num_heads, dh)
    k_self = qdot(x, p["wk"]).reshape(gb, s, num_heads, dh)
    v_self = qdot(x, p["wv"]).reshape(gb, s, num_heads, dh)
    gate = qdot(x, p["gate"])

    q = rms_norm(q, p["q_norm"], eps)
    k_self = rms_norm(k_self, p["k_norm"], eps)

    q = apply_rotary_emb_half_heads(q, freqs_q)
    k_self = apply_rotary_emb_half_heads(k_self, freqs_q)

    if impl.startswith("pallas"):
        spk_scale = speaker_scale.astype(k_spk.dtype)
        k_parts = [k_text, k_spk * spk_scale]
        v_parts = [v_text, v_spk * spk_scale]
        m_parts = [text_mask, speaker_mask]
        if kv_latent is not None:
            k_parts.insert(0, kv_latent[0])
            v_parts.insert(0, kv_latent[1])
            m_parts.insert(0, latent_mask)
        k_static = jnp.concatenate(k_parts, axis=1)
        v_static = jnp.concatenate(v_parts, axis=1)
        static_mask = jnp.concatenate(m_parts, axis=-1)
        interp = impl.endswith("_interpret")
        if impl.startswith("pallas_shmap"):
            out = fused_joint_attention_sharded(
                q, k_self, v_self, k_static, v_static, static_mask,
                sm_scale=scale, mesh=mesh, interpret=interp)
        else:
            out = fused_joint_attention(
                q, k_self, v_self, k_static, v_static, static_mask,
                sm_scale=scale, interpret=interp)
        out = out.reshape(gb, s, d)
        out = out * jax.nn.sigmoid(gate)
        return qdot(out, p["wo"])

    qg = q.reshape(g, b, s, num_heads, dh)

    # Per-segment logits; fp32 accumulation on the MXU.
    def seg_logits(k):  # k: (B, T, H, Dh) -> (G, B, H, S, T)
        return jnp.einsum("gbshd,bthd->gbhst", qg, k,
                          preferred_element_type=jnp.float32) * scale

    logits_self = jnp.einsum(
        "gbshd,gbthd->gbhst", qg, k_self.reshape(g, b, s, num_heads, dh),
        preferred_element_type=jnp.float32) * scale
    logits_text = seg_logits(k_text)
    logits_spk = seg_logits(k_spk) * speaker_scale

    neg_inf = float("-inf")
    logits_text = jnp.where(
        text_mask.reshape(g, b, 1, 1, -1), logits_text, neg_inf)
    logits_spk = jnp.where(
        speaker_mask.reshape(g, b, 1, 1, -1), logits_spk, neg_inf)

    parts = [logits_self]
    if kv_latent is not None:
        k_lat, v_lat = kv_latent
        logits_lat = seg_logits(k_lat)
        logits_lat = jnp.where(
            latent_mask.reshape(g, b, 1, 1, -1), logits_lat, neg_inf)
        parts.append(logits_lat)
    parts += [logits_text, logits_spk]

    sizes = [pt.shape[-1] for pt in parts]
    logits = jnp.concatenate(parts, axis=-1)
    weights = jax.nn.softmax(logits, axis=-1)

    # Split weights back per segment; scale the speaker weights (the V side
    # of the speaker-KV scale), then accumulate PV per segment.
    offs = np.cumsum([0] + sizes)
    w_self = weights[..., offs[0]:offs[1]].astype(v_self.dtype)
    out = jnp.einsum("gbhst,gbthd->gbshd", w_self,
                     v_self.reshape(g, b, s, num_heads, dh))
    idx = 1
    if kv_latent is not None:
        w_lat = weights[..., offs[idx]:offs[idx + 1]].astype(v_lat.dtype)
        out = out + jnp.einsum("gbhst,bthd->gbshd", w_lat, v_lat)
        idx += 1
    w_text = weights[..., offs[idx]:offs[idx + 1]].astype(v_text.dtype)
    out = out + jnp.einsum("gbhst,bthd->gbshd", w_text, v_text)
    idx += 1
    w_spk = (weights[..., offs[idx]:offs[idx + 1]]
             * speaker_scale).astype(v_spk.dtype)
    out = out + jnp.einsum("gbhst,bthd->gbshd", w_spk, v_spk)

    out = out.reshape(gb, s, d)
    out = out * jax.nn.sigmoid(gate)
    return qdot(out, p["wo"])


def _joint_attention_static(
    p: dict,
    x: jnp.ndarray,
    static_mask: jnp.ndarray,     # (GB, T) bool
    col_scale: jnp.ndarray,       # (T,) f32
    freqs_q: jnp.ndarray,
    k_static: jnp.ndarray,        # (B, T, H, Dh) — bf16, or int8 with
    v_static: jnp.ndarray,        #   kv_scales (ops/quant.py)
    *,
    num_heads: int,
    eps: float,
    impl: str,
    mesh=None,
    kv_scales=None,               # ((B,T,H), (B,T,H)) f32 int8 scales
) -> jnp.ndarray:
    """Joint attention over [self | pre-concatenated static KV] — the hot
    sampler path.  Same math as _joint_attention, but text/speaker/latent
    are already concatenated (concat_static_kv) so nothing per-segment is
    materialized inside the layer scan; the speaker-KV scale arrives as a
    per-column multiplier on logits (K·s) and weights (V·s).  Int8 static
    KV (quantize_kv_int8) rides the same identity: its per-token-per-head
    dequant scales fold into the K/V column multipliers, so the KV is
    read from HBM at half width and cast in VMEM (pallas) or at the
    einsum input (xla)."""
    gb, s, d = x.shape
    b = k_static.shape[0]
    g = gb // b
    dh = d // num_heads
    scale = 1.0 / (dh ** 0.5)

    q = qdot(x, p["wq"]).reshape(gb, s, num_heads, dh)
    k_self = qdot(x, p["wk"]).reshape(gb, s, num_heads, dh)
    v_self = qdot(x, p["wv"]).reshape(gb, s, num_heads, dh)
    gate = qdot(x, p["gate"])

    q = rms_norm(q, p["q_norm"], eps)
    k_self = rms_norm(k_self, p["k_norm"], eps)
    q = apply_rotary_emb_half_heads(q, freqs_q)
    k_self = apply_rotary_emb_half_heads(k_self, freqs_q)

    if impl.startswith("pallas"):
        interp = impl.endswith("_interpret")
        if impl.startswith("pallas_shmap"):
            out = fused_joint_attention_sharded(
                q, k_self, v_self, k_static, v_static, static_mask,
                col_scale, sm_scale=scale, mesh=mesh, interpret=interp,
                kv_scales=kv_scales)
        else:
            out = fused_joint_attention(
                q, k_self, v_self, k_static, v_static, static_mask,
                col_scale, sm_scale=scale, interpret=interp,
                kv_scales=kv_scales)
        out = out.reshape(gb, s, d)
        return qdot(out * jax.nn.sigmoid(gate), p["wo"])

    if kv_scales is not None:
        ks, vs = kv_scales
        # (B,T,H) -> (1,B,1,1·H? ) broadcast over (g,b,h,s,t)
        k_col = col_scale * ks.astype(jnp.float32).transpose(0, 2, 1)[
            None, :, :, None, :]
        v_col = col_scale * vs.astype(jnp.float32).transpose(0, 2, 1)[
            None, :, :, None, :]
        k_static = k_static.astype(q.dtype)
        v_static = v_static.astype(q.dtype)
    else:
        k_col = v_col = col_scale

    qg = q.reshape(g, b, s, num_heads, dh)
    logits_self = jnp.einsum(
        "gbshd,gbthd->gbhst", qg, k_self.reshape(g, b, s, num_heads, dh),
        preferred_element_type=jnp.float32) * scale
    logits_st = jnp.einsum(
        "gbshd,bthd->gbhst", qg, k_static,
        preferred_element_type=jnp.float32) * scale
    logits_st = logits_st * k_col
    logits_st = jnp.where(
        static_mask.reshape(g, b, 1, 1, -1), logits_st, float("-inf"))

    logits = jnp.concatenate([logits_self, logits_st], axis=-1)
    weights = jax.nn.softmax(logits, axis=-1)
    w_self = weights[..., :s].astype(v_self.dtype)
    w_st = (weights[..., s:] * v_col).astype(v_static.dtype)
    out = jnp.einsum("gbhst,gbthd->gbshd", w_self,
                     v_self.reshape(g, b, s, num_heads, dh))
    out = out + jnp.einsum("gbhst,bthd->gbshd", w_st, v_static)
    out = out.reshape(gb, s, d)
    return qdot(out * jax.nn.sigmoid(gate), p["wo"])


def dit_forward_static(
    params: dict,
    cfg: EchoDiTConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    kv_static: KV,                # (L, B, T, H, Dh) from concat_static_kv
    spk_cols: jnp.ndarray,        # (T,) bool
    static_mask: jnp.ndarray,     # (GB, T) bool (static_attention_mask)
    *,
    start_pos=0,
    max_pos: Optional[int] = None,
    speaker_scale_by_layer: Optional[jnp.ndarray] = None,
    mesh=None,
) -> jnp.ndarray:
    """Denoiser forward over pre-concatenated static KV — what the sampler
    cores call per step (reference semantics identical to dit_forward;
    see _joint_attention_static).  Pass `mesh` when params/inputs live on a
    (data, model) mesh so the fused attention runs per shard.

    `start_pos` may be a Python int (static RoPE offset) or a traced int32
    scalar — the latter needs `max_pos` (static upper bound on
    start_pos + S) and lets one compiled program serve every block position
    in the blockwise sampler."""
    s = x.shape[1]
    if isinstance(start_pos, (int, np.integer)):
        freqs_q = _freqs(cfg.head_dim, start_pos + s)[start_pos:]
    else:
        if max_pos is None:
            raise ValueError("traced start_pos requires static max_pos")
        freqs_q = jax.lax.dynamic_slice_in_dim(
            _freqs(cfg.head_dim, max_pos), start_pos, s, axis=0)
    # kv_static is the (k, v) tuple from concat_static_kv, or the int8
    # dict from ops/quant.quantize_kv_int8 (opt-in: halves the KV's HBM
    # footprint and read bandwidth; scales fold into the column scale).
    from ..ops.quant import kv_is_quantized
    kv_q8 = kv_is_quantized(kv_static)
    k_lead = kv_static["k8"] if kv_q8 else kv_static[0]
    t_static = k_lead.shape[2]
    impl = _select_attention_impl(cfg, s, t_static, cfg.head_dim,
                                  mesh=mesh, kv_batch=k_lead.shape[1],
                                  q_batch=x.shape[0])

    cond = get_timestep_embedding(t, cfg.timestep_embed_size)
    c = params["cond"]
    cond = jax.nn.silu(cond @ c["w0"])
    cond = jax.nn.silu(cond @ c["w1"])
    cond = (cond @ c["w2"])[:, None]

    h = x @ params["in_proj"]["kernel"] + params["in_proj"]["bias"]

    if speaker_scale_by_layer is None:
        speaker_scale_by_layer = jnp.ones((cfg.num_layers,), jnp.float32)

    if kv_q8:
        xs = dict(p=params["blocks"], k_st=kv_static["k8"],
                  v_st=kv_static["v8"], ks=kv_static["ks"],
                  vs=kv_static["vs"], spk_scale=speaker_scale_by_layer)
    else:
        xs = dict(p=params["blocks"], k_st=kv_static[0], v_st=kv_static[1],
                  spk_scale=speaker_scale_by_layer)
    spk_cols_f = spk_cols.astype(jnp.float32)

    def body(h, xs_i):
        p = xs_i["p"]
        # col_scale = 1 on non-speaker cols, layer scale on speaker cols
        col_scale = 1.0 + (xs_i["spk_scale"] - 1.0) * spk_cols_f
        h_norm, gate = low_rank_adaln(h, cond, p["attn_adaln"], cfg.norm_eps)
        h = h + gate * _joint_attention_static(
            p["attn"], h_norm, static_mask, col_scale, freqs_q,
            xs_i["k_st"], xs_i["v_st"],
            num_heads=cfg.num_heads, eps=cfg.norm_eps, impl=impl, mesh=mesh,
            kv_scales=(xs_i["ks"], xs_i["vs"]) if kv_q8 else None)
        h_norm, gate = low_rank_adaln(h, cond, p["mlp_adaln"], cfg.norm_eps)
        h = h + gate * _mlp(p["mlp"], h_norm)
        return h, None

    h, _ = jax.lax.scan(body, h, xs)
    h = rms_norm(h, params["out_norm"], cfg.norm_eps)
    h = h @ params["out_proj"]["kernel"] + params["out_proj"]["bias"]
    return h.astype(jnp.float32)


def dit_forward(
    params: dict,
    cfg: EchoDiTConfig,
    x: jnp.ndarray,
    t: jnp.ndarray,
    text_mask: jnp.ndarray,
    speaker_mask: jnp.ndarray,
    kv_text: KV,
    kv_speaker: KV,
    *,
    start_pos: int = 0,
    kv_latent: Optional[KV] = None,
    latent_mask: Optional[jnp.ndarray] = None,
    speaker_scale_by_layer: Optional[jnp.ndarray] = None,
    remat: Union[bool, str] = False,
    mesh=None,
) -> jnp.ndarray:
    """One denoiser forward (reference: model.py:563-604).

    x: (G*B, S, latent) in model dtype; t: (G*B,).
    text_mask/speaker_mask: (G*B, S_seg) bool.  kv_*: (L, B, ...).
    speaker_scale_by_layer: (L,) multiplicative speaker-KV scale (functional
    replacement for the reference's in-place cache scaling).
    remat: rematerialize each layer on the backward pass (training at full
    size would otherwise save every layer's attention internals).
    True/"full" = full remat (minimum memory); "dots" = checkpoint with
    the dots_with_no_batch_dims_saveable policy — the WEIGHT matmuls
    (x @ wq/w1/..., batch-dim-free dots) are saved, while the batched
    attention einsums (QK^T, AV) and elementwise work still recompute;
    "dots_all" = dots_saveable (ALSO saves the batched attention
    einsums — most memory of the remat modes, least recompute);
    "attn" = save_only_these_names("attn_out"): each layer's attention
    OUTPUT is saved so the backward never re-runs attention forward,
    while the (cheap, elementwise-heavy) AdaLN/MLP work recomputes.
    All modes measured on-chip in docs/PERFORMANCE.md §12.
    Returns float32 (model.py:604).
    """
    s = x.shape[1]
    freqs_q = _freqs(cfg.head_dim, start_pos + s)[start_pos:]

    # speaker mask is subsampled by patch_size (model.py:581)
    spk_mask = speaker_mask[..., :: cfg.speaker_patch_size]

    t_static = (kv_text[0].shape[2] + kv_speaker[0].shape[2]
                + (kv_latent[0].shape[2] if kv_latent is not None else 0))
    impl = _select_attention_impl(cfg, x.shape[1], t_static, cfg.head_dim,
                                  mesh=mesh, kv_batch=kv_text[0].shape[1],
                                  q_batch=x.shape[0])

    cond = get_timestep_embedding(t, cfg.timestep_embed_size)
    c = params["cond"]
    cond = jax.nn.silu(cond @ c["w0"])
    cond = jax.nn.silu(cond @ c["w1"])
    cond = (cond @ c["w2"])[:, None]  # (G*B, 1, 3M)

    h = x @ params["in_proj"]["kernel"] + params["in_proj"]["bias"]

    if speaker_scale_by_layer is None:
        speaker_scale_by_layer = jnp.ones(
            (cfg.num_layers,), dtype=jnp.float32)

    blocks = params["blocks"]
    have_latent = kv_latent is not None
    xs = dict(
        p=blocks,
        k_text=kv_text[0], v_text=kv_text[1],
        k_spk=kv_speaker[0], v_spk=kv_speaker[1],
        spk_scale=speaker_scale_by_layer,
    )
    if have_latent:
        xs.update(k_lat=kv_latent[0], v_lat=kv_latent[1])

    def body(h, xs_i):
        p = xs_i["p"]
        kv_lat = (xs_i["k_lat"], xs_i["v_lat"]) if have_latent else None
        h_norm, gate = low_rank_adaln(h, cond, p["attn_adaln"], cfg.norm_eps)
        attn_out = _joint_attention(
            p["attn"], h_norm, text_mask, spk_mask, latent_mask, freqs_q,
            (xs_i["k_text"], xs_i["v_text"]), (xs_i["k_spk"], xs_i["v_spk"]),
            kv_lat, xs_i["spk_scale"],
            num_heads=cfg.num_heads, eps=cfg.norm_eps, impl=impl, mesh=mesh,
        )
        # no-op marker outside remat; the "attn" policy keys on it
        # (jax 0.9 removed the jax.ad_checkpoint ATTRIBUTE, but the
        # module itself still imports)
        from jax.ad_checkpoint import checkpoint_name
        attn_out = checkpoint_name(attn_out, "attn_out")
        h = h + gate * attn_out
        h_norm, gate = low_rank_adaln(h, cond, p["mlp_adaln"], cfg.norm_eps)
        h = h + gate * _mlp(p["mlp"], h_norm)
        return h, None

    if remat:
        policies = {
            True: None, "full": None,
            "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            "dots_all": jax.checkpoint_policies.dots_saveable,
            "attn": jax.checkpoint_policies.save_only_these_names(
                "attn_out"),
        }
        if remat not in policies:
            raise ValueError(
                f"remat={remat!r}: expected one of "
                f"{sorted(k for k in policies if isinstance(k, str))}")
        body = jax.checkpoint(body, policy=policies[remat])
    h, _ = jax.lax.scan(body, h, xs)

    h = rms_norm(h, params["out_norm"], cfg.norm_eps)
    h = h @ params["out_proj"]["kernel"] + params["out_proj"]["bias"]
    return h.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Initialization (random weights for benchmarks/tests; real weights come from
# tools/convert.py)
# ---------------------------------------------------------------------------

def _linear(key, fan_in, fan_out, dtype):
    return (jax.random.normal(key, (fan_in, fan_out), jnp.float32)
            * (fan_in ** -0.5)).astype(dtype)


def _init_enc_blocks(key, n, d, heads, inter, dtype):
    ks = jax.random.split(key, 8)
    dh = d // heads
    return {
        "attn": {
            "wq": _linear(ks[0], d, d * n, dtype).reshape(n, d, d),
            "wk": _linear(ks[1], d, d * n, dtype).reshape(n, d, d),
            "wv": _linear(ks[2], d, d * n, dtype).reshape(n, d, d),
            "wo": _linear(ks[3], d, d * n, dtype).reshape(n, d, d),
            "gate": _linear(ks[4], d, d * n, dtype).reshape(n, d, d),
            "q_norm": jnp.ones((n, heads, dh), dtype),
            "k_norm": jnp.ones((n, heads, dh), dtype),
        },
        "mlp": {
            "w1": _linear(ks[5], d, inter * n, dtype).reshape(n, d, inter),
            "w3": _linear(ks[6], d, inter * n, dtype).reshape(n, d, inter),
            "w2": _linear(ks[7], inter, d * n, dtype).reshape(n, inter, d),
        },
        "attn_norm": jnp.ones((n, d), dtype),
        "mlp_norm": jnp.ones((n, d), dtype),
    }


def init_dit_params(key: jax.Array, cfg: EchoDiTConfig,
                    dtype=jnp.bfloat16) -> dict:
    keys = jax.random.split(key, 24)
    m, dt, ds = cfg.model_size, cfg.text_model_size, cfg.speaker_model_size
    n, r, f = cfg.num_layers, cfg.adaln_rank, cfg.intermediate_size
    dh = cfg.head_dim

    def adaln(key):
        ks = jax.random.split(key, 6)
        return {
            "shift_down": _linear(ks[0], m, r * n, dtype).reshape(n, m, r),
            "scale_down": _linear(ks[1], m, r * n, dtype).reshape(n, m, r),
            "gate_down": _linear(ks[2], m, r * n, dtype).reshape(n, m, r),
            "shift_up": {"kernel": _linear(ks[3], r, m * n, dtype).reshape(n, r, m),
                         "bias": jnp.zeros((n, m), dtype)},
            "scale_up": {"kernel": _linear(ks[4], r, m * n, dtype).reshape(n, r, m),
                         "bias": jnp.zeros((n, m), dtype)},
            "gate_up": {"kernel": _linear(ks[5], r, m * n, dtype).reshape(n, r, m),
                        "bias": jnp.zeros((n, m), dtype)},
        }

    def enc(key, with_in_proj):
        ks = jax.random.split(key, 2)
        out = {"blocks": _init_enc_blocks(
            ks[0], cfg.speaker_num_layers, ds, cfg.speaker_num_heads,
            cfg.speaker_intermediate_size, dtype)}
        if with_in_proj:
            out["in_proj"] = {
                "kernel": _linear(ks[1], cfg.latent_size * cfg.speaker_patch_size,
                                  ds, dtype),
                "bias": jnp.zeros((ds,), dtype)}
        return out

    blk_keys = jax.random.split(keys[0], 16)
    blocks = {
        "attn": {
            "wq": _linear(blk_keys[0], m, m * n, dtype).reshape(n, m, m),
            "wk": _linear(blk_keys[1], m, m * n, dtype).reshape(n, m, m),
            "wv": _linear(blk_keys[2], m, m * n, dtype).reshape(n, m, m),
            "wo": _linear(blk_keys[3], m, m * n, dtype).reshape(n, m, m),
            "gate": _linear(blk_keys[4], m, m * n, dtype).reshape(n, m, m),
            "wk_text": _linear(blk_keys[5], dt, m * n, dtype).reshape(n, dt, m),
            "wv_text": _linear(blk_keys[6], dt, m * n, dtype).reshape(n, dt, m),
            "wk_speaker": _linear(blk_keys[7], ds, m * n, dtype).reshape(n, ds, m),
            "wv_speaker": _linear(blk_keys[8], ds, m * n, dtype).reshape(n, ds, m),
            "q_norm": jnp.ones((n, cfg.num_heads, dh), dtype),
            "k_norm": jnp.ones((n, cfg.num_heads, dh), dtype),
        },
        "mlp": {
            "w1": _linear(blk_keys[9], m, f * n, dtype).reshape(n, m, f),
            "w3": _linear(blk_keys[10], m, f * n, dtype).reshape(n, m, f),
            "w2": _linear(blk_keys[11], f, m * n, dtype).reshape(n, f, m),
        },
        "attn_adaln": adaln(blk_keys[12]),
        "mlp_adaln": adaln(blk_keys[13]),
    }
    if cfg.blockwise:
        blocks["attn"]["wk_latent"] = _linear(
            blk_keys[14], ds, m * n, dtype).reshape(n, ds, m)
        blocks["attn"]["wv_latent"] = _linear(
            blk_keys[15], ds, m * n, dtype).reshape(n, ds, m)

    params = {
        "text_encoder": {
            "embedding": (jax.random.normal(keys[1], (cfg.text_vocab_size, dt),
                                            jnp.float32)).astype(dtype),
            "blocks": _init_enc_blocks(
                keys[2], cfg.text_num_layers, dt, cfg.text_num_heads,
                cfg.text_intermediate_size, dtype),
        },
        "speaker_encoder": enc(keys[3], True),
        "text_norm": jnp.ones((dt,), dtype),
        "speaker_norm": jnp.ones((ds,), dtype),
        "cond": {
            "w0": _linear(keys[4], cfg.timestep_embed_size, m, dtype),
            "w1": _linear(keys[5], m, m, dtype),
            "w2": _linear(keys[6], m, 3 * m, dtype),
        },
        "in_proj": {"kernel": _linear(keys[7], cfg.latent_size, m, dtype),
                    "bias": jnp.zeros((m,), dtype)},
        "blocks": blocks,
        "out_norm": jnp.ones((m,), dtype),
        "out_proj": {"kernel": _linear(keys[8], m, cfg.latent_size, dtype),
                     "bias": jnp.zeros((cfg.latent_size,), dtype)},
    }
    if cfg.blockwise:
        params["latent_encoder"] = enc(keys[9], True)
        params["latent_norm"] = jnp.ones((ds,), dtype)
    return params
