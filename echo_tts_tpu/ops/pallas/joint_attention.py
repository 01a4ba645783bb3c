"""Fused multi-segment joint attention (Pallas TPU kernel).

The DiT's joint attention (reference: model.py:204-268) attends one query
stream to KV segments [self, latent-prefix, text, speaker].  The XLA path
(models/dit.py:_joint_attention) materializes (G, B, H, S, T) fp32 logits in
HBM — ~190 MB/layer at the published config.  This kernel keeps everything
in VMEM:

  grid = (G*B, H): one invocation owns a full (S, Dh) query block, computes
  self-segment and static-segment logits on the MXU in fp32, applies the
  key-padding mask, softmaxes over the concatenated key axis, and
  accumulates PV — logits never leave VMEM.

Segments are split in two:
  * self  KV: (G*B, S, H, Dh)    — one row per guidance branch
  * static KV: (B, T, H, Dh)     — text ++ speaker (++ latent prefix),
    shared across the G guidance branches; the index map reads row b % B,
    so the G-fold broadcast never materializes.

The static mask is (G*B, T) bool (True = attend) and carries all CFG
branch structure (uncond branches mask whole segments) plus any padding
introduced to round T up to a lane multiple.  Speaker-KV scaling
(inference.py:408-414) is applied to k/v_static before the call — K-scaling
≡ logit scaling, V-scaling ≡ weight scaling, both linear.

VMEM budget per invocation at the published config (S=640, T≤2432+pad):
q 160 KB + self kv 320 KB + static kv ~1.2 MB + fp32 logits ≤ 8 MB — well
under the 16 MB/core VMEM.  `fits_vmem()` guards the auto-dispatch.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# Finite mask for the flash kernel: exp(MASK - m) underflows to exactly 0
# in fp32 while keeping the online-softmax max/alpha arithmetic NaN-free
# (with -inf, a fully-masked tile would produce exp(-inf - -inf) = NaN).
MASK_VALUE = -1e30
# Tuned on a v5e (examples/bench_attention.py sweep, round 3): 256x1024
# was fastest or tied at every shape that takes the flash path (S >= 1280
# past the whole-row VMEM budget, and large-GB batches); 256x512 lost
# ~10-25% at batch.  See docs/PERFORMANCE.md §8 for the table.
FLASH_BLOCK_Q = 256
FLASH_BLOCK_KV = 1024


def _kernel(q_ref, ks_ref, vs_ref, kt_ref, vt_ref, bias_ref, kscale_ref,
            vscale_ref, out_ref, *, sm_scale: float):
    # blocks are (1, 1, seq, Dh); bias block is the full (GB, T) array and
    # is indexed by the batch program id (a (1, T) row slice keeps the
    # sublane dim tiled-legal where a (1, T) BlockSpec would not be).
    # kscale_ref/vscale_ref (1, 1, T) carry per-(batch, head, column)
    # multiplicative scales — the functional form of BOTH the reference's
    # speaker K/V cache scaling (inference.py:408-414) and the int8
    # static-KV dequantization (ops/quant.py:quantize_kv_int8): multiply
    # logits (≡ K·s) and the softmax weights (≡ V·s) by the column scale.
    # k/v static tiles may arrive int8 — the cast to the compute dtype
    # happens HERE, in VMEM, after the (halved) HBM read.
    q = q_ref[0, 0]
    k_self = ks_ref[0, 0]
    v_self = vs_ref[0, 0]
    k_st = kt_ref[0, 0].astype(q.dtype)
    v_st = vt_ref[0, 0].astype(q.dtype)
    bias = bias_ref[pl.ds(pl.program_id(0), 1), :]  # (1, T)
    # scale blocks are (H, T) — this invocation's batch row's heads
    # (sliced by the BlockSpec); pick the head row the same way bias
    # picks its batch row (2-D ref + pl.ds sublane slice is the pattern
    # Mosaic lowers; a rank-3 ref with a scalar lead index is not)
    hi = pl.program_id(1)
    k_scale = kscale_ref[pl.ds(hi, 1), :]           # (1, T)
    v_scale = vscale_ref[pl.ds(hi, 1), :]           # (1, T)

    logits_self = jax.lax.dot_general(
        q, k_self, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    logits_st = jax.lax.dot_general(
        q, k_st, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    logits_st = logits_st * k_scale + bias

    m = jnp.maximum(jnp.max(logits_self, axis=-1, keepdims=True),
                    jnp.max(logits_st, axis=-1, keepdims=True))
    e_self = jnp.exp(logits_self - m)
    e_st = jnp.exp(logits_st - m)
    denom = (jnp.sum(e_self, axis=-1, keepdims=True)
             + jnp.sum(e_st, axis=-1, keepdims=True))

    acc = jax.lax.dot_general(
        e_self.astype(v_self.dtype), v_self, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        (e_st * v_scale).astype(v_st.dtype), v_st,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    out_ref[0, 0] = (acc / denom).astype(out_ref.dtype)


def _flash_kernel(q_ref, ks_ref, vs_ref, kt_ref, vt_ref, bias_ref,
                  kscale_ref, vscale_ref,
                  out_ref, m_ref, l_ref, acc_ref, *,
                  sm_scale: float, n_self: int, n_kv: int, s_kv: int,
                  block_t: int, b_kv: int):
    """Blocked (flash) variant: grid (GB, H, n_q_blocks, n_kv_blocks) with
    the kv-block dim innermost (sequential on TPU); online softmax over
    first the self tiles then the static tiles, running (m, l, acc) in VMEM
    scratch.  Per-column scale/mask semantics are identical to `_kernel`;
    only the (S, T) logits are tiled — this is what breaks the whole-row
    VMEM budget at large S."""
    # program_id must be read at kernel top level (inside a pl.when body it
    # has no lowering rule under interpret mode).
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        # m init == MASK_VALUE: a FULLY-masked tile whose logits all equal
        # MASK_VALUE would give e = exp(0) = 1 per masked column, briefly
        # corrupting (l, acc) — but the first tile containing any real
        # logit rescales by alpha = exp(MASK_VALUE - m_real) = 0, wiping
        # the corruption.  The only shape that could emit garbage is a
        # query row whose EVERY kv tile is masked; self tile 0 always has
        # unmasked column 0 (s_kv >= 1 below), so each row sees at least
        # one real logit and the output is exact.  Padded query rows
        # (s_pad_q > s) produce finite garbage and are sliced off.
        m_ref[...] = jnp.full_like(m_ref, MASK_VALUE)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]                       # (block_q, Dh)

    def online_update(logits, v, w_scale):
        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        e = jnp.exp(logits - m_new)
        l_ref[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(e, axis=-1, keepdims=True), l_ref.shape)
        if w_scale is not None:
            e = e * w_scale
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(ki < n_self)
    def _self_tile():
        k = ks_ref[0, 0]                  # (block_t, Dh)
        v = vs_ref[0, 0]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        col = ki * block_t + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_t), 1)
        logits = jnp.where(col < s_kv, logits, MASK_VALUE)
        online_update(logits, v, None)

    @pl.when(ki >= n_self)
    def _static_tile():
        k = kt_ref[0, 0].astype(q.dtype)   # int8 KV casts in VMEM
        v = vt_ref[0, 0].astype(q.dtype)
        # bias/scale COLUMNS are selected by the BlockSpec index maps
        # (blocks of 8 sublane rows x block_t lanes); in-kernel slicing
        # is SUBLANE-only — Mosaic on this stack cannot lower a load
        # that is dynamic in both sublane and lane dims.
        bias = bias_ref[pl.ds(bi % 8, 1), :]                # (1, block_t)
        row = ((bi % b_kv) * pl.num_programs(1) + hi) % 8
        cs_k = kscale_ref[pl.ds(row, 1), :]                 # (1, block_t)
        cs_v = vscale_ref[pl.ds(row, 1), :]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        logits = logits * cs_k + bias
        online_update(logits, v, cs_v)

    @pl.when(ki == n_kv - 1)
    def _finalize():
        out_ref[0, 0] = (acc_ref[...] / l_ref[:, :1]).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fits_vmem(s: int, t_static: int, head_dim: int,
              budget_bytes: int = 14 * 1024 * 1024) -> bool:
    """VMEM estimate for one (b, h) invocation.  The exp intermediates
    reuse the fp32 logits buffer, so logits count once; measured on a v5e,
    the published worst case (S=640, T=768+1600) runs at 0.89 ms/call with
    no spilling."""
    t_pad = _round_up(t_static, LANE)
    logits = 4 * s * (s + t_pad)         # fp32 self + static logits
    kv = 2 * 2 * (s + t_pad) * head_dim  # bf16 k+v both segments
    q_out = 2 * 2 * s * head_dim + 4 * s * head_dim
    return logits + kv + q_out < budget_bytes


def fits_vmem_flash(s: int, t_static: int, head_dim: int,
                    q_batch: int = 3,
                    block_q: int = FLASH_BLOCK_Q,
                    block_kv: int = FLASH_BLOCK_KV,
                    budget_bytes: int = 14 * 1024 * 1024) -> bool:
    """VMEM estimate for one flash-kernel invocation.  EVERY operand is
    tiled by its BlockSpec now — K/V as (block_kv, Dh) tiles, bias and
    the K/V column scales as (8, block_kv) tiles (column selection moved
    into the index maps so the kernel's loads stay single-dynamic; the
    full-array bias residency that used to bound large batch x long KV
    is gone) — so the budget is block-size-dependent only."""
    del s, t_static, q_batch  # shape-independent since the bias tiling
    kv = 4 * 2 * 2 * block_kv * head_dim      # bf16 k+v tiles ×2 buffers
    tiles = 4 * block_q * (block_kv + head_dim + 2 * LANE)  # logits+acc+m/l
    q_out = 2 * 2 * block_q * head_dim
    bias_b = 4 * 8 * block_kv * 2 * 3         # (8, block_t) bias+2 scales
    return kv + tiles + q_out + bias_b < budget_bytes


def _pallas_attention_flash(qt, kst, vst, ktt, vtt, bias, kscale, vscale,
                            *, sm_scale: float, block_q: int, block_t: int,
                            interpret: bool) -> jnp.ndarray:
    """Blocked pallas_call on the transposed (batch, H, seq, Dh) layout.
    kscale/vscale: (B, H, T) f32 per-(batch, head, column) scales."""
    gb, h, s, dh = qt.shape
    b = ktt.shape[0]

    s_pad_q = _round_up(s, block_q)
    if s_pad_q != s:
        qt = jnp.pad(qt, [(0, 0), (0, 0), (0, s_pad_q - s), (0, 0)])
    s_pad_kv = _round_up(s, block_t)
    if s_pad_kv != s:
        pad = [(0, 0), (0, 0), (0, s_pad_kv - s), (0, 0)]
        kst = jnp.pad(kst, pad)
        vst = jnp.pad(vst, pad)
    t_in = ktt.shape[2]
    t_pad = _round_up(t_in, block_t)
    if t_pad != t_in:
        pad = [(0, 0), (0, 0), (0, t_pad - t_in), (0, 0)]
        ktt = jnp.pad(ktt, pad)
        vtt = jnp.pad(vtt, pad)
        bias = jnp.pad(bias, [(0, 0), (0, t_pad - t_in)],
                       constant_values=MASK_VALUE)
        spad = [(0, 0), (0, t_pad - t_in)]   # scales are (B*H, T)
        kscale = jnp.pad(kscale, spad)
        vscale = jnp.pad(vscale, spad)

    n_q = s_pad_q // block_q
    n_self = s_pad_kv // block_t
    n_static = t_pad // block_t
    n_kv = n_self + n_static

    # Pad the row (sublane) dims of bias and the scales to a multiple of
    # 8 so their BlockSpecs can carry 8-row tiles (TPU tiling rule) while
    # the COLUMN tile is selected by the index map — the kernel's slices
    # are then sublane-only dynamic (see _static_tile).
    gb_pad = _round_up(gb, 8)
    if gb_pad != gb:
        bias = jnp.pad(bias, [(0, gb_pad - gb), (0, 0)])
    bh = kscale.shape[0]
    bh_pad = _round_up(bh, 8)
    if bh_pad != bh:
        kscale = jnp.pad(kscale, [(0, bh_pad - bh), (0, 0)])
        vscale = jnp.pad(vscale, [(0, bh_pad - bh), (0, 0)])

    def _col(ki):
        return jnp.clip(ki - n_self, 0, n_static - 1)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=sm_scale, n_self=n_self,
                          n_kv=n_kv, s_kv=s, block_t=block_t, b_kv=b),
        grid=(gb, h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, dh),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t, dh),
                         lambda bi, hi, qi, ki:
                         (bi, hi, jnp.minimum(ki, n_self - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t, dh),
                         lambda bi, hi, qi, ki:
                         (bi, hi, jnp.minimum(ki, n_self - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t, dh),
                         lambda bi, hi, qi, ki:
                         (bi % b, hi,
                          jnp.clip(ki - n_self, 0, n_static - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_t, dh),
                         lambda bi, hi, qi, ki:
                         (bi % b, hi,
                          jnp.clip(ki - n_self, 0, n_static - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_t),
                         lambda bi, hi, qi, ki: (bi // 8, _col(ki)),
                         memory_space=pltpu.VMEM),
            # scales arrive (B*H, T) row-padded to 8; the index map picks
            # the 8-row group + column tile, the kernel the row within
            pl.BlockSpec((8, block_t),
                         lambda bi, hi, qi, ki:
                         (((bi % b) * h + hi) // 8, _col(ki)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_t),
                         lambda bi, hi, qi, ki:
                         (((bi % b) * h + hi) // 8, _col(ki)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, dh),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gb, h, s_pad_q, dh), qt.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANE), jnp.float32),   # running max
            pltpu.VMEM((block_q, LANE), jnp.float32),   # running denom
            pltpu.VMEM((block_q, dh), jnp.float32),     # running PV acc
        ],
        interpret=interpret,
    )(qt, kst, vst, ktt, vtt, bias, kscale, vscale)
    return out[:, :, :s]


def _pallas_attention(qt, kst, vst, ktt, vtt, bias, kscale, vscale,
                      *, sm_scale: float, interpret: bool) -> jnp.ndarray:
    """The raw pallas_call on transposed (batch, H, seq, Dh) layout.
    kscale/vscale: (B, H, T) f32 per-(batch, head, column) scales."""
    gb, h, s, dh = qt.shape
    b, _, t_pad, _ = ktt.shape
    return pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale),
        grid=(gb, h),
        in_specs=[
            pl.BlockSpec((1, 1, s, dh), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, dh), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, dh),
                         lambda bi, hi: (bi % b, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t_pad, dh),
                         lambda bi, hi: (bi % b, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, t_pad), lambda bi, hi: (0, 0),
                         memory_space=pltpu.VMEM),
            # scales arrive (B*H, T); one (H, T) block per batch row, the
            # kernel picks its head row like bias picks its batch row
            pl.BlockSpec((h, t_pad), lambda bi, hi: (bi % b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, t_pad), lambda bi, hi: (bi % b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s, dh), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gb, h, s, dh), qt.dtype),
        interpret=interpret,
    )(qt, kst, vst, ktt, vtt, bias, kscale, vscale)


def _xla_attention(qt, kst, vst, ktt, vtt, bias, kscale, vscale,
                   *, sm_scale: float) -> jnp.ndarray:
    """XLA einsum twin of `_kernel` on the same transposed layout — used as
    the differentiable reference for the custom VJP (the backward pass
    recomputes through this, i.e. rematerialized attention grads).
    kscale/vscale: (B*H, T) f32 — the kernels' layout."""
    gb, h, s, dh = qt.shape
    b = ktt.shape[0]
    g = gb // b
    t_pad = ktt.shape[2]
    kscale = kscale.reshape(b, h, t_pad)
    vscale = vscale.reshape(b, h, t_pad)
    qg = qt.reshape(g, b, h, s, dh)
    ktc = ktt.astype(qt.dtype)   # int8 static KV casts here (exact)
    vtc = vtt.astype(qt.dtype)
    ls = jnp.einsum("gbhsd,gbhtd->gbhst", qg, kst.reshape(g, b, h, s, dh),
                    preferred_element_type=jnp.float32) * sm_scale
    lt = jnp.einsum("gbhsd,bhtd->gbhst", qg, ktc,
                    preferred_element_type=jnp.float32) * sm_scale
    lt = (lt * kscale[None, :, :, None, :]
          + bias.reshape(g, b, 1, 1, -1))
    m = jnp.maximum(jnp.max(ls, axis=-1, keepdims=True),
                    jnp.max(lt, axis=-1, keepdims=True))
    e_self = jnp.exp(ls - m)
    e_st = jnp.exp(lt - m)
    denom = (jnp.sum(e_self, axis=-1, keepdims=True)
             + jnp.sum(e_st, axis=-1, keepdims=True))
    acc = jnp.einsum("gbhst,gbhtd->gbhsd", e_self.astype(vst.dtype),
                     vst.reshape(g, b, h, s, dh),
                     preferred_element_type=jnp.float32)
    acc = acc + jnp.einsum(
        "gbhst,bhtd->gbhsd",
        (e_st * vscale[None, :, :, None, :]).astype(vtc.dtype), vtc,
        preferred_element_type=jnp.float32)
    return (acc / denom).astype(qt.dtype).reshape(gb, h, s, dh)


@functools.lru_cache(maxsize=None)
def _fused_fn(sm_scale: float, interpret: bool,
              flash_blocks: Optional[tuple] = None):
    """custom_vjp wrapper: Pallas forward (whole-row, or flash when
    `flash_blocks=(block_q, block_kv)`), XLA-recompute backward.  Without
    this, differentiating through the kernel raises (pallas_call has no
    reverse-mode rule) — e.g. training on a single chip where the auto
    dispatch picks the fused path."""

    @jax.custom_vjp
    def fused(qt, kst, vst, ktt, vtt, bias, kscale, vscale):
        if flash_blocks is not None:
            return _pallas_attention_flash(
                qt, kst, vst, ktt, vtt, bias, kscale, vscale,
                sm_scale=sm_scale,
                block_q=flash_blocks[0], block_t=flash_blocks[1],
                interpret=interpret)
        return _pallas_attention(qt, kst, vst, ktt, vtt, bias, kscale,
                                 vscale, sm_scale=sm_scale,
                                 interpret=interpret)

    def fwd(qt, kst, vst, ktt, vtt, bias, kscale, vscale):
        out = fused(qt, kst, vst, ktt, vtt, bias, kscale, vscale)
        return out, (qt, kst, vst, ktt, vtt, bias, kscale, vscale)

    def bwd(res, ct):
        _, vjp = jax.vjp(
            functools.partial(_xla_attention, sm_scale=sm_scale), *res)
        return vjp(ct)

    fused.defvjp(fwd, bwd)
    return fused


def fused_joint_attention(
    q: jnp.ndarray,        # (GB, S, H, Dh) — rope/norm already applied
    k_self: jnp.ndarray,   # (GB, S, H, Dh)
    v_self: jnp.ndarray,   # (GB, S, H, Dh)
    k_static: jnp.ndarray,  # (B, T, H, Dh) — text ++ speaker (++ latent)
    v_static: jnp.ndarray,  # (B, T, H, Dh)
    static_mask: jnp.ndarray,  # (GB, T) bool, True = attend
    col_scale: Optional[jnp.ndarray] = None,  # (T,) f32 K/V column scale
    *,
    sm_scale: float,
    interpret: bool = False,
    flash: Optional[bool] = None,          # None = auto by VMEM fit
    block_q: int = FLASH_BLOCK_Q,
    block_kv: int = FLASH_BLOCK_KV,
    kv_scales: Optional[tuple] = None,  # ((B,T,H), (B,T,H)) f32 — int8
                                        # static-KV dequant scales
                                        # (ops/quant.quantize_kv_int8)
) -> jnp.ndarray:
    gb, s, h, dh = q.shape
    b, t, _, _ = k_static.shape

    if flash is None:
        flash = not fits_vmem(s, t, dh)
        if flash and not fits_vmem_flash(s, t, dh, gb,
                                         block_q=block_q,
                                         block_kv=block_kv):
            # Neither variant fits: the whole-row (S, T) logits blow VMEM
            # and the flash kernel's un-tiled fp32 (GB, T) bias does too
            # (very large batch x very long static KV).  Auto dispatch in
            # models/dit.py:_select_attention_impl never routes such shapes
            # here; a forced attention_impl='pallas' could, and silently
            # compiling an over-budget kernel is worse than refusing.
            raise ValueError(
                f"joint-attention shape S={s}, T={t}, GB={gb} fits neither "
                "the whole-row nor the flash Pallas kernel's VMEM budget; "
                "use attention_impl='xla' for this shape")
    if flash:
        # keep tiles within the actual extents for small (test) shapes
        block_q = min(block_q, _round_up(s, 8))
        block_kv = min(block_kv, _round_up(max(s, t, LANE), LANE))

    if col_scale is None:
        col_scale = jnp.ones((t,), jnp.float32)
    # Per-(batch, head, column) K/V scales: the shared col_scale
    # (speaker-KV boost) times the optional int8 dequant scales.  K·s
    # folds into the logits, V·s into the softmax weights — so int8 KV
    # rides the kernel with no dequantized copy in HBM.
    base = jnp.broadcast_to(col_scale.astype(jnp.float32)[None, None, :],
                            (b, h, t))
    if kv_scales is not None:
        ks, vs = kv_scales  # (B, T, H) from quantize_kv_int8
        kscale = base * ks.astype(jnp.float32).transpose(0, 2, 1)
        vscale = base * vs.astype(jnp.float32).transpose(0, 2, 1)
    else:
        kscale = vscale = base
    # (B*H, T): 2-D like bias, so the kernels' dynamic sublane row pick
    # lowers (Mosaic has no rank-3 scalar-lead dynamic load)
    kscale = kscale.reshape(b * h, t)
    vscale = vscale.reshape(b * h, t)
    t_pad = _round_up(max(t, LANE), LANE)
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        k_static = jnp.pad(k_static, pad)
        v_static = jnp.pad(v_static, pad)
        static_mask = jnp.pad(static_mask, [(0, 0), (0, t_pad - t)])
        spad = [(0, 0), (0, t_pad - t)]
        kscale = jnp.pad(kscale, spad)
        vscale = jnp.pad(vscale, spad)
    # MASK_VALUE (not -inf) so the flash online softmax stays NaN-free for
    # fully-masked tiles; exp underflows to exactly 0 either way.
    bias = jnp.where(static_mask, 0.0, MASK_VALUE).astype(jnp.float32)

    # Arrays come in (batch, seq, H, Dh); transpose to (batch, H, seq, Dh)
    # so the (seq, Dh) tile is contiguous in the minor dims.
    qt = q.transpose(0, 2, 1, 3)
    kst = k_self.transpose(0, 2, 1, 3)
    vst = v_self.transpose(0, 2, 1, 3)
    ktt = k_static.transpose(0, 2, 1, 3)
    vtt = v_static.transpose(0, 2, 1, 3)

    out = _fused_fn(sm_scale, interpret,
                    (block_q, block_kv) if flash else None)(
        qt, kst, vst, ktt, vtt, bias, kscale, vscale)

    return out.transpose(0, 2, 1, 3)  # back to (GB, S, H, Dh)


def shardable(mesh, kv_batch: int, num_heads: int,
              data_axis: str, model_axis: str) -> bool:
    """shard_map needs even per-shard blocks: batch divisible by the data
    axis, heads by the model axis."""
    dp = mesh.shape.get(data_axis, 1)
    tp = mesh.shape.get(model_axis, 1)
    return kv_batch % dp == 0 and num_heads % tp == 0


def fused_joint_attention_sharded(
    q: jnp.ndarray,        # (GB, S, H, Dh)
    k_self: jnp.ndarray,
    v_self: jnp.ndarray,
    k_static: jnp.ndarray,   # (B, T, H, Dh)
    v_static: jnp.ndarray,
    static_mask: jnp.ndarray,  # (GB, T) bool
    col_scale: Optional[jnp.ndarray] = None,  # (T,) f32
    *,
    sm_scale: float,
    mesh,
    data_axis: str = "data",
    model_axis: str = "model",
    interpret: bool = False,
    kv_scales: Optional[tuple] = None,  # ((B,T,H), (B,T,H)) f32
) -> jnp.ndarray:
    """Run the fused kernel per mesh shard via shard_map: batch shards over
    `data`, heads over `model`; the kernel itself is embarrassingly parallel
    over its (batch, head) grid, so no cross-shard collectives are needed.

    The (G*B) query batch is un-flattened to a replicated G axis so that
    sharding B over `data` keeps all G guidance branches of a given batch
    row on the same shard (the flat G-major GB axis would split branches,
    breaking the kernel's b %% B static-KV broadcast).
    """
    from jax.sharding import PartitionSpec as P

    gb, s, h, dh = q.shape
    b, t = k_static.shape[:2]
    g = gb // b
    if col_scale is None:
        col_scale = jnp.ones((t,), jnp.float32)
    # int8-KV dequant scales shard exactly like the KV they describe
    ks, vs = (kv_scales if kv_scales is not None
              else (jnp.ones((b, t, h), jnp.float32),) * 2)

    qspec = P(None, data_axis, None, model_axis, None)
    kvspec = P(data_axis, None, model_axis, None)
    mspec = P(None, data_axis, None)
    sspec = P(data_axis, None, model_axis)

    def local(qg, ksg, vsg, kst, vst, mg, cs, ksc, vsc):
        g_, b_, s_, h_, dh_ = qg.shape
        out = fused_joint_attention(
            qg.reshape(g_ * b_, s_, h_, dh_),
            ksg.reshape(g_ * b_, s_, h_, dh_),
            vsg.reshape(g_ * b_, s_, h_, dh_),
            kst, vst, mg.reshape(g_ * b_, -1), cs,
            sm_scale=sm_scale, interpret=interpret,
            kv_scales=(ksc, vsc))
        return out.reshape(g_, b_, s_, h_, dh_)

    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(qspec, qspec, qspec, kvspec, kvspec, mspec, P(None),
                  sspec, sspec),
        out_specs=qspec,
        # pallas_call's out_shape carries no varying-mesh-axes (vma) info;
        # the body is per-shard pure (no collectives), so skip the check.
        check_vma=False,
    )(q.reshape(g, b, s, h, dh), k_self.reshape(g, b, s, h, dh),
      v_self.reshape(g, b, s, h, dh), k_static, v_static,
      static_mask.reshape(g, b, t), col_scale, ks, vs)
    return out.reshape(gb, s, h, dh)
