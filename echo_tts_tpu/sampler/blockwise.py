"""Blockwise (streaming) Euler sampler with latent-prefix conditioning.

Re-implements the reference streaming sampler
(reference: inference_blockwise.py:14-123):

  * fixed block sizes (XLA-friendly static shapes); the FULL prefix buffer
    (zeros for not-yet-generated blocks) is re-encoded through the causal
    latent encoder every block, exactly like the reference
    (inference_blockwise.py:72-73) — causality + the position-gated latent
    mask (model.py:243-244) make the zero-region irrelevant, and the encode
    shape stays constant across blocks.
  * the speaker-KV scale is re-applied at each block start and un-applied at
    the t-crossing within the block (inference_blockwise.py:68-70, 114-116);
    with the functional per-step scale schedule this falls out of simply
    rebuilding the same StepPlan per block.
  * `continuation_latent` (generation resume) is prepended and sets the
    starting position (inference_blockwise.py:62-65).  Its length plus
    sum(block_sizes) must be divisible by the speaker patch size.
  * per-block initial noise is either injected (list, torch parity) or drawn
    from a fold of `rng_key` (production; the torch reference draws blocks
    sequentially from one generator, which JAX reproduces via injection).

Each distinct (config, total_len, block_size) block program is a cached
jitted core with the block's START POSITION as a traced operand (RoPE
offsets are dynamic-sliced, the latent-prefix mask is computed in-graph),
so a stream of N same-size blocks compiles ONE program, not N.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EchoDiTConfig
from ..models import dit
from .euler import build_step_plan, make_cfg_branch_masks, run_step_segments


@functools.lru_cache(maxsize=8)
def _prefill_core(cfg: EchoDiTConfig, dtype):
    @jax.jit
    def run(params, text_input_ids, text_mask, speaker_latent):
        kv_text = dit.get_kv_cache_text(params, cfg, text_input_ids,
                                        text_mask)
        kv_speaker = dit.get_kv_cache_speaker(
            params, cfg, speaker_latent.astype(dtype))
        return kv_text, kv_speaker
    return run


@functools.lru_cache(maxsize=64)
def _latent_inc_core(cfg: EchoDiTConfig, dtype):
    """Jitted incremental latent-prefix append (dit.latent_kv_append_block)
    — jax.jit re-specializes per (state, block) shape, so one cache entry
    serves every block size of a stream.  The state buffers are DONATED:
    each append's dynamic_update_slice then writes in place instead of
    copying the full-size KV buffers (hundreds of MB at long streams)."""
    @functools.partial(jax.jit, donate_argnums=(1,))
    def run(params, state, block):
        return dit.latent_kv_append_block(params, cfg, state,
                                          block.astype(dtype))
    return run


@functools.lru_cache(maxsize=8)
def _prefix_update_core(cfg: EchoDiTConfig):
    """Tiny write-in program (trivial compile, re-specializes per buffer
    shape) so first-block programs don't have to take the prefix buffer
    as an operand — which would key them on the stream total."""
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(prefix, x_t, start_pos):
        return jax.lax.dynamic_update_slice(
            prefix, x_t.astype(prefix.dtype), (0, start_pos, 0))
    return run


@functools.lru_cache(maxsize=256)
def _block_core(
    cfg: EchoDiTConfig,
    total_len: int,
    block_size: int,
    num_steps: int,
    cfg_scale_text: float,
    cfg_scale_speaker: float,
    cfg_min_t: float,
    cfg_max_t: float,
    truncation_factor: Optional[float],
    rescale_k: Optional[float],
    rescale_sigma: Optional[float],
    speaker_kv_scale: Optional[float],
    speaker_kv_max_layers: Optional[int],
    speaker_kv_min_t: Optional[float],
    dtype,
    external_latent_kv: bool = False,
    first_block: bool = False,
):
    """Jitted program for one block of a fixed size; the block's start
    position is a TRACED operand (RoPE offsets dynamic-sliced from the
    total_len table, latent mask computed in-graph), so a stream of N
    same-size blocks compiles ONE program instead of N.

    external_latent_kv=True takes the latent-prefix KV as inputs (the
    incrementally-maintained buffer, dit.latent_kv_append_block) instead
    of re-encoding the full prefix every block.

    first_block=True specializes the stream's first block (no
    continuation): its latent-prefix columns are ALL masked, so the
    program drops the latent segment entirely — no prefix encode and no
    dead KV columns in any of the 40 steps' attention.  Masked columns
    contribute exactly 0 (exp underflow), so this is the same math.
    First-block programs also don't take the prefix buffer (the write-in
    is a separate tiny program, _prefix_update_core) and use
    max_pos=block_size for their RoPE slice (start is always 0, so the
    freqs are identical) — making them INDEPENDENT of the stream total:
    one compiled first-block program per block size serves every
    schedule."""
    plan = build_step_plan(num_steps, cfg_min_t, cfg_max_t, rescale_k,
                           rescale_sigma, speaker_kv_scale,
                           speaker_kv_min_t)

    def _denoise(params, noise, kv_static, spk_cols, mask_cfg, mask_plain,
                 start_pos, max_pos):
        x_t = noise.astype(jnp.float32)
        if truncation_factor is not None:
            x_t = x_t * np.float32(truncation_factor)
        return run_step_segments(
            params, cfg, x_t, plan, kv_static, spk_cols, mask_cfg,
            mask_plain, cfg_scale_text=cfg_scale_text,
            cfg_scale_speaker=cfg_scale_speaker,
            speaker_kv_max_layers=speaker_kv_max_layers, dtype=dtype,
            start_pos=start_pos, max_pos=max_pos)

    if first_block:
        @jax.jit
        def run(params, noise, kv_text, kv_speaker, text_mask,
                speaker_mask):
            kv_static, spk_cols = dit.concat_static_kv(
                cfg, kv_text, kv_speaker)
            mask_cfg, mask_plain = make_cfg_branch_masks(
                cfg, text_mask, speaker_mask)
            return _denoise(params, noise, kv_static, spk_cols, mask_cfg,
                            mask_plain, 0, block_size)
        return run

    @jax.jit
    def run(params, prefix, noise, start_pos, kv_text, kv_speaker,
            text_mask, speaker_mask, *latent_kv):
        batch_size = text_mask.shape[0]
        n_lat = prefix.shape[1] // cfg.speaker_patch_size

        if external_latent_kv:
            kv_latent = (latent_kv[0], latent_kv[1])
        else:
            # Per-block latent-prefix re-encode
            # (inference_blockwise.py:72-74); constant across the
            # block's steps, so it concatenates into the static KV
            # here, outside the step scans.
            kv_latent = dit.get_kv_cache_latent(params, cfg,
                                                prefix.astype(dtype))
        lat_mask = dit.latent_prefix_mask_dynamic(
            batch_size, n_lat, start_pos, cfg.speaker_patch_size)
        kv_static, spk_cols = dit.concat_static_kv(
            cfg, kv_text, kv_speaker, kv_latent)
        mask_cfg, mask_plain = make_cfg_branch_masks(
            cfg, text_mask, speaker_mask, lat_mask)

        x_t = _denoise(params, noise, kv_static, spk_cols, mask_cfg,
                       mask_plain, start_pos, total_len)
        prefix = jax.lax.dynamic_update_slice(
            prefix, x_t, (0, start_pos, 0))
        return x_t, prefix

    return run


def sampler_statics(*, num_steps, cfg_scale_text, cfg_scale_speaker,
                    cfg_min_t, cfg_max_t, truncation_factor=None,
                    rescale_k=None, rescale_sigma=None,
                    speaker_kv_scale=None, speaker_kv_max_layers=None,
                    speaker_kv_min_t=None, dtype) -> tuple:
    """The hashable static-argument tuple _block_core is keyed on — shared
    by the iterator below and the serving layer's fused first-block
    program so the two can never key differently."""
    return (int(num_steps), float(cfg_scale_text), float(cfg_scale_speaker),
            float(cfg_min_t), float(cfg_max_t),
            None if truncation_factor is None else float(truncation_factor),
            None if rescale_k is None else float(rescale_k),
            None if rescale_sigma is None else float(rescale_sigma),
            None if speaker_kv_scale is None else float(speaker_kv_scale),
            speaker_kv_max_layers,
            None if speaker_kv_min_t is None else float(speaker_kv_min_t),
            jnp.dtype(dtype))


def iter_blockwise_euler_cfg_independent_guidances(
    params: dict,
    cfg: EchoDiTConfig,
    speaker_latent: jnp.ndarray,
    speaker_mask: jnp.ndarray,
    text_input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    *,
    block_sizes: Sequence[int],
    num_steps: int,
    cfg_scale_text: float,
    cfg_scale_speaker: float,
    cfg_min_t: float,
    cfg_max_t: float,
    truncation_factor: Optional[float] = None,
    rescale_k: Optional[float] = None,
    rescale_sigma: Optional[float] = None,
    speaker_kv_scale: Optional[float] = None,
    speaker_kv_max_layers: Optional[int] = None,
    speaker_kv_min_t: Optional[float] = None,
    continuation_latent: Optional[jnp.ndarray] = None,
    dtype=jnp.bfloat16,
    initial_noises: Optional[List[jnp.ndarray]] = None,
    rng_key: Optional[jax.Array] = None,
    incremental_latent: bool = False,
    total_len_bucket: Optional[int] = None,
    prefill_kv: Optional[tuple] = None,
    first_block_latents: Optional[jnp.ndarray] = None,
):
    """Generator over blocks: yields (block_start, block_latents, prefix)
    after each block, where prefix is the full running latent buffer —
    the streaming serving layer decodes incrementally from these.

    `prefill_kv` ((kv_text, kv_speaker)) skips the prefill program, and
    `first_block_latents` supplies block 0's already-sampled latents
    (skipping its core call) — together they let the serving layer run
    prefill + first block + first decode as ONE fused program
    (serve/streaming.py: saves the per-dispatch round trips that
    dominate time-to-first-audio on a tunnel/remote host) while this
    iterator carries the rest of the stream identically.

    incremental_latent=True maintains the latent-prefix KV incrementally
    (encode each block once, O(block) instead of the reference's
    O(total) full-buffer re-encode per block — dit.latent_kv_append_block);
    outputs are mathematically identical, pinned in
    tests/test_blockwise_parity.py.

    total_len_bucket pads the prefix buffer to a STATIC bucket length so
    every stream whose total falls in the same bucket shares compiled
    block programs (each distinct total otherwise compiles its own —
    _block_core is keyed on total_len).  The padding columns sit past
    start_pos forever, so the position-gated latent mask excludes them in
    every block: outputs are identical to the unbucketed run (pinned in
    tests/test_blockwise_parity.py).  The stream's FIRST block drops the
    latent segment entirely, so it pays no padding cost at all."""
    batch_size = text_input_ids.shape[0]
    block_sizes = list(block_sizes)

    if initial_noises is None and rng_key is None:
        raise ValueError("provide initial_noises or rng_key")

    total = sum(block_sizes)
    start_pos = 0
    cont_len = (0 if continuation_latent is None
                else continuation_latent.shape[1])
    pad = 0
    if total_len_bucket is not None:
        if total_len_bucket < cont_len + total:
            raise ValueError(
                f"total_len_bucket {total_len_bucket} smaller than "
                f"continuation {cont_len} + sum(block_sizes) {total}")
        if total_len_bucket % cfg.speaker_patch_size != 0:
            raise ValueError(
                f"total_len_bucket {total_len_bucket} must be divisible "
                f"by speaker_patch_size {cfg.speaker_patch_size}")
        pad = total_len_bucket - cont_len - total
    prefix = jnp.zeros((batch_size, total + pad, cfg.latent_size),
                       jnp.float32)
    if continuation_latent is not None:
        start_pos = cont_len
        prefix = jnp.concatenate(
            [continuation_latent.astype(jnp.float32), prefix], axis=1)
    if (cont_len + total) % cfg.speaker_patch_size != 0:
        raise ValueError(
            f"continuation length {start_pos} + sum(block_sizes) {total} must "
            f"be divisible by speaker_patch_size {cfg.speaker_patch_size}")

    dt = jnp.dtype(dtype)
    if prefill_kv is not None:
        kv_text, kv_speaker = prefill_kv
    else:
        kv_text, kv_speaker = _prefill_core(cfg, dt)(
            params, text_input_ids, text_mask, speaker_latent)
    if first_block_latents is not None and (
            continuation_latent is not None):
        raise ValueError(
            "first_block_latents only applies to streams without a "
            "continuation (block 0 must be the latent-free first block)")

    statics = sampler_statics(
        num_steps=num_steps, cfg_scale_text=cfg_scale_text,
        cfg_scale_speaker=cfg_scale_speaker, cfg_min_t=cfg_min_t,
        cfg_max_t=cfg_max_t, truncation_factor=truncation_factor,
        rescale_k=rescale_k, rescale_sigma=rescale_sigma,
        speaker_kv_scale=speaker_kv_scale,
        speaker_kv_max_layers=speaker_kv_max_layers,
        speaker_kv_min_t=speaker_kv_min_t, dtype=dt)

    inc_state = None
    if incremental_latent:
        bad = [b for b in ([start_pos] + block_sizes[:-1])
               if b % cfg.speaker_patch_size != 0]
        if bad:
            # A partial patch would be encoded zeros-padded by the
            # re-encode path but stay zero in the incremental buffer — and
            # its column IS valid under the position-gated mask.  Fail
            # loudly instead of diverging silently.
            raise ValueError(
                "incremental_latent requires the continuation length and "
                "every non-final block size to be divisible by "
                f"speaker_patch_size {cfg.speaker_patch_size}; got {bad}")
        inc_core = _latent_inc_core(cfg, dt)
        inc_state = dit.init_latent_inc_state(
            cfg, batch_size, prefix.shape[1] // cfg.speaker_patch_size, dt)
        if continuation_latent is not None:
            inc_state = inc_core(params, inc_state,
                                 prefix[:, :start_pos])

    for b_idx, block_size in enumerate(block_sizes):
        first = b_idx == 0 and continuation_latent is None
        if first and first_block_latents is not None:
            noise = None  # block already sampled by the caller
        elif initial_noises is not None:
            noise = initial_noises[b_idx]
        else:
            noise = jax.random.normal(
                jax.random.fold_in(rng_key, b_idx),
                (batch_size, block_size, cfg.latent_size), jnp.float32)
        if first:
            if first_block_latents is not None:
                # already sampled inside the serving layer's fused
                # first-block program — just fold it into the buffer
                x_t = first_block_latents
            else:
                # total-independent program: keyed on block_size only
                # (the external_latent_kv flag is irrelevant here — pass
                # False so both iterator modes share one program)
                core = _block_core(cfg, block_size, block_size, *statics,
                                   False, True)
                x_t = core(params, noise, kv_text, kv_speaker,
                           text_mask, speaker_mask)
            prefix = _prefix_update_core(cfg)(prefix, x_t, 0)
        else:
            core = _block_core(cfg, prefix.shape[1], block_size, *statics,
                               incremental_latent, False)
            extra = ((inc_state["lat_k"], inc_state["lat_v"])
                     if incremental_latent else ())
            x_t, prefix = core(params, prefix, noise,
                               jnp.int32(start_pos), kv_text, kv_speaker,
                               text_mask, speaker_mask, *extra)
        yield start_pos, x_t, prefix
        if incremental_latent and b_idx + 1 < len(block_sizes):
            # append the just-generated block's patches for later blocks
            inc_state = inc_core(params, inc_state, x_t)
        start_pos += block_size


def sample_blockwise_euler_cfg_independent_guidances(*args, **kwargs):
    """Non-streaming wrapper: run all blocks, return the final latents
    (B, cont_len + sum(block_sizes), latent) float32
    (reference: inference_blockwise.py:14-123)."""
    prefix = None
    end = 0
    for start, x_t, prefix in iter_blockwise_euler_cfg_independent_guidances(
            *args, **kwargs):
        end = start + x_t.shape[1]
    # drop total_len_bucket padding (zeros past the last generated block)
    return prefix[:, :end]