"""Euler flow-matching sampler with independent text/speaker CFG.

Re-implements the reference sampler semantics
(reference: inference.py:427-517) as a single jitted program:

  * The t-schedule, the CFG gating window, the speaker-KV scale crossing and
    the temporal-rescale coefficients are all functions of static Python
    floats, so they are resolved AT TRACE TIME: steps are partitioned into
    contiguous segments (CFG on / off), each segment is one `lax.scan`, and
    per-step scalars (dt, rescale coeffs, speaker scale) ride in as scan xs.
    Non-CFG steps therefore run a batch-B forward instead of batch-3B —
    matching the reference's dynamic `has_cfg` branch (inference.py:484-504)
    with zero recompilation.
  * CFG guidance branches are folded into the leading q-batch (G=3) while
    the KV caches stay at batch B (see models/dit.py); the reference instead
    concatenates the caches 3x (inference.py:471-472).
  * The speaker-KV scale schedule reproduces the reference's in-place
    scale/unscale-at-crossing behavior (inference.py:467-468, 511-513)
    as a per-step multiplicative factor.
  * Initial noise can be injected (torch-RNG parity tests) or drawn from a
    JAX PRNG key (production).
"""
from __future__ import annotations

import functools
import itertools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EchoDiTConfig
from ..models import dit


class StepPlan(NamedTuple):
    """Static per-step schedule, resolved at trace time."""
    t: np.ndarray            # (N,) f32 — current t per step
    dt: np.ndarray           # (N,) f32 — (t_next - t)
    has_cfg: np.ndarray      # (N,) bool
    speaker_scale: np.ndarray  # (N,) f32 — functional KV scale per step
    rescale_c1: np.ndarray   # (N,) f32 — v' = c1 * v + c2 * x
    rescale_c2: np.ndarray   # (N,) f32


INIT_SCALE = 0.999  # so rescale applies at step 0 (inference.py:452)


def build_step_plan(
    num_steps: int,
    cfg_min_t: float,
    cfg_max_t: float,
    rescale_k: Optional[float],
    rescale_sigma: Optional[float],
    speaker_kv_scale: Optional[float],
    speaker_kv_min_t: Optional[float],
) -> StepPlan:
    """Mirror the reference's per-step host logic in float32
    (inference.py:459, 481-515)."""
    t_sched = (np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float32)
               * np.float32(INIT_SCALE)).astype(np.float32)
    t = t_sched[:-1]
    t_next = t_sched[1:]
    dt = (t_next - t).astype(np.float32)

    has_cfg = (t >= np.float32(cfg_min_t)) & (t <= np.float32(cfg_max_t))

    # speaker-KV scale: applied up-front, un-applied after the step where
    # t crosses below speaker_kv_min_t (inference.py:467-468, 511-513).
    scales = np.ones(num_steps, dtype=np.float32)
    if speaker_kv_scale is not None:
        state = np.float32(speaker_kv_scale)
        min_t = np.float32(speaker_kv_min_t)
        for i in range(num_steps):
            scales[i] = state
            if t_next[i] < min_t and t[i] >= min_t:
                state = np.float32(1.0)

    # temporal score rescale (arXiv 2510.01184; inference.py:416-424):
    #   v' = 1/(1-t) * (ratio * ((1-t) v + x) - x) = ratio*v + (ratio-1)/(1-t)*x
    c1 = np.ones(num_steps, dtype=np.float32)
    c2 = np.zeros(num_steps, dtype=np.float32)
    if rescale_k is not None and rescale_sigma is not None:
        k = np.float32(rescale_k)
        sig = np.float32(rescale_sigma)
        for i in range(num_steps):
            ti = t[i]
            if ti < 1.0:
                snr = (1 - ti) ** 2 / (ti ** 2)
                ratio = (snr * sig ** 2 + 1) / (snr * sig ** 2 / k + 1)
                c1[i] = ratio
                c2[i] = (ratio - 1) / (1 - ti)

    return StepPlan(t=t, dt=dt, has_cfg=has_cfg, speaker_scale=scales,
                    rescale_c1=c1.astype(np.float32),
                    rescale_c2=c2.astype(np.float32))


def _segments(has_cfg: np.ndarray) -> List[Tuple[bool, int, int]]:
    """Contiguous (cfg?, start, stop) runs of the step index."""
    out = []
    i = 0
    for flag, grp in itertools.groupby(has_cfg.tolist()):
        n = len(list(grp))
        out.append((bool(flag), i, i + n))
        i += n
    return out


def make_cfg_branch_masks(cfg: EchoDiTConfig, text_mask, speaker_mask,
                          latent_mask=None):
    """Static key masks for the batch-B (cond-only) and batch-3B CFG
    forward, over the concatenated static KV.  CFG branch order is
    [cond, uncond_text, uncond_speaker] (inference.py:474-475): uncond_text
    zeroes the text columns, uncond_speaker the speaker columns."""
    zero_t = jnp.zeros_like(text_mask)
    zero_s = jnp.zeros_like(speaker_mask)
    full_text = jnp.concatenate([text_mask, zero_t, text_mask], axis=0)
    full_spk = jnp.concatenate([speaker_mask, speaker_mask, zero_s], axis=0)
    lat3 = (None if latent_mask is None
            else jnp.concatenate([latent_mask] * 3, axis=0))
    mask_plain = dit.static_attention_mask(
        cfg, text_mask, speaker_mask, latent_mask)
    mask_cfg = dit.static_attention_mask(cfg, full_text, full_spk, lat3)
    return mask_cfg, mask_plain


def run_step_segments(
    params: dict,
    cfg: EchoDiTConfig,
    x_t: jnp.ndarray,
    plan: StepPlan,
    kv_static: Tuple[jnp.ndarray, jnp.ndarray],
    spk_cols: jnp.ndarray,
    mask_cfg: jnp.ndarray,
    mask_plain: jnp.ndarray,
    *,
    cfg_scale_text: float,
    cfg_scale_speaker: float,
    speaker_kv_max_layers: Optional[int],
    dtype,
    start_pos=0,
    max_pos: Optional[int] = None,
    mesh=None,
) -> jnp.ndarray:
    """The Euler hot loop shared by the flat and blockwise samplers: one
    lax.scan per contiguous CFG-on/off segment of the step plan, over the
    pre-concatenated static KV (reference loop: inference.py:481-515 /
    inference_blockwise.py:80-118)."""
    batch_size = x_t.shape[0]
    segments = _segments(plan.has_cfg)
    max_layers = (cfg.num_layers if speaker_kv_max_layers is None
                  else min(speaker_kv_max_layers, cfg.num_layers))
    layer_gate = (jnp.arange(cfg.num_layers) < max_layers)
    s_text = np.float32(cfg_scale_text)
    s_spk = np.float32(cfg_scale_speaker)

    def step_scales(spk_scale):
        return jnp.where(layer_gate, spk_scale, 1.0).astype(jnp.float32)

    def cfg_step(x, step):
        x3 = jnp.concatenate([x, x, x], axis=0).astype(dtype)
        t3 = jnp.full((3 * batch_size,), step["t"],
                      dtype=jnp.float32).astype(dtype)
        v = dit.dit_forward_static(
            params, cfg, x3, t3, kv_static, spk_cols, mask_cfg,
            start_pos=start_pos, max_pos=max_pos, mesh=mesh,
            speaker_scale_by_layer=step_scales(step["spk"]))
        v_c, v_ut, v_us = jnp.split(v, 3, axis=0)
        v = v_c + s_text * (v_c - v_ut) + s_spk * (v_c - v_us)
        v = step["c1"] * v + step["c2"] * x
        return x + v * step["dt"], None

    def plain_step(x, step):
        t1 = jnp.full((batch_size,), step["t"],
                      dtype=jnp.float32).astype(dtype)
        v = dit.dit_forward_static(
            params, cfg, x.astype(dtype), t1, kv_static, spk_cols,
            mask_plain, start_pos=start_pos, max_pos=max_pos, mesh=mesh,
            speaker_scale_by_layer=step_scales(step["spk"]))
        v = step["c1"] * v + step["c2"] * x
        return x + v * step["dt"], None

    for is_cfg, start, stop in segments:
        xs = {
            "t": jnp.asarray(plan.t[start:stop]),
            "dt": jnp.asarray(plan.dt[start:stop]),
            "spk": jnp.asarray(plan.speaker_scale[start:stop]),
            "c1": jnp.asarray(plan.rescale_c1[start:stop]),
            "c2": jnp.asarray(plan.rescale_c2[start:stop]),
        }
        x_t, _ = jax.lax.scan(cfg_step if is_cfg else plain_step, x_t, xs)
    return x_t


@functools.lru_cache(maxsize=64)
def _euler_core(
    cfg: EchoDiTConfig,
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
    mesh=None,
    kv_quant: bool = False,
):
    """Build the jitted sampler core for one static configuration.

    Cached so direct (un-jitted) callers — the serving handler, the demo,
    the batcher — compile once per configuration/shape instead of
    re-tracing the 24-layer scan on every request.

    kv_quant=True stores the prefilled static KV int8 (ops/quant.py:
    quantize_kv_int8): halves its HBM footprint and per-step read
    bandwidth; the dequant scales fold into the attention column scales.
    Opt-in NON-PARITY (per-token rounding error), measured in
    docs/PERFORMANCE.md §13."""
    plan = build_step_plan(num_steps, cfg_min_t, cfg_max_t, rescale_k,
                           rescale_sigma, speaker_kv_scale, speaker_kv_min_t)

    @jax.jit
    def run(params, speaker_latent, speaker_mask, text_input_ids,
            text_mask, initial_noise):
        x_t = initial_noise.astype(jnp.float32)
        if truncation_factor is not None:
            x_t = x_t * np.float32(truncation_factor)

        # One-time prefill (reference: inference.py:464-465); encoders run
        # in model dtype.  The static KV segments are concatenated ONCE
        # here, outside the step scans.
        kv_text = dit.get_kv_cache_text(
            params, cfg, text_input_ids, text_mask)
        kv_speaker = dit.get_kv_cache_speaker(
            params, cfg, speaker_latent.astype(dtype))
        kv_static, spk_cols = dit.concat_static_kv(cfg, kv_text, kv_speaker)
        if kv_quant:
            from ..ops.quant import quantize_kv_int8
            kv_static = quantize_kv_int8(*kv_static)
        mask_cfg, mask_plain = make_cfg_branch_masks(
            cfg, text_mask, speaker_mask)

        return run_step_segments(
            params, cfg, x_t, plan, kv_static, spk_cols, mask_cfg,
            mask_plain, cfg_scale_text=cfg_scale_text,
            cfg_scale_speaker=cfg_scale_speaker,
            speaker_kv_max_layers=speaker_kv_max_layers, dtype=dtype,
            mesh=mesh)

    return run


def sample_euler_cfg_independent_guidances(
    params: dict,
    cfg: EchoDiTConfig,
    speaker_latent: jnp.ndarray,
    speaker_mask: jnp.ndarray,
    text_input_ids: jnp.ndarray,
    text_mask: jnp.ndarray,
    *,
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
    sequence_length: int = 640,
    dtype=jnp.bfloat16,
    initial_noise: Optional[jnp.ndarray] = None,
    rng_key: Optional[jax.Array] = None,
    mesh=None,
    kv_quant: bool = False,
) -> jnp.ndarray:
    """Returns latents (B, sequence_length, latent_size) float32.

    Exactly one of `initial_noise` (f32, matching the reference's fp32 x_t,
    inference.py:477) or `rng_key` must be provided.  Pass `mesh` when the
    params/inputs were placed on a (data, model) mesh
    (parallel/inference.py) so the fused attention stays per-shard Pallas
    instead of falling back to XLA einsums.  kv_quant=True stores the
    prefilled static KV int8 (opt-in NON-PARITY; see _euler_core).
    """
    batch_size = text_input_ids.shape[0]
    if initial_noise is None:
        if rng_key is None:
            raise ValueError("provide initial_noise or rng_key")
        initial_noise = jax.random.normal(
            rng_key, (batch_size, sequence_length, cfg.latent_size),
            dtype=jnp.float32)

    core = _euler_core(
        cfg, num_steps, float(cfg_scale_text), float(cfg_scale_speaker),
        float(cfg_min_t), float(cfg_max_t),
        None if truncation_factor is None else float(truncation_factor),
        None if rescale_k is None else float(rescale_k),
        None if rescale_sigma is None else float(rescale_sigma),
        None if speaker_kv_scale is None else float(speaker_kv_scale),
        speaker_kv_max_layers,
        None if speaker_kv_min_t is None else float(speaker_kv_min_t),
        jnp.dtype(dtype),  # np.dtype: hashable cache key, valid for astype
        mesh,              # jax.sharding.Mesh is hashable
        bool(kv_quant))
    return core(params, speaker_latent, speaker_mask, text_input_ids,
                text_mask, initial_noise)
