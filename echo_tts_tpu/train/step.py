"""Sharded flow-matching training step for EchoDiT.

The reference is inference-only (SURVEY.md §4: no training code anywhere);
this module adds the training counterpart the TPU framework needs to be
self-hosting: a rectified-flow (v-prediction) objective consistent with the
Euler sampler's integration convention (sampler/euler.py: x_{t'} = x + v·dt
with t: 1 → 0, x(1) = noise), optimized with AdamW, jitted over a
(data, model) `jax.sharding.Mesh` with Megatron-style tensor parallelism
(parallel/mesh.py) and data-parallel batch sharding.

Convention: x_t = t·ε + (1−t)·x₀, so the sampler-consistent velocity target
is  v* = dx/dt = ε − x₀  (noise minus data).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EchoDiTConfig
from ..models import dit
from ..parallel import mesh as pmesh


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray
    # Exponential moving average of params — the weights diffusion models
    # actually ship (the published EchoDiT checkpoint is itself an EMA);
    # None when disabled.
    ema: dict = None


def flow_matching_loss(
    params: dict,
    cfg: EchoDiTConfig,
    batch: dict,
    rng: jax.Array,
    dtype=jnp.bfloat16,
    remat="attn",
) -> jnp.ndarray:
    """MSE between predicted and target velocity.

    remat: "attn" (default — save each layer's attention OUTPUT so the
    backward never re-runs attention; wins tokens/s at the single-chip
    HBM-max batch B=3: 349.3 ms vs full's 354.9), "full" (minimum
    memory — every layer re-forwards in the backward pass), "dots"
    (save batch-free matmul outputs) / "dots_all" (also the batched
    attention einsums — the fastest at B=2, i.e. when dp-sharding makes
    the per-device batch small, but OOMs at B=3), or "none" (no remat —
    save everything; OOMs at B=2 full size).  The on-chip sweep across
    these at each policy's HBM-max batch lives in
    examples/bench_train_step.py --sweep; docs/PERFORMANCE.md §12.

    batch = {
      'latents':        (B, S, 80) f32 clean DAC-PCA latents,
      'text_ids':       (B, T) i32,
      'text_mask':      (B, T) bool,
      'speaker_latent': (B, Sp, 80) f32,
      'speaker_mask':   (B, Sp) bool,
      'latent_mask':    (B, S) bool, optional — valid target positions;
                        without it zero-padded window tails would be
                        trained as real "silence" latents,
    }
    """
    x0 = batch["latents"].astype(jnp.float32)
    b = x0.shape[0]
    k_t, k_eps = jax.random.split(rng)
    t = jax.random.uniform(k_t, (b,), dtype=jnp.float32)
    eps = jax.random.normal(k_eps, x0.shape, dtype=jnp.float32)
    x_t = t[:, None, None] * eps + (1.0 - t[:, None, None]) * x0
    v_target = eps - x0

    kv_text = dit.get_kv_cache_text(
        params, cfg, batch["text_ids"], batch["text_mask"])
    kv_speaker = dit.get_kv_cache_speaker(
        params, cfg, batch["speaker_latent"].astype(dtype))
    if remat not in ("full", "dots", "dots_all", "attn", "none"):
        raise ValueError(f"remat={remat!r}: expected 'full', 'dots', "
                         "'dots_all', 'attn' or 'none'")
    v_pred = dit.dit_forward(
        params, cfg, x_t.astype(dtype), t.astype(dtype),
        batch["text_mask"], batch["speaker_mask"], kv_text, kv_speaker,
        remat=(False if remat == "none"
               else True if remat == "full" else remat))
    sq = jnp.square(v_pred - v_target)
    mask = batch.get("latent_mask")
    if mask is None:
        return jnp.mean(sq)
    m = mask.astype(jnp.float32)[:, :, None]
    return jnp.sum(sq * m) / jnp.maximum(
        jnp.sum(m) * x0.shape[-1], 1.0)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   grad_clip: float = 1.0,
                   warmup_steps: int = 0,
                   total_steps: int = 0,
                   end_lr_ratio: float = 0.1
                   ) -> optax.GradientTransformation:
    """AdamW with global-norm clipping; pass warmup_steps/total_steps for
    the standard linear-warmup + cosine-decay schedule (to
    lr * end_lr_ratio), else the learning rate is constant."""
    if warmup_steps and not total_steps:
        raise ValueError(
            "warmup_steps requires total_steps (the cosine-decay horizon);"
            " without it the warmup would be silently ignored")
    if total_steps:
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
            decay_steps=total_steps, end_value=lr * end_lr_ratio)
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=0.9, b2=0.95, weight_decay=weight_decay),
    )


def create_train_state(params: dict, tx: optax.GradientTransformation,
                       mesh: Mesh, blockwise: bool = True,
                       ema: bool = False) -> TrainState:
    """Place params on the mesh with TP shardings, then init AdamW moments —
    `zeros_like` on sharded params yields identically-sharded moments.
    ema=True starts an EMA copy at the initial params (same shardings)."""
    params = pmesh.shard_params(params, mesh, blockwise)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32),
                      ema=jax.tree.map(jnp.copy, params) if ema else None)


def make_train_step(cfg: EchoDiTConfig, tx: optax.GradientTransformation,
                    mesh: Mesh, dtype=jnp.bfloat16,
                    ema_decay: float = 0.999, remat: str = "attn"):
    """Build the jitted sharded train step.

    Parameters and Adam moments carry TP shardings (from create_train_state),
    the batch is data-parallel over the mesh's `data` axis; GSPMD inserts the
    gradient all-reduce over `data` and the per-layer TP collectives over
    `model`.  `remat` forwards to flow_matching_loss — pick "dots_all"
    when the per-device batch is small (docs/PERFORMANCE.md §12).
    """
    batch_sh = {
        "latents": NamedSharding(mesh, P(pmesh.DATA_AXIS, None, None)),
        "text_ids": NamedSharding(mesh, P(pmesh.DATA_AXIS, None)),
        "text_mask": NamedSharding(mesh, P(pmesh.DATA_AXIS, None)),
        "speaker_latent": NamedSharding(mesh, P(pmesh.DATA_AXIS, None, None)),
        "speaker_mask": NamedSharding(mesh, P(pmesh.DATA_AXIS, None)),
        "latent_mask": NamedSharding(mesh, P(pmesh.DATA_AXIS, None)),
    }

    @jax.jit
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        loss, grads = jax.value_and_grad(flow_matching_loss)(
            state.params, cfg, batch, rng, dtype, remat)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema
        if new_ema is not None:
            d = jnp.asarray(ema_decay, jnp.float32)
            new_ema = jax.tree.map(
                lambda e, p: (d * e.astype(jnp.float32)
                              + (1.0 - d) * p.astype(jnp.float32)
                              ).astype(e.dtype),
                new_ema, new_params)
        return TrainState(new_params, new_opt, state.step + 1,
                          new_ema), loss

    def place_batch(batch: dict) -> dict:
        return {k: jax.device_put(v, batch_sh[k]) for k, v in batch.items()}

    return train_step, place_batch
