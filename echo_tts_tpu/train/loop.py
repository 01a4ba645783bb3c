"""Minimal training loop around the sharded flow-matching step.

The reference is inference-only; this loop makes the training side of the
framework usable end-to-end: batches from any iterator of host arrays,
mesh-sharded updates, periodic orbax checkpoints of params, and stage
timing.  Data preparation (audio -> DAC-PCA latents) is the codec encode
path this framework already has (pipeline.ae_encode); assemble batches as

    {"latents": (B, S, 80) f32, "text_ids": (B, T) i32,
     "text_mask": (B, T) bool, "speaker_latent": (B, Sp, 80) f32,
     "speaker_mask": (B, Sp) bool, "latent_mask": (B, S) bool optional}
"""
from __future__ import annotations

import logging
import os
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import EchoDiTConfig
from ..utils.profiling import StageTimer
from .step import TrainState, create_train_state, make_optimizer, make_train_step

log = logging.getLogger("echo_tts_tpu.train")


def save_params(path: str, params: dict, step: int) -> None:
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(os.path.abspath(path), f"step_{step:08d}"),
              params)


def train(
    cfg: EchoDiTConfig,
    params: dict,
    batches: Iterable[dict],
    mesh: Mesh,
    *,
    num_steps: int,
    lr: float = 1e-4,
    weight_decay: float = 0.01,
    warmup_steps: int = 0,
    cosine_decay: bool = False,
    ema_decay: Optional[float] = None,
    dtype=jnp.bfloat16,
    rng: Optional[jax.Array] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1000,
    log_every: int = 50,
    on_step: Optional[Callable[[int, float], None]] = None,
    remat: str = "attn",
) -> TrainState:
    """Run `num_steps` updates; returns the final TrainState.

    cosine_decay=True uses linear warmup (warmup_steps) + cosine decay
    over num_steps; ema_decay (e.g. 0.999) maintains EMA weights — the
    weights diffusion models ship — checkpointed alongside params.
    remat: 'attn' (default; measured fastest at the single-chip HBM-max
    batch) — see flow_matching_loss for the full mode list."""
    tx = make_optimizer(lr=lr, weight_decay=weight_decay,
                        warmup_steps=warmup_steps,
                        total_steps=num_steps if cosine_decay else 0)
    state = create_train_state(params, tx, mesh, cfg.blockwise,
                               ema=ema_decay is not None)
    step_fn, place_batch = make_train_step(
        cfg, tx, mesh, dtype=dtype,
        ema_decay=ema_decay if ema_decay is not None else 0.999,
        remat=remat)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    timer = StageTimer()
    it = iter(batches)
    t0 = time.time()
    for i in range(num_steps):
        with timer.stage("data"):
            try:
                batch = place_batch(next(it))
            except StopIteration:
                raise ValueError(
                    f"batches exhausted after {i} of {num_steps} steps — "
                    "pass an infinite iterator (e.g. itertools.cycle) or "
                    "lower num_steps") from None
        rng, step_rng = jax.random.split(rng)
        with timer.stage("step"):
            state, loss = step_fn(state, batch, step_rng)
        if on_step is not None:
            on_step(i, float(loss))
        if (i + 1) % log_every == 0:
            log.info("step %d loss %.4f (%.2f steps/s)", i + 1, float(loss),
                     (i + 1) / (time.time() - t0))
        if checkpoint_dir and (i + 1) % checkpoint_every == 0:
            with timer.stage("checkpoint"):
                tree = (state.params if state.ema is None
                        else {"params": state.params, "ema": state.ema})
                save_params(checkpoint_dir, tree, int(state.step))
    log.info("training done: %s", timer.report())
    return state
