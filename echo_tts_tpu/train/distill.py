"""Few-step guidance+step distillation — OPT-IN, NON-PARITY.

The headline sampler is compute-closed: the 40-step dual-CFG Euler loop
runs at ~94% MFU (docs/PERFORMANCE.md), so the only remaining headline
lever is running FEWER steps.  That is a model change, not an inference
trick: the reference's parity surface (reference: inference.py:427-517,
40 steps, CFG window t∈[0.5,1]) is untouched by this module.  What this
adds is the TRAINING recipe that makes a few-step mode possible:
progressive/guided distillation (Salimans & Ho 2022; Meng et al. 2023,
see PAPERS.md) of the 40-step CFG teacher into a student that integrates
the SAME trajectory in N_student plain (CFG-free) Euler steps.

  teacher target   one student-grid step [t_i -> t_{i+1}] is integrated
                   by `substeps` teacher Euler steps WITH dual CFG
                   (guidance gated to the window exactly as the sampler
                   gates it); the student's regression target is the
                   average velocity  v* = (x_end - x_t) / dt_student.
  student          same EchoDiT architecture, initialized from the
                   teacher; predicts v*(x_t, t) in ONE forward, no CFG
                   branches — guidance is distilled into the weights.
  sampling         the existing Euler core with CFG disabled:
                   `few_step_sampler_params(N)` yields kwargs whose CFG
                   window is empty, so every step takes the batch-B
                   plain path (sampler/euler.py:run_step_segments).

Serving reaches a distilled model with zero new code: load the student
checkpoint and pass `parameters={"num_steps": N, **few_step_sampler_params
(N)}` per request.  None of the shipped presets
(serve/sampler_presets.json) are touched; this mode must NEVER be a
default — distilled audio is not bit-comparable to the reference.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EchoDiTConfig
from ..models import dit
from ..parallel import mesh as pmesh
from ..sampler.euler import INIT_SCALE, make_cfg_branch_masks
from .step import TrainState, create_train_state


def few_step_sampler_params(num_steps: int = 8) -> dict:
    """Sampler kwargs for a distilled student: N plain Euler steps on the
    same INIT_SCALE-scaled grid the teacher was distilled against, CFG
    window empty (so run_step_segments emits only batch-B plain scans)."""
    return dict(num_steps=num_steps, cfg_scale_text=0.0,
                cfg_scale_speaker=0.0, cfg_min_t=2.0, cfg_max_t=3.0)


def distill_loss(
    student_params: dict,
    teacher_params: dict,
    cfg: EchoDiTConfig,
    batch: dict,
    rng: jax.Array,
    *,
    num_student_steps: int = 8,
    substeps: int = 5,
    cfg_scale_text: float = 3.0,
    cfg_scale_speaker: float = 8.0,
    cfg_min_t: float = 0.5,
    cfg_max_t: float = 1.0,
    dtype=jnp.bfloat16,
    quant_aware: bool = False,
) -> jnp.ndarray:
    """MSE between the student's one-step velocity and the teacher's
    `substeps`-step CFG-guided average velocity over one student-grid
    interval.

    `quant_aware=True` trains the student THROUGH the W8A8 fake-quant
    forward (ops/quant.qat_dot: int8 quantization decisions, f32
    arithmetic, straight-through gradients), so the checkpoint it
    produces is robust to `ECHO_DIT_QUANT=int8` serving — stacking the
    few-step and int8 levers (docs/PERFORMANCE.md §11) without training/
    serving mismatch.  The tagging is pure pytree relabeling inside the
    loss; the optimizer always sees plain bf16 parameters.

    `batch` is the flow-matching batch (train/step.py:flow_matching_loss);
    the start state x_t is formed by the forward process at a t drawn
    UNIFORMLY FROM THE STUDENT GRID (per example), so the student only
    ever trains on the t values it will be evaluated at.  The teacher's
    CFG gating is the sampler's own window rule, applied per-substep via
    `where` on the guidance scales (scale 0 == guidance off — identical
    math to the sampler's plain branch, resolved without retracing)."""
    x0 = batch["latents"].astype(jnp.float32)
    b = x0.shape[0]
    k_i, k_eps = jax.random.split(rng)

    # student grid: t_i = INIT_SCALE * (1 - i/N), one step dt = -IS/N
    i = jax.random.randint(k_i, (b,), 0, num_student_steps)
    t_hi = np.float32(INIT_SCALE) * (1.0 - i.astype(jnp.float32)
                                     / np.float32(num_student_steps))
    dt_student = np.float32(-INIT_SCALE / num_student_steps)
    dt_sub = np.float32(dt_student / substeps)

    eps = jax.random.normal(k_eps, x0.shape, dtype=jnp.float32)
    x_t = t_hi[:, None, None] * eps + (1.0 - t_hi[:, None, None]) * x0

    # teacher KV (frozen) and student KV (trained) are separate prefills
    kv_t = dit.concat_static_kv(
        cfg,
        dit.get_kv_cache_text(teacher_params, cfg, batch["text_ids"],
                              batch["text_mask"]),
        dit.get_kv_cache_speaker(teacher_params, cfg,
                                 batch["speaker_latent"].astype(dtype)))
    kv_s = dit.concat_static_kv(
        cfg,
        dit.get_kv_cache_text(student_params, cfg, batch["text_ids"],
                              batch["text_mask"]),
        dit.get_kv_cache_speaker(student_params, cfg,
                                 batch["speaker_latent"].astype(dtype)))

    # the sampler's own mask construction — branch order [cond,
    # uncond_text, uncond_speaker] can never diverge between teacher
    # rollout and production sampling
    mask_cfg, mask_plain = make_cfg_branch_masks(
        cfg, batch["text_mask"], batch["speaker_mask"])

    s_text = np.float32(cfg_scale_text)
    s_spk = np.float32(cfg_scale_speaker)

    def teacher_substep(x, j):
        t_j = t_hi + j * dt_sub                       # (B,), decreasing
        x3 = jnp.concatenate([x, x, x], axis=0).astype(dtype)
        t3 = jnp.concatenate([t_j, t_j, t_j], axis=0).astype(dtype)
        v = dit.dit_forward_static(teacher_params, cfg, x3, t3,
                                   kv_t[0], kv_t[1], mask_cfg)
        v_c, v_ut, v_us = jnp.split(v, 3, axis=0)
        in_win = ((t_j >= np.float32(cfg_min_t))
                  & (t_j <= np.float32(cfg_max_t)))[:, None, None]
        st = jnp.where(in_win, s_text, 0.0)
        ss = jnp.where(in_win, s_spk, 0.0)
        v = v_c + st * (v_c - v_ut) + ss * (v_c - v_us)
        return x + v * dt_sub, None

    x_end, _ = jax.lax.scan(teacher_substep, x_t,
                            jnp.arange(substeps, dtype=jnp.float32))
    v_target = jax.lax.stop_gradient((x_end - x_t) / dt_student)

    if quant_aware:
        from ..ops.quant import qat_tag_dit_params
        student_fwd = qat_tag_dit_params(student_params)
    else:
        student_fwd = student_params
    v_pred = dit.dit_forward_static(
        student_fwd, cfg, x_t.astype(dtype), t_hi.astype(dtype),
        kv_s[0], kv_s[1], mask_plain)

    sq = jnp.square(v_pred - v_target)
    mask = batch.get("latent_mask")
    if mask is None:
        return jnp.mean(sq)
    m = mask.astype(jnp.float32)[:, :, None]
    return jnp.sum(sq * m) / jnp.maximum(jnp.sum(m) * x0.shape[-1], 1.0)


def make_distill_step(cfg: EchoDiTConfig, tx: optax.GradientTransformation,
                      mesh: Mesh, dtype=jnp.bfloat16,
                      ema_decay: float = 0.999, **distill_kw):
    """Jitted sharded distillation step (mirrors step.make_train_step):
    student params/moments carry TP shardings, the frozen teacher rides as
    a separate (identically sharded) argument, batches shard over `data`.
    Returns (distill_step, place_batch)."""
    batch_sh = {
        "latents": NamedSharding(mesh, P(pmesh.DATA_AXIS, None, None)),
        "text_ids": NamedSharding(mesh, P(pmesh.DATA_AXIS, None)),
        "text_mask": NamedSharding(mesh, P(pmesh.DATA_AXIS, None)),
        "speaker_latent": NamedSharding(mesh, P(pmesh.DATA_AXIS, None, None)),
        "speaker_mask": NamedSharding(mesh, P(pmesh.DATA_AXIS, None)),
        "latent_mask": NamedSharding(mesh, P(pmesh.DATA_AXIS, None)),
    }

    def loss_fn(student_params, teacher_params, batch, rng):
        return distill_loss(student_params, teacher_params, cfg, batch,
                            rng, dtype=dtype, **distill_kw)

    @jax.jit
    def distill_step(state: TrainState, teacher_params: dict, batch: dict,
                     rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, teacher_params, batch, rng)
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

    return distill_step, place_batch


def distill(
    cfg: EchoDiTConfig,
    teacher_params: dict,
    batches,
    mesh: Mesh,
    *,
    num_steps: int,
    num_student_steps: int = 8,
    substeps: int = 5,
    lr: float = 5e-5,
    weight_decay: float = 0.01,
    ema_decay: Optional[float] = None,
    dtype=jnp.bfloat16,
    rng: Optional[jax.Array] = None,
    on_step=None,
    **cfg_kw,
) -> TrainState:
    """Distill `teacher_params` into a `num_student_steps` student.
    The student starts AS the teacher (standard for distillation — the
    student's step-0 loss is then purely the guidance/step mismatch).
    cfg_kw forwards CFG scales/window to distill_loss."""
    from .step import make_optimizer

    tx = make_optimizer(lr=lr, weight_decay=weight_decay)
    teacher = pmesh.shard_params(teacher_params, mesh, cfg.blockwise)
    state = create_train_state(jax.tree.map(jnp.copy, teacher), tx, mesh,
                               cfg.blockwise, ema=ema_decay is not None)
    step_fn, place_batch = make_distill_step(
        cfg, tx, mesh, dtype=dtype,
        ema_decay=ema_decay if ema_decay is not None else 0.999,
        num_student_steps=num_student_steps, substeps=substeps, **cfg_kw)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    it = iter(batches)
    for i in range(num_steps):
        try:
            batch = place_batch(next(it))
        except StopIteration:
            raise ValueError(
                f"batches exhausted after {i} of {num_steps} steps — pass "
                "an infinite iterator (e.g. itertools.cycle) or lower "
                "num_steps") from None
        rng, step_rng = jax.random.split(rng)
        state, loss = step_fn(state, teacher, batch, step_rng)
        if on_step is not None:
            on_step(i, float(loss))
    return state
