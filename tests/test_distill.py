"""Few-step distillation (train/distill.py — OPT-IN, NON-PARITY).

Pins (1) the teacher-target identity: with guidance off and one substep
the distillation target IS the teacher's velocity, so a student equal to
the teacher has ~zero loss; (2) the sharded distill step descends on a
fixed batch when there is real guidance to distill; (3) the few-step
sampler kwargs produce a CFG-free plan and a working sample call."""
import numpy as np

import jax
import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dit_config
from echo_tts_tpu.models.dit import init_dit_params
from echo_tts_tpu.parallel import mesh as pmesh
from echo_tts_tpu.sampler.euler import (
    build_step_plan, sample_euler_cfg_independent_guidances)
from echo_tts_tpu.train.distill import (
    distill_loss, few_step_sampler_params, make_distill_step)
from echo_tts_tpu.train.step import make_optimizer, create_train_state


def _batch(key, b=4):
    ks = jax.random.split(key, 3)
    return {
        "latents": jax.random.normal(ks[0], (b, 16, 80), jnp.float32) * 0.1,
        "text_ids": jax.random.randint(ks[1], (b, 12), 0, 256, jnp.int32),
        "text_mask": jnp.ones((b, 12), bool),
        "speaker_latent": jax.random.normal(ks[2], (b, 8, 80), jnp.float32),
        "speaker_mask": jnp.ones((b, 8), bool),
    }


def test_identity_teacher_is_zero_loss():
    """Guidance off + one substep => target == teacher velocity, so
    loss(student=teacher) vanishes (the 3-row CFG program's cond row and
    the plain program compute the same math)."""
    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    loss = distill_loss(
        params, params, cfg, _batch(jax.random.PRNGKey(1)),
        jax.random.PRNGKey(2), num_student_steps=4, substeps=1,
        cfg_scale_text=0.0, cfg_scale_speaker=0.0, dtype=jnp.float32)
    assert float(loss) < 1e-8


def test_distill_step_descends_on_guidance_gap():
    """With real CFG scales the step-0 loss is the guidance mismatch
    (strictly positive for student == teacher) and Adam reduces it on a
    fixed batch/rng."""
    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    tx = make_optimizer(lr=1e-3)
    teacher = pmesh.shard_params(params, mesh, cfg.blockwise)
    state = create_train_state(jax.tree.map(jnp.copy, teacher), tx, mesh,
                               cfg.blockwise)
    step_fn, place_batch = make_distill_step(
        cfg, tx, mesh, dtype=jnp.float32, num_student_steps=4, substeps=2,
        cfg_scale_text=2.0, cfg_scale_speaker=2.0)
    batch = place_batch(_batch(jax.random.PRNGKey(7)))
    rng = jax.random.PRNGKey(3)          # fixed: deterministic objective
    losses = []
    for _ in range(6):
        state, loss = step_fn(state, teacher, batch, rng)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[0] > 1e-6              # guidance gap exists
    assert losses[-1] < losses[0]        # and is being distilled away
    assert int(state.step) == 6


def test_quant_aware_distill_descends_and_matches_int8_numerics():
    """quant_aware=True: (a) the QAT fake-quant forward (qat_dot) matches
    the int8 serving path's numerics, (b) STE gradients flow to the
    tagged hot-loop weights, (c) the sharded step still descends."""
    from echo_tts_tpu.ops import quant

    # (a) forward parity: fake-quant == int8_dot up to accumulation order
    k, n, m = 128, 64, 32
    w = jax.random.normal(jax.random.PRNGKey(10), (k, n)) / np.sqrt(k)
    x = jax.random.normal(jax.random.PRNGKey(11), (m, k))
    q = quant.quantize_weight_int8(w)
    ref = np.asarray(quant.int8_dot(x, q["q8"], q["s"],
                                    out_dtype=jnp.float32))
    got = np.asarray(quant.qat_dot(x, w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)

    # (b) STE: gradient ~ the plain matmul's gradient, not zero
    g = jax.grad(lambda wv: jnp.sum(quant.qat_dot(x, wv) ** 2))(w)
    g_plain = jax.grad(lambda wv: jnp.sum((x @ wv) ** 2))(w)
    assert float(jnp.linalg.norm(g)) > 0.0
    cos = float(jnp.vdot(g, g_plain)
                / (jnp.linalg.norm(g) * jnp.linalg.norm(g_plain)))
    assert cos > 0.95, cos

    # (c) the sharded distill step descends through the QAT forward
    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    tx = make_optimizer(lr=1e-3)
    teacher = pmesh.shard_params(params, mesh, cfg.blockwise)
    state = create_train_state(jax.tree.map(jnp.copy, teacher), tx, mesh,
                               cfg.blockwise)
    step_fn, place_batch = make_distill_step(
        cfg, tx, mesh, dtype=jnp.float32, num_student_steps=4, substeps=2,
        cfg_scale_text=2.0, cfg_scale_speaker=2.0, quant_aware=True)
    batch = place_batch(_batch(jax.random.PRNGKey(7)))
    rng = jax.random.PRNGKey(3)
    losses = []
    for _ in range(6):
        state, loss = step_fn(state, teacher, batch, rng)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[0] > 1e-6
    assert losses[-1] < losses[0]


def test_distill_exhausted_batches_is_clear_error():
    """A batches iterable shorter than num_steps must raise a clear
    ValueError, not a bare StopIteration mid-training."""
    import pytest

    from echo_tts_tpu.train.distill import distill

    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    with pytest.raises(ValueError, match="exhausted after 2 of 5"):
        distill(cfg, params, [_batch(jax.random.PRNGKey(7))] * 2, mesh,
                num_steps=5, num_student_steps=4, substeps=1,
                dtype=jnp.float32)


def test_few_step_params_take_the_plain_path():
    kw = few_step_sampler_params(8)
    plan = build_step_plan(kw["num_steps"], kw["cfg_min_t"],
                           kw["cfg_max_t"], None, None, None, None)
    assert not plan.has_cfg.any()        # every step is batch-B plain

    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    b = _batch(jax.random.PRNGKey(1), b=1)
    out = sample_euler_cfg_independent_guidances(
        params, cfg, b["speaker_latent"], b["speaker_mask"],
        b["text_ids"], b["text_mask"], sequence_length=16,
        dtype=jnp.float32, rng_key=jax.random.PRNGKey(5), **kw)
    assert out.shape == (1, 16, cfg.latent_size)
    assert np.isfinite(np.asarray(out)).all()
