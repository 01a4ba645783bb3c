"""Training loop: sharded updates, loss descent, checkpointing, and the
audio -> latent-shard -> batch data pipeline."""
import itertools
import os

import numpy as np

import jax
import jax.numpy as jnp

from echo_tts_tpu.config import tiny_dit_config
from echo_tts_tpu.models.dit import init_dit_params
from echo_tts_tpu.parallel import mesh as pmesh
from echo_tts_tpu.train.loop import train


def _batch(key):
    ks = jax.random.split(key, 3)
    return {
        "latents": jax.random.normal(ks[0], (4, 16, 80), jnp.float32) * 0.1,
        "text_ids": jax.random.randint(ks[1], (4, 12), 0, 256, jnp.int32),
        "text_mask": jnp.ones((4, 12), bool),
        "speaker_latent": jax.random.normal(ks[2], (4, 8, 80), jnp.float32),
        "speaker_mask": jnp.ones((4, 8), bool),
    }


def test_train_loop_descends_and_checkpoints(tmp_path):
    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    fixed = _batch(jax.random.PRNGKey(7))
    losses = []
    state = train(
        cfg, params, itertools.repeat(fixed), mesh,
        num_steps=6, lr=1e-3, dtype=jnp.float32,
        rng=jax.random.PRNGKey(1),
        checkpoint_dir=str(tmp_path), checkpoint_every=3, log_every=100,
        on_step=lambda i, l: losses.append(l))
    assert len(losses) == 6 and all(np.isfinite(losses))
    # same batch (fresh t/noise draws per step) - trend should descend
    assert losses[-1] < losses[0]
    assert int(state.step) == 6
    assert os.path.isdir(tmp_path / "step_00000003")
    assert os.path.isdir(tmp_path / "step_00000006")


def test_remat_policies_match_full_remat():
    """Every remat mode ('dots', 'dots_all', 'attn', 'none') changes the
    memory/compute schedule, never the math: loss values and gradients
    must match the full-remat path."""
    from echo_tts_tpu.train.step import flow_matching_loss

    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    batch = _batch(jax.random.PRNGKey(7))
    rng = jax.random.PRNGKey(3)

    lf, gf = jax.value_and_grad(flow_matching_loss)(
        params, cfg, batch, rng, dtype=jnp.float32, remat="full")
    for mode in ("dots", "dots_all", "attn", "none"):
        ld, gd = jax.value_and_grad(flow_matching_loss)(
            params, cfg, batch, rng, dtype=jnp.float32, remat=mode)
        np.testing.assert_allclose(float(lf), float(ld), rtol=1e-6,
                                   err_msg=mode)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gd)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4,
                                       err_msg=mode)


def test_train_loop_ema_and_cosine_schedule(tmp_path):
    """EMA weights track (but lag) the raw params, and the warmup+cosine
    schedule starts the LR at ~0 (first update barely moves params)."""
    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    fixed = _batch(jax.random.PRNGKey(7))

    state = train(
        cfg, params, itertools.repeat(fixed), mesh,
        num_steps=4, lr=1e-3, warmup_steps=2, cosine_decay=True,
        ema_decay=0.5, dtype=jnp.float32, rng=jax.random.PRNGKey(1),
        checkpoint_dir=str(tmp_path), checkpoint_every=4, log_every=100)
    assert state.ema is not None
    w_new = np.asarray(state.params["blocks"]["mlp"]["w1"])
    w_ema = np.asarray(state.ema["blocks"]["mlp"]["w1"])
    w_init = np.asarray(params["blocks"]["mlp"]["w1"])
    d_new = float(np.abs(w_new - w_init).mean())
    d_ema = float(np.abs(w_ema - w_init).mean())
    assert d_new > 0 and 0 < d_ema < d_new  # EMA lags the live weights
    # checkpoint carries both trees
    import orbax.checkpoint as ocp
    tree = ocp.PyTreeCheckpointer().restore(
        str(tmp_path / "step_00000004"))
    assert set(tree) == {"params", "ema"}

    # warmup from 0: the very first update must be ~no-op vs constant-lr
    from echo_tts_tpu.train.step import (create_train_state,
                                         make_optimizer, make_train_step)
    tx = make_optimizer(lr=1e-3, warmup_steps=10, total_steps=100)
    st = create_train_state(params, tx, mesh, blockwise=False)
    step_fn, place = make_train_step(cfg, tx, mesh, dtype=jnp.float32)
    st2, _ = step_fn(st, place(fixed), jax.random.PRNGKey(9))
    first_move = float(np.abs(
        np.asarray(st2.params["blocks"]["mlp"]["w1"]) - w_init).max())
    assert first_move < 1e-6  # lr starts at 0


def test_data_pipeline_feeds_train_step(tiny_models, tmp_path):
    """audio -> ae_encode -> shards -> static-shape batches -> one sharded
    train step; the batch contract end-to-end (train/data.py)."""
    from echo_tts_tpu.train import data as tdata

    models = tiny_models
    spl = models.dac_cfg.frame_length
    rng = np.random.default_rng(0)
    items = [
        (np.tanh(rng.standard_normal((1, (16 + 8 * i) * spl))
                 ).astype(np.float32), f"Utterance number {i}.")
        for i in range(4)
    ] + [
        (np.tanh(rng.standard_normal((1, 2 * spl))).astype(np.float32),
         "Too short, dropped."),
    ]
    dcfg = tdata.DataConfig(sequence_length=16, text_length=32,
                            speaker_length=8, min_latents=8)
    shards = tdata.write_shards(models, items, str(tmp_path / "shards"),
                                shard_size=4, cfg=dcfg)
    assert len(shards) == 1  # 4 utterances kept, short one dropped

    utts = tdata.load_shard(shards[0])
    assert len(utts) == 4
    assert utts[0][0].shape[1] == 80

    batches = tdata.iter_batches(shards, models, batch_size=4, cfg=dcfg,
                                 seed=1)
    batch = next(batches)
    assert batch["latents"].shape == (4, 16, 80)
    assert batch["latent_mask"].shape == (4, 16)
    # padded window tails are excluded from the loss
    assert (batch["latents"][~batch["latent_mask"]] == 0).all()
    assert batch["text_ids"].shape == (4, 32)
    assert batch["speaker_latent"].shape == (4, 8, 80)
    ps = models.dit_cfg.speaker_patch_size
    assert batch["speaker_mask"].sum(axis=1).max() % ps == 0
    # The speaker clip and the target window must be DISJOINT segments of
    # the utterance (overlap would leak the clean target into the speaker
    # KV): with random latents, frame 0 of each cannot coincide.
    for i in range(4):
        assert not np.allclose(batch["speaker_latent"][i, 0],
                               batch["latents"][i, 0])

    cfg = tiny_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    mesh = pmesh.make_mesh(dp=4, tp=2)
    state = train(cfg, params, batches, mesh, num_steps=2, lr=1e-3,
                  dtype=jnp.float32, rng=jax.random.PRNGKey(2),
                  log_every=100)
    assert int(state.step) == 2
