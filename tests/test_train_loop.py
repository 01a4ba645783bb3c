"""Training loop: sharded updates, loss descent, checkpointing."""
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
