"""Sharded inference: run the sampler over a (data, model) mesh.

Latency scaling for one utterance uses tensor parallelism over the DiT's
16 heads / SwiGLU hidden (same specs as training, parallel/mesh.py);
throughput scaling shards the request batch over `data`.  GSPMD inserts
the per-layer collectives; nothing in the model code changes — this module
only places parameters and inputs.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.pipeline import EchoModels
from . import mesh as pmesh


def shard_models(models: EchoModels, mesh: Mesh) -> EchoModels:
    """Place DiT params with TP shardings; codec + PCA replicate (the codec
    is bandwidth-bound and small — sharding it buys nothing)."""
    dit_params = pmesh.shard_params(models.dit_params, mesh,
                                    models.dit_cfg.blockwise)
    rep = NamedSharding(mesh, P())

    def rep_put(a):
        return jax.device_put(a, rep) if hasattr(a, "dtype") else a

    return EchoModels(
        dit_params=dit_params,
        dit_cfg=models.dit_cfg,
        dac_params=jax.tree.map(rep_put, models.dac_params),
        dac_cfg=models.dac_cfg,
        pca=jax.tree.map(rep_put, models.pca),
        dtype=models.dtype)


def place_request(mesh: Mesh, speaker_latent, speaker_mask, text_ids,
                  text_mask, initial_noise: Optional[jnp.ndarray] = None):
    """Shard request arrays: batch over `data`, everything else replicated
    within a shard."""
    def put(a, ndim_spec):
        return jax.device_put(jnp.asarray(a),
                              NamedSharding(mesh, ndim_spec))

    b3 = P(pmesh.DATA_AXIS, None, None)
    b2 = P(pmesh.DATA_AXIS, None)
    out = (put(speaker_latent, b3), put(speaker_mask, b2),
           put(text_ids, b2), put(text_mask, b2))
    if initial_noise is not None:
        out = out + (put(initial_noise, b3),)
    return out
