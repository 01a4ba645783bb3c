"""Native checkpointing for the converted model bundle.

The reference's "checkpointing" is HF-hub safetensors loading with
meta-device init (reference: inference.py:14-47, 56-76, 92-99).  Here the
one-time torch->JAX conversion (tools/convert.py, tools/convert_dac.py) is
persisted as an orbax checkpoint of the full EchoModels bundle, so serving
cold-starts skip the conversion and load straight into jax.Arrays.

Layout on disk:
  <dir>/params/...      orbax PyTree checkpoint {dit, dac, pca}
  <dir>/config.json     configs + dtypes to rebuild EchoModels
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DACConfig, EchoDiTConfig
from ..pipeline.pipeline import EchoModels


def save_checkpoint(path: str, models: EchoModels) -> None:
    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(os.path.abspath(path), "params"),
              {"dit": models.dit_params, "dac": models.dac_params,
               "pca": models.pca})
    meta = {
        "dit_cfg": dataclasses.asdict(models.dit_cfg),
        "dac_cfg": dataclasses.asdict(models.dac_cfg),
        "dtype": jnp.dtype(models.dtype).name,
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path: str,
                    dtype: Optional[object] = None) -> EchoModels:
    import orbax.checkpoint as ocp

    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    dit_cfg = EchoDiTConfig(**{
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in meta["dit_cfg"].items()})
    dac_cfg = DACConfig(**{
        k: (tuple(v) if isinstance(v, list) else v)
        for k, v in meta["dac_cfg"].items()})
    ckpt = ocp.PyTreeCheckpointer()
    tree = ckpt.restore(os.path.join(os.path.abspath(path), "params"))
    model_dtype = dtype or jnp.dtype(meta["dtype"])

    def to_jax(a):
        if isinstance(a, (np.ndarray, jnp.ndarray)):
            return jnp.asarray(a)
        return a

    return EchoModels(
        dit_params=jax.tree.map(to_jax, tree["dit"]),
        dit_cfg=dit_cfg,
        dac_params=jax.tree.map(to_jax, tree["dac"]),
        dac_cfg=dac_cfg,
        pca=jax.tree.map(to_jax, tree["pca"]),
        dtype=model_dtype)
