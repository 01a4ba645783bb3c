"""HF-hub weight loading, mirroring the reference loaders.

load_model_from_hf / load_fish_ae_from_hf / load_pca_state_from_hf
(reference: inference.py:14-47, 56-76, 92-99) download safetensors from the
hub and build the torch modules; here the downloads feed the torch->JAX
converters and return the EchoModels bundle.  Requires network + HF_TOKEN
for gated repos; in air-gapped deployments pre-populate ECHO_MODEL_DIR and
use serve.models.load_models instead.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import base_dac_config, base_dit_config
from ..pipeline.pipeline import EchoModels

DIT_REPO = "jordand/echo-tts-base"          # reference: inference.py:25
DAC_REPO = "jordand/fish-s1-dac-min"        # reference: inference.py:62
DIT_FILE = "pytorch_model.safetensors"
DAC_FILE = "pytorch_model.safetensors"  # reference: inference.py:61
PCA_FILE = "pca_state.safetensors"      # reference: inference.py:92


def _download(repo: str, filename: str, token: Optional[str]) -> str:
    from huggingface_hub import hf_hub_download

    return hf_hub_download(repo, filename, token=token)


def load_models_from_hf(
    token: Optional[str] = None,
    dtype=jnp.bfloat16,
    dac_dtype=None,
    blockwise: bool = True,
) -> EchoModels:
    """Download + convert the full bundle (DiT, S1-DAC, PCA state)."""
    from safetensors import safe_open

    from .convert import load_dit_from_safetensors
    from .convert_dac import convert_pca_state, load_dac_from_safetensors

    dit_cfg = base_dit_config(blockwise=blockwise)
    dac_cfg = base_dac_config()

    dit_path = _download(DIT_REPO, DIT_FILE, token)
    dit_params = load_dit_from_safetensors(dit_path, dit_cfg, dtype=dtype)

    dac_path = _download(DAC_REPO, DAC_FILE, token)
    dac_params = load_dac_from_safetensors(dac_path, dac_cfg)
    if dac_dtype is not None:
        import jax
        dac_params = jax.tree.map(lambda a: a.astype(dac_dtype), dac_params)

    pca_path = _download(DIT_REPO, PCA_FILE, token)
    with safe_open(pca_path, framework="np") as f:
        pca = convert_pca_state(
            f.get_tensor("pca_components"), f.get_tensor("pca_mean"),
            f.get_tensor("latent_scale"))

    return EchoModels(dit_params=dit_params, dit_cfg=dit_cfg,
                      dac_params=dac_params, dac_cfg=dac_cfg, pca=pca,
                      dtype=dtype)
