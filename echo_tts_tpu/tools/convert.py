"""Torch-checkpoint -> JAX-pytree conversion for EchoDiT.

The published checkpoint (`jordand/echo-tts-base`, pytorch_model.safetensors)
uses the reference module tree (reference: model.py:472-559).  This converter
maps its flat state dict to the stacked-layer pytree documented in
models/dit.py:

  * torch nn.Linear stores (out, in); we store (in, out) -> transpose.
  * per-layer weights `blocks.{i}.*` are stacked along a leading layer axis.
  * embeddings and norm weights copy through unchanged.

Works from any {name: np.ndarray} mapping, so tests can convert an in-memory
torch state dict without touching disk.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from ..config import EchoDiTConfig


def _t(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a.T)


def _stack(state: Mapping[str, np.ndarray], fmt: str, n: int,
           transpose: bool = True) -> np.ndarray:
    arrs = [state[fmt.format(i)] for i in range(n)]
    if transpose:
        arrs = [_t(a) for a in arrs]
    return np.stack(arrs, axis=0)


def _enc_blocks(state: Mapping[str, np.ndarray], prefix: str, n: int) -> dict:
    return {
        "attn": {
            "wq": _stack(state, f"{prefix}.blocks.{{}}.attention.wq.weight", n),
            "wk": _stack(state, f"{prefix}.blocks.{{}}.attention.wk.weight", n),
            "wv": _stack(state, f"{prefix}.blocks.{{}}.attention.wv.weight", n),
            "wo": _stack(state, f"{prefix}.blocks.{{}}.attention.wo.weight", n),
            "gate": _stack(state, f"{prefix}.blocks.{{}}.attention.gate.weight", n),
            "q_norm": _stack(state, f"{prefix}.blocks.{{}}.attention.q_norm.weight",
                             n, transpose=False),
            "k_norm": _stack(state, f"{prefix}.blocks.{{}}.attention.k_norm.weight",
                             n, transpose=False),
        },
        "mlp": {
            "w1": _stack(state, f"{prefix}.blocks.{{}}.mlp.w1.weight", n),
            "w3": _stack(state, f"{prefix}.blocks.{{}}.mlp.w3.weight", n),
            "w2": _stack(state, f"{prefix}.blocks.{{}}.mlp.w2.weight", n),
        },
        "attn_norm": _stack(state, f"{prefix}.blocks.{{}}.attention_norm.weight",
                            n, transpose=False),
        "mlp_norm": _stack(state, f"{prefix}.blocks.{{}}.mlp_norm.weight",
                           n, transpose=False),
    }


def _adaln(state: Mapping[str, np.ndarray], which: str, n: int) -> dict:
    out = {}
    for name in ("shift", "scale", "gate"):
        out[f"{name}_down"] = _stack(
            state, f"blocks.{{}}.{which}.{name}_down.weight", n)
        out[f"{name}_up"] = {
            "kernel": _stack(state, f"blocks.{{}}.{which}.{name}_up.weight", n),
            "bias": _stack(state, f"blocks.{{}}.{which}.{name}_up.bias", n,
                           transpose=False),
        }
    return out


def convert_dit_state(state: Mapping[str, np.ndarray],
                      cfg: EchoDiTConfig, dtype=None) -> Dict:
    """Convert a torch EchoDiT state dict (as numpy) to the JAX pytree."""
    n = cfg.num_layers

    attn = {
        "wq": _stack(state, "blocks.{}.attention.wq.weight", n),
        "wk": _stack(state, "blocks.{}.attention.wk.weight", n),
        "wv": _stack(state, "blocks.{}.attention.wv.weight", n),
        "wo": _stack(state, "blocks.{}.attention.wo.weight", n),
        "gate": _stack(state, "blocks.{}.attention.gate.weight", n),
        "wk_text": _stack(state, "blocks.{}.attention.wk_text.weight", n),
        "wv_text": _stack(state, "blocks.{}.attention.wv_text.weight", n),
        "wk_speaker": _stack(state, "blocks.{}.attention.wk_speaker.weight", n),
        "wv_speaker": _stack(state, "blocks.{}.attention.wv_speaker.weight", n),
        "q_norm": _stack(state, "blocks.{}.attention.q_norm.weight", n,
                         transpose=False),
        "k_norm": _stack(state, "blocks.{}.attention.k_norm.weight", n,
                         transpose=False),
    }
    if cfg.blockwise:
        attn["wk_latent"] = _stack(state, "blocks.{}.attention.wk_latent.weight", n)
        attn["wv_latent"] = _stack(state, "blocks.{}.attention.wv_latent.weight", n)

    params = {
        "text_encoder": {
            "embedding": np.asarray(state["text_encoder.text_embedding.weight"]),
            "blocks": _enc_blocks(state, "text_encoder", cfg.text_num_layers),
        },
        "speaker_encoder": {
            "in_proj": {"kernel": _t(state["speaker_encoder.in_proj.weight"]),
                        "bias": np.asarray(state["speaker_encoder.in_proj.bias"])},
            "blocks": _enc_blocks(state, "speaker_encoder", cfg.speaker_num_layers),
        },
        "text_norm": np.asarray(state["text_norm.weight"]),
        "speaker_norm": np.asarray(state["speaker_norm.weight"]),
        "cond": {
            "w0": _t(state["cond_module.0.weight"]),
            "w1": _t(state["cond_module.2.weight"]),
            "w2": _t(state["cond_module.4.weight"]),
        },
        "in_proj": {"kernel": _t(state["in_proj.weight"]),
                    "bias": np.asarray(state["in_proj.bias"])},
        "blocks": {
            "attn": attn,
            "mlp": {
                "w1": _stack(state, "blocks.{}.mlp.w1.weight", n),
                "w3": _stack(state, "blocks.{}.mlp.w3.weight", n),
                "w2": _stack(state, "blocks.{}.mlp.w2.weight", n),
            },
            "attn_adaln": _adaln(state, "attention_adaln", n),
            "mlp_adaln": _adaln(state, "mlp_adaln", n),
        },
        "out_norm": np.asarray(state["out_norm.weight"]),
        "out_proj": {"kernel": _t(state["out_proj.weight"]),
                     "bias": np.asarray(state["out_proj.bias"])},
    }
    if cfg.blockwise:
        params["latent_encoder"] = {
            "in_proj": {"kernel": _t(state["latent_encoder.in_proj.weight"]),
                        "bias": np.asarray(state["latent_encoder.in_proj.bias"])},
            "blocks": _enc_blocks(state, "latent_encoder", cfg.speaker_num_layers),
        }
        params["latent_norm"] = np.asarray(state["latent_norm.weight"])

    import jax

    def to_jnp(a):
        x = jnp.asarray(a)
        return x.astype(dtype) if dtype is not None else x

    return jax.tree.map(to_jnp, params)


def load_dit_from_safetensors(path: str, cfg: EchoDiTConfig, dtype=None) -> Dict:
    """Load the published checkpoint file (one-time conversion path,
    mirroring load_model_from_hf, reference: inference.py:14-47)."""
    from safetensors import safe_open

    state = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            state[key] = f.get_tensor(key)
    return convert_dit_state(state, cfg, dtype=dtype)
