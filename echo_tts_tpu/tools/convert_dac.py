"""Torch S1-DAC checkpoint -> JAX pytree conversion.

Maps the reference module tree (reference: autoencoder.py:839-1192, built by
build_ae) to the NLC pytree consumed by models/dac/.

Conventions:
  * weight-normed convs appear in the state dict as
    `<name>.parametrizations.weight.original0` (g) / `original1` (v);
    we fold w = g * v / ||v|| (norm over all dims except 0, the torch
    weight_norm dim=0 default used throughout the reference,
    autoencoder.py:291-293, 318-320).
  * every conv weight (Conv1d (O,I,K), depthwise (C,1,K), ConvTranspose1d
    (I,O,K)) maps to our kernel with a single (2,1,0) transpose.
  * Linears transpose to (in, out); per-layer transformer weights stack.
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..config import DACConfig

DILATIONS = (1, 3, 9)


def _fold_wn(state: Mapping[str, np.ndarray], name: str) -> np.ndarray:
    g = np.asarray(state[f"{name}.parametrizations.weight.original0"],
                   dtype=np.float32)
    v = np.asarray(state[f"{name}.parametrizations.weight.original1"],
                   dtype=np.float32)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
    return g * v / norm


def _conv(state, name, weight_norm=True) -> dict:
    w = _fold_wn(state, name) if weight_norm else np.asarray(
        state[f"{name}.weight"], dtype=np.float32)
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 1, 0)))}
    bias_key = f"{name}.bias"
    out["bias"] = (np.asarray(state[bias_key], dtype=np.float32)
                   if bias_key in state else None)
    return out


def _t(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32).T)


def _residual_unit(state, prefix) -> dict:
    # ResidualUnit.block: [Snake, conv k7, Snake, conv k1]
    # (autoencoder.py:879-890)
    return {
        "snake1": np.asarray(state[f"{prefix}.block.0.alpha"],
                             dtype=np.float32).reshape(-1),
        "conv1": _conv(state, f"{prefix}.block.1.conv"),
        "snake2": np.asarray(state[f"{prefix}.block.2.alpha"],
                             dtype=np.float32).reshape(-1),
        "conv2": _conv(state, f"{prefix}.block.3.conv"),
    }


def _transformer(state, prefix, n_layers) -> dict:
    def stack(fmt, transpose=True):
        arrs = [np.asarray(state[fmt.format(i)], dtype=np.float32)
                for i in range(n_layers)]
        if transpose:
            arrs = [_t(a) for a in arrs]
        return np.stack(arrs)

    return {
        "blocks": {
            "wqkv": stack(f"{prefix}.layers.{{}}.attention.wqkv.weight"),
            "wo": stack(f"{prefix}.layers.{{}}.attention.wo.weight"),
            "w1": stack(f"{prefix}.layers.{{}}.feed_forward.w1.weight"),
            "w3": stack(f"{prefix}.layers.{{}}.feed_forward.w3.weight"),
            "w2": stack(f"{prefix}.layers.{{}}.feed_forward.w2.weight"),
            "attn_norm": stack(f"{prefix}.layers.{{}}.attention_norm.weight",
                               transpose=False),
            "ffn_norm": stack(f"{prefix}.layers.{{}}.ffn_norm.weight",
                              transpose=False),
            "attn_ls": stack(
                f"{prefix}.layers.{{}}.attention_layer_scale.gamma",
                transpose=False),
            "ffn_ls": stack(f"{prefix}.layers.{{}}.ffn_layer_scale.gamma",
                            transpose=False),
        },
        "norm": np.asarray(state[f"{prefix}.norm.weight"], dtype=np.float32),
    }


def _convnext(state, prefix) -> dict:
    return {
        "dwconv": _conv(state, f"{prefix}.dwconv.conv", weight_norm=False),
        "norm": {"weight": np.asarray(state[f"{prefix}.norm.weight"],
                                      dtype=np.float32),
                 "bias": np.asarray(state[f"{prefix}.norm.bias"],
                                    dtype=np.float32)},
        "pwconv1": {"kernel": _t(state[f"{prefix}.pwconv1.weight"]),
                    "bias": np.asarray(state[f"{prefix}.pwconv1.bias"],
                                       dtype=np.float32)},
        "pwconv2": {"kernel": _t(state[f"{prefix}.pwconv2.weight"]),
                    "bias": np.asarray(state[f"{prefix}.pwconv2.bias"],
                                       dtype=np.float32)},
        "gamma": np.asarray(state[f"{prefix}.gamma"], dtype=np.float32),
    }


def _vq_stack(state, prefix, n) -> dict:
    """Stack n codebooks of one ResidualVectorQuantize
    (autoencoder.py:117-181).  in/out proj are weight-normed 1x1 convs."""
    in_k, in_b, out_k, out_b, cbs = [], [], [], [], []
    for i in range(n):
        q = f"{prefix}.quantizers.{i}"
        wi = _fold_wn(state, f"{q}.in_proj")[:, :, 0]   # (Dc, D)
        wo = _fold_wn(state, f"{q}.out_proj")[:, :, 0]  # (D, Dc)
        in_k.append(_t(wi))
        in_b.append(np.asarray(state[f"{q}.in_proj.bias"], dtype=np.float32))
        out_k.append(_t(wo))
        out_b.append(np.asarray(state[f"{q}.out_proj.bias"], dtype=np.float32))
        cbs.append(np.asarray(state[f"{q}.codebook.weight"], dtype=np.float32))
    return {
        "in_proj": {"kernel": np.stack(in_k), "bias": np.stack(in_b)},
        "out_proj": {"kernel": np.stack(out_k), "bias": np.stack(out_b)},
        "codebook": np.stack(cbs),
    }


def convert_dac_state(state: Mapping[str, np.ndarray],
                      cfg: DACConfig | None = None) -> Dict:
    if cfg is None:
        cfg = DACConfig()

    # Encoder (autoencoder.py:903-929): block.0 conv_in, block.1..4
    # EncoderBlocks, block.5 snake, block.6 conv_out
    enc_blocks = []
    for bi, (stride, n_t) in enumerate(
            zip(cfg.encoder_rates, cfg.encoder_transformer_layers)):
        base = f"encoder.block.{bi + 1}.block"
        blk = {
            "res_units": [_residual_unit(state, f"{base}.{ri}")
                          for ri in range(3)],
            "snake": np.asarray(state[f"{base}.3.alpha"],
                                dtype=np.float32).reshape(-1),
            "down": _conv(state, f"{base}.4.conv"),
        }
        if n_t:
            blk["transformer"] = _transformer(state, f"{base}.5", n_t)
        enc_blocks.append(blk)
    n_enc = len(cfg.encoder_rates)
    encoder = {
        "conv_in": _conv(state, "encoder.block.0.conv"),
        "blocks": enc_blocks,
        "snake_out": np.asarray(state[f"encoder.block.{n_enc + 1}.alpha"],
                                dtype=np.float32).reshape(-1),
        "conv_out": _conv(state, f"encoder.block.{n_enc + 2}.conv"),
    }

    # Decoder (autoencoder.py:971-998): model.0 conv_in, model.1..4 blocks,
    # model.5 snake, model.6 conv_out, model.7 tanh
    dec_blocks = []
    for bi in range(len(cfg.decoder_rates)):
        base = f"decoder.model.{bi + 1}.block"
        dec_blocks.append({
            "snake": np.asarray(state[f"{base}.0.alpha"],
                                dtype=np.float32).reshape(-1),
            "up": _conv(state, f"{base}.1.conv"),
            "res_units": [_residual_unit(state, f"{base}.{ri + 2}")
                          for ri in range(3)],
        })
    n_dec = len(cfg.decoder_rates)
    decoder = {
        "conv_in": _conv(state, "decoder.model.0.conv"),
        "blocks": dec_blocks,
        "snake_out": np.asarray(state[f"decoder.model.{n_dec + 1}.alpha"],
                                dtype=np.float32).reshape(-1),
        "conv_out": _conv(state, f"decoder.model.{n_dec + 2}.conv"),
    }

    # Quantizer (autoencoder.py:376-496)
    down, up = [], []
    for i in range(len(cfg.downsample_factor)):
        down.append({
            "conv": _conv(state, f"quantizer.downsample.{i}.0.conv",
                          weight_norm=False),
            "convnext": _convnext(state, f"quantizer.downsample.{i}.1"),
        })
        up.append({
            "convt": _conv(state, f"quantizer.upsample.{i}.0.conv",
                           weight_norm=False),
            "convnext": _convnext(state, f"quantizer.upsample.{i}.1"),
        })
    qcfg = cfg.quantizer_transformer_config()
    quantizer = {
        "downsample": down,
        "upsample": up,
        "pre": _transformer(state, "quantizer.pre_module", qcfg.n_layer),
        "post": _transformer(state, "quantizer.post_module", qcfg.n_layer),
        "semantic": _vq_stack(state, "quantizer.semantic_quantizer", 1),
        "residual": _vq_stack(state, "quantizer.quantizer", cfg.n_codebooks),
    }

    import jax
    import jax.numpy as jnp

    params = {"encoder": encoder, "decoder": decoder, "quantizer": quantizer}
    return jax.tree.map(
        lambda a: jnp.asarray(a) if a is not None else None, params,
        is_leaf=lambda a: a is None)


def convert_pca_state(components: np.ndarray, mean: np.ndarray,
                      latent_scale) -> Dict:
    """PCAState (reference: inference.py:86-99).

    `latent_scale` may be a python float or a 0-d/size-1 array (checkpoint
    files store it as a tensor; `float()` on an ndim>0 array is a NumPy
    deprecation headed for an error)."""
    import jax.numpy as jnp

    return {
        "components": jnp.asarray(components, dtype=jnp.float32),
        "mean": jnp.asarray(mean, dtype=jnp.float32),
        "latent_scale": float(np.asarray(latent_scale).reshape(-1)[0]),
    }


def load_dac_from_safetensors(path: str, cfg: DACConfig | None = None) -> Dict:
    from safetensors import safe_open

    state = {}
    with safe_open(path, framework="np") as f:
        for key in f.keys():
            state[key] = f.get_tensor(key)
    return convert_dac_state(state, cfg)
