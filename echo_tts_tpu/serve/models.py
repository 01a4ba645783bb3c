"""Lazy model loading + caching for the serving worker.

The reference caches models in a module-global dict with per-phase load
timers (reference: handler.py:320-423).  Here the bundle is an
`EchoModels` pytree; weights come from converted safetensors in
`ECHO_MODEL_DIR` (tools/convert.py, tools/convert_dac.py) or — for
development and benchmarks — random initialization.
"""
from __future__ import annotations

import logging
import os
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import base_dac_config, base_dit_config
from ..pipeline.pipeline import EchoModels

log = logging.getLogger("echo_tts_tpu.serve")

_CACHE_LOCK = threading.Lock()
_MODELS: Optional[EchoModels] = None
_MODELS_KEY = None  # (model_dir, dtype_name, random) of the cached bundle

DIT_WEIGHTS = "pytorch_model.safetensors"
DAC_WEIGHTS = "fish_ae.safetensors"
PCA_WEIGHTS = "pca_state.safetensors"


def _serving_dac_config():
    """base_dac_config with the decoder's polynomial fast snake
    (config.py:DACConfig.snake_approx; 180 -> 114 ms decode on a v5e).

    Default: ON exactly when the codec runs bf16 (accelerators — the
    reference's own production dtype, handler.py:345,381): the polynomial's
    1.6e-6 error is ~100x below bf16 rounding, so outputs round to the
    same bf16 values the exact sin produces.  On CPU the codec is fp32
    (parity) and stays exact.  ECHO_SNAKE_APPROX=0/1 overrides."""
    import dataclasses
    env = os.environ.get("ECHO_SNAKE_APPROX")
    if env is None:
        approx = jax.default_backend() != "cpu"
    else:
        approx = env.lower() in ("1", "true", "yes")
    cfg = base_dac_config()
    return dataclasses.replace(cfg, snake_approx=approx) if approx else cfg


def _is_bundle_checkpoint(model_dir: str) -> bool:
    """True for an orbax EchoModels bundle (tools/checkpoint.py layout:
    config.json + params/) as opposed to reference-format safetensors."""
    return (os.path.isfile(os.path.join(model_dir, "config.json"))
            and os.path.isdir(os.path.join(model_dir, "params")))


def _load_from_dir(model_dir: str, dtype) -> EchoModels:
    # Orbax bundle checkpoints load directly — this is how a DISTILLED
    # student (train/recipe.py) or any framework-trained model reaches
    # serving without a detour through the reference's safetensors format.
    # The bundle carries its own configs (incl. snake_approx as saved).
    if _is_bundle_checkpoint(model_dir):
        from ..tools.checkpoint import load_checkpoint
        t0 = time.time()
        bundle = load_checkpoint(model_dir, dtype=dtype)
        log.info("loaded orbax bundle in %.1fs", time.time() - t0)
        return bundle

    from safetensors import safe_open

    from ..tools.convert import load_dit_from_safetensors
    from ..tools.convert_dac import convert_pca_state, load_dac_from_safetensors

    dit_cfg = base_dit_config()
    dac_cfg = _serving_dac_config()

    t0 = time.time()
    dit_params = load_dit_from_safetensors(
        os.path.join(model_dir, DIT_WEIGHTS), dit_cfg, dtype=dtype)
    log.info("loaded DiT weights in %.1fs", time.time() - t0)

    t0 = time.time()
    dac_params = load_dac_from_safetensors(
        os.path.join(model_dir, DAC_WEIGHTS), dac_cfg)
    dac_dtype = _dac_serving_dtype()
    dac_params = jax.tree.map(lambda a: a.astype(dac_dtype), dac_params)
    log.info("loaded S1-DAC weights in %.1fs", time.time() - t0)

    with safe_open(os.path.join(model_dir, PCA_WEIGHTS),
                   framework="np") as f:
        pca = convert_pca_state(
            f.get_tensor("pca_components"), f.get_tensor("pca_mean"),
            f.get_tensor("latent_scale"))

    return EchoModels(dit_params=dit_params, dit_cfg=dit_cfg,
                      dac_params=dac_params, dac_cfg=dac_cfg, pca=pca,
                      dtype=dtype)


def _dac_serving_dtype():
    """bf16 codec on accelerators, fp32 on CPU — the reference's production
    dtype selection (handler.py:345,381)."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def _dit_quant_mode() -> str:
    """ECHO_DIT_QUANT: 'none' (default, reference-parity bf16) or 'int8'
    (W8A8 dynamic quantization of the DiT hot loop, ops/quant.py).

    int8 is an opt-in NON-PARITY serving mode — the reference has no
    quantization support (its production dtype is bf16, handler.py:345);
    on a v5e the int8 MXU path roughly doubles matmul throughput.  The
    mode only changes the parameter tree; every downstream code path
    (samplers, streaming, batching) is identical."""
    mode = os.environ.get("ECHO_DIT_QUANT", "none").lower()
    if mode in ("", "0", "none", "bf16"):
        return "none"
    if mode == "int8":
        return "int8"
    raise ValueError(f"ECHO_DIT_QUANT={mode!r}: expected 'none' or 'int8'")


def _random_models(dtype) -> EchoModels:
    from ..models.dac.init import init_dac_params, init_pca_params
    from ..models.dit import init_dit_params

    dit_cfg = base_dit_config()
    dac_cfg = _serving_dac_config()
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    return EchoModels(
        dit_params=init_dit_params(k1, dit_cfg, dtype=dtype),
        dit_cfg=dit_cfg,
        dac_params=init_dac_params(k2, dac_cfg, dtype=_dac_serving_dtype()),
        dac_cfg=dac_cfg,
        pca=init_pca_params(k3, dit_cfg.latent_size, dac_cfg.latent_dim),
        dtype=dtype)


def load_models(model_dir: Optional[str] = None,
                dtype=jnp.bfloat16,
                allow_random: bool = False) -> EchoModels:
    """Load (once) and cache the model bundle
    (reference: handler.py:323-423).  A later call with a DIFFERENT
    model_dir/dtype raises rather than silently serving the cached bundle;
    call clear_models() to swap."""
    global _MODELS, _MODELS_KEY
    use_random = not (model_dir and os.path.isdir(model_dir))
    quant_mode = _dit_quant_mode()
    key = (None if use_random else model_dir, jnp.dtype(dtype).name,
           use_random, quant_mode)
    with _CACHE_LOCK:
        if _MODELS is not None:
            if key != _MODELS_KEY:
                raise RuntimeError(
                    f"models already loaded with {_MODELS_KEY}; refusing to "
                    f"silently serve them for {key} — call clear_models() "
                    "first")
            return _MODELS
        t0 = time.time()
        if not use_random:
            _MODELS = _load_from_dir(model_dir, dtype)
        elif allow_random:
            log.warning("no ECHO_MODEL_DIR: using RANDOM weights (dev mode)")
            _MODELS = _random_models(dtype)
        else:
            raise FileNotFoundError(
                f"model dir not found: {model_dir!r}; set ECHO_MODEL_DIR to "
                "a directory with converted safetensors, or pass "
                "allow_random=True for development")
        if quant_mode == "int8":
            import dataclasses

            from ..ops.quant import quantize_dit_params
            log.warning("ECHO_DIT_QUANT=int8: serving the W8A8 DiT "
                        "(non-parity mode; see docs/PERFORMANCE.md)")
            _MODELS = dataclasses.replace(
                _MODELS, dit_params=quantize_dit_params(_MODELS.dit_params))
        _MODELS_KEY = key
        log.info("models ready in %.1fs", time.time() - t0)
        return _MODELS


def models_loaded() -> bool:
    return _MODELS is not None


def served_quant_mode() -> str:
    """The quant mode of the DiT actually being served: derived from the
    LOADED bundle's parameter tree when one exists (the env var can change
    after load, or a bundle can be injected directly — health must report
    what runs, not what the environment says); falls back to the
    ECHO_DIT_QUANT env var before any load."""
    with _CACHE_LOCK:
        m = _MODELS
    if m is None:
        return _dit_quant_mode()
    from ..ops.quant import dit_params_are_quantized
    return "int8" if dit_params_are_quantized(m.dit_params) else "none"


def clear_models() -> None:
    global _MODELS, _MODELS_KEY
    with _CACHE_LOCK:
        _MODELS = None
        _MODELS_KEY = None
    # Voice latents are only valid for the encoder that produced them;
    # a freed bundle's id() can also be reused by a future bundle, so the
    # voice cache must not outlive the models singleton.
    from . import handler as _handler
    _handler.clear_voice_cache()
