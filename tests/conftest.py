"""Test config: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (the standard JAX pattern for testing pjit/shard_map
without a TPU pod)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the session presets axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
# Persistent compile cache: repeat suite runs skip XLA compilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_repo, ".jax_cache_cpu"))

# The session's sitecustomize registers the axon (TPU) PJRT plugin and forces
# jax_platforms=axon; override back to CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The sitecustomize imports jax before conftest, so the env var alone
# never reaches jax's config snapshot — set the cache dir explicitly
# (without this the persistent cache is silently disabled and every
# suite run recompiles everything).
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop live jitted executables at module boundaries.

    One pytest process compiles ~200 programs over the suite; keeping
    every executable alive accumulates mappings/heap until late, large
    allocations (the train-loop compile, orbax host transfers) segfault
    inside XLA/zstd on this 1-CPU box.  Retraces after a clear are cheap:
    the persistent compile cache serves the recompiles from disk.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def tiny_models():
    """One tiny random-weight EchoModels bundle shared across test files
    (fp32 for CPU parity)."""
    from echo_tts_tpu.config import tiny_dac_config, tiny_dit_config
    from echo_tts_tpu.models.dac.init import (init_dac_params,
                                              init_pca_params)
    from echo_tts_tpu.models.dit import init_dit_params
    from echo_tts_tpu.pipeline.pipeline import EchoModels

    dit_cfg = tiny_dit_config()
    dac_cfg = tiny_dac_config()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return EchoModels(
        dit_params=init_dit_params(k1, dit_cfg, dtype=jnp.float32),
        dit_cfg=dit_cfg,
        dac_params=init_dac_params(k2, dac_cfg, dtype=jnp.float32),
        dac_cfg=dac_cfg,
        pca=init_pca_params(k3, dit_cfg.latent_size, dac_cfg.latent_dim),
        dtype=jnp.float32)
