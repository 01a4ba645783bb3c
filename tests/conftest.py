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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session's sitecustomize registers the axon (TPU) PJRT plugin and forces
# jax_platforms=axon; override back to CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
