"""Multi-host (DCN) skeleton, CPU-simulated: two local processes join a
jax.distributed cluster over localhost, build the global (data, model)
mesh with the model axis confined to each process's devices, and run a
jit-sharded computation whose result must agree across processes.

This is the offline stand-in for a two-host TPU pod
(echo_tts_tpu/parallel/distributed.py launch recipe).
"""
import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
import numpy as np
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from echo_tts_tpu.parallel import distributed as dist

assert dist.initialize_from_env()
assert jax.process_count() == 2
assert jax.device_count() == 8          # 2 procs x 4 virtual devices

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = dist.global_mesh(tp=2)           # dp=4 across procs, tp=2 in-proc
assert dict(mesh.shape) == {"data": 4, "model": 2}

sl = dist.process_local_batch_slice(8)
full = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
local = full[sl]
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data", None)), local, full.shape)

w = jnp.ones((16, 4), jnp.float32)
out = jax.jit(
    lambda x, w: jnp.sum(x @ w),
    out_shardings=NamedSharding(mesh, P()))(arr, w)
got = float(out)
expect = float(full.sum() * 4)
assert abs(got - expect) < 1e-3, (got, expect)
print("DIST_OK", got)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_cluster(tmp_path):
    port = _free_port()
    env_base = dict(os.environ)
    env_base.pop("XLA_FLAGS", None)
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env_base["ECHO_COORD"] = f"127.0.0.1:{port}"
    env_base["ECHO_NUM_PROCS"] = "2"
    env_base["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for pid in (0, 1):
        env = dict(env_base)
        env["ECHO_PROC_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "DIST_OK" in out
