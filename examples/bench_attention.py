"""Microbenchmark: joint-attention kernel variants on the real chip.

Times one full 24-layer-equivalent call (grid (GB, H)) of
  * the whole-row Pallas kernel (ops/pallas/joint_attention.py:_kernel)
  * the blocked flash variant at several (block_q, block_kv) tilings
  * the XLA einsum path
at the published head count/dim over a sweep of (S, T, GB) shapes,
including the long-utterance shapes (S >= 1280) where the whole-row
(S, T) logits no longer fit VMEM and auto-dispatch takes the flash path.

Usage:  python examples/bench_attention.py
Writes a markdown table to stdout (docs/PERFORMANCE.md §7 is generated
from this).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from echo_tts_tpu.ops.pallas.joint_attention import (  # noqa: E402
    _xla_attention, fits_vmem, fused_joint_attention)

H, DH = 16, 128          # published DiT head layout (config.py)
SM = 1.0 / np.sqrt(DH)


def _mk(s, t, gb, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    b = max(gb // 3, 1)
    q = jax.random.normal(ks[0], (gb, s, H, DH), jnp.bfloat16)
    k_self = jax.random.normal(ks[1], (gb, s, H, DH), jnp.bfloat16)
    v_self = jax.random.normal(ks[2], (gb, s, H, DH), jnp.bfloat16)
    k_st = jax.random.normal(ks[3], (b, t, H, DH), jnp.bfloat16)
    v_st = jax.random.normal(ks[4], (b, t, H, DH), jnp.bfloat16)
    mask = jnp.ones((gb, t), bool)
    return q, k_self, v_self, k_st, v_st, mask


def _time(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jnp.sum(out.astype(jnp.float32)))  # compile + barrier
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(ts))


def main():
    shapes = [(640, 2432, 3), (640, 2432, 24), (1280, 2432, 3),
              (2048, 2432, 3)]
    flash_tiles = [(256, 512), (512, 512), (256, 1024)]

    print("| S | T | GB | whole-row | "
          + " | ".join(f"flash {q}x{kv}" for q, kv in flash_tiles)
          + " | XLA |")
    print("|" + "---|" * (4 + len(flash_tiles) + 1))
    for s, t, gb in shapes:
        args = _mk(s, t, gb)
        row = [str(s), str(t), str(gb)]

        if fits_vmem(s, t, DH):
            wr = jax.jit(lambda *a: fused_joint_attention(
                *a, sm_scale=SM, flash=False))
            row.append(f"{_time(wr, *args):.1f} ms")
        else:
            row.append("over VMEM")

        for bq, bkv in flash_tiles:
            fl = jax.jit(lambda *a, bq=bq, bkv=bkv: fused_joint_attention(
                *a, sm_scale=SM, flash=True, block_q=bq, block_kv=bkv))
            row.append(f"{_time(fl, *args):.1f} ms")

        def xla(q, ks_, vs_, kt, vt, m):
            bias = jnp.where(m, 0.0, -1e30).astype(jnp.float32)
            cs = jnp.ones((1, t), jnp.float32)
            return _xla_attention(
                q.transpose(0, 2, 1, 3), ks_.transpose(0, 2, 1, 3),
                vs_.transpose(0, 2, 1, 3), kt.transpose(0, 2, 1, 3),
                vt.transpose(0, 2, 1, 3), bias, cs,
                sm_scale=SM).transpose(0, 2, 1, 3)

        row.append(f"{_time(jax.jit(xla), *args):.1f} ms")
        print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
