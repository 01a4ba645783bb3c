"""Microbenchmark: int8 (W8A8) vs bf16 matmuls at DiT hot-loop shapes.

Decision gate for the opt-in quantized serving mode (ops/quant.py): the
v5e datasheet says int8 MXU peak is ~2x bf16, but what matters is what
this stack (jax -> XLA -> axon PJRT) delivers on the real chip with the
dynamic-activation-quant overhead included.  Times a 24-layer scan of
the DiT's SwiGLU MLP (3 matmuls/layer, 2048->5888->2048 -- ~55% of the
sampler's quantizable FLOPs) and of the 5 attention projections, at the
CFG-on row count (G*B=3, S=640 -> 1920 rows):

  * bf16        : x @ w, both bf16 (today's serving path)
  * w8a8        : ops/quant.int8_dot -- int8 weights, dynamic per-row
                  int8 activations, int32 MXU accumulate (the real recipe)
  * int8-pure   : pre-quantized int8 @ int8 (MXU ceiling, no quant VPU work)
  * w8-dequant  : int8 weights dequantized to bf16 then bf16 matmul
                  (what weight-only quant would buy: memory, not FLOPs)

Whole scans run inside one jit (per-dispatch tunnel floor ~25 ms), timed
by scalar-checksum barrier, median of n.  Also prints the w8a8-vs-f32
relative error so the speed table carries its accuracy context.

Usage: python examples/bench_int8.py
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

from echo_tts_tpu.ops.pallas.int8_matmul import (  # noqa: E402
    int8_matmul_fused)
from echo_tts_tpu.ops.quant import (  # noqa: E402
    dequantize_weight, int8_dot, quantize_weight_int8)

L = 24          # layers
M = 3 * 640     # CFG-on rows (G*B=3, S=640)
D = 2048        # model size
F = 5888        # intermediate size
REPEAT = 4      # outer scan repeats inside one program


def _mlp_flops() -> float:
    return 2.0 * M * D * F * 3 * L * REPEAT


def _proj_flops() -> float:
    return 2.0 * M * D * D * 5 * L * REPEAT


def _time(fn, *args, n=5):
    out = fn(*args)
    np.asarray(jnp.sum(out.astype(jnp.float32)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jnp.sum(out.astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _scan_mlp(mm):
    """24-layer SwiGLU scan, repeated REPEAT times, one jit."""
    def run(h, ws):
        def layer(h, w):
            y = (jax.nn.silu(mm(h, w["w1"])) * mm(h, w["w3"]))
            return (h + mm(y, w["w2"])).astype(h.dtype), None

        def rep(h, _):
            h, _ = jax.lax.scan(layer, h, ws)
            return h, None

        h, _ = jax.lax.scan(rep, h, None, length=REPEAT)
        return h
    return jax.jit(run)


def _scan_proj(mm):
    """24-layer x 5 square-projection scan (wq/wk/wv/gate/wo shapes)."""
    def run(h, ws):
        def layer(h, w):
            acc = h
            for k in ("p0", "p1", "p2", "p3", "p4"):
                acc = acc + mm(h, w[k])
            return (acc / 6.0).astype(h.dtype), None

        def rep(h, _):
            h, _ = jax.lax.scan(layer, h, ws)
            return h, None

        h, _ = jax.lax.scan(rep, h, None, length=REPEAT)
        return h
    return jax.jit(run)


def _bf16(x, w):
    return x @ w


def _w8a8(x, w):
    return int8_dot(x, w["q8"], w["s"])


def _int8_pure(x, w):
    acc = jax.lax.dot_general(
        x, w["q8"], dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # bf16 cast keeps the chain numerically bounded across repeats
    return (acc.astype(jnp.float32) * (1.0 / (127.0 * 127.0))
            ).astype(jnp.bfloat16)


def _w8_dequant(x, w):
    return x @ dequantize_weight(w, jnp.bfloat16)


def _w8a8_pallas(bm=0):
    def mm(x, w):
        return int8_matmul_fused(x, w["q8"], w["s"], block_m=bm)
    return mm


def _mk_weights(key, shapes):
    ks = jax.random.split(key, len(shapes))
    bf16 = {name: (jax.random.normal(k, (L,) + shp, jnp.float32)
                   / np.sqrt(shp[0])).astype(jnp.bfloat16)
            for k, (name, shp) in zip(ks, shapes.items())}
    q8 = {name: quantize_weight_int8(w) for name, w in bf16.items()}
    q8_pure = {name: {"q8": q["q8"]} for name, q in q8.items()}
    return bf16, q8, q8_pure


def _report(tag, flops, ws_bf16, ws_q8, ws_pure, scan_builder, h):
    rows = []
    t = _time(scan_builder(_bf16), h, ws_bf16)
    rows.append(("bf16", t))
    t = _time(scan_builder(_w8a8), h, ws_q8)
    rows.append(("w8a8 (dyn act)", t))
    hq = jnp.clip(jnp.round(h.astype(jnp.float32) * 16), -127, 127
                  ).astype(jnp.int8)
    t = _time(scan_builder(_int8_pure), hq, ws_pure)
    rows.append(("int8 pure", t))
    t = _time(scan_builder(_w8_dequant), h, ws_q8)
    rows.append(("w8 dequant->bf16", t))
    for bm in (384, 320, 128):
        t = _time(scan_builder(_w8a8_pallas(bm)), h, ws_q8)
        rows.append((f"w8a8 pallas bm={bm}", t))

    base = rows[0][1]
    print(f"\n### {tag}  ({flops/1e12:.2f} TFLOP per program)")
    print("| variant | time | TFLOP/s | vs bf16 |")
    print("|---|---|---|---|")
    for name, tt in rows:
        print(f"| {name} | {1e3*tt:7.1f} ms | {flops/tt/1e12:6.1f} "
              f"| {base/tt:4.2f}x |")


def main():
    print(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    h = (jax.random.normal(key, (M, D), jnp.float32)).astype(jnp.bfloat16)

    mlp_shapes = {"w1": (D, F), "w3": (D, F), "w2": (F, D)}
    ws, q8, q8p = _mk_weights(jax.random.PRNGKey(1), mlp_shapes)
    _report("SwiGLU MLP 2048->5888->2048, 24 layers x 4",
            _mlp_flops(), ws, q8, q8p, _scan_mlp, h)

    proj_shapes = {f"p{i}": (D, D) for i in range(5)}
    ws, q8, q8p = _mk_weights(jax.random.PRNGKey(2), proj_shapes)
    _report("5x (2048->2048) projections, 24 layers x 4",
            _proj_flops(), ws, q8, q8p, _scan_proj, h)

    # accuracy context: single-layer w8a8 vs f32, typical activations
    wf = jax.random.normal(jax.random.PRNGKey(3), (D, F),
                           jnp.float32) / np.sqrt(D)
    q = quantize_weight_int8(wf)
    x = jax.random.normal(jax.random.PRNGKey(4), (M, D), jnp.float32)
    ref = x @ wf
    got = int8_dot(x, q["q8"], q["s"], out_dtype=jnp.float32)
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    bf = (x.astype(jnp.bfloat16) @ wf.astype(jnp.bfloat16)).astype(
        jnp.float32)
    rel_bf = float(jnp.linalg.norm(bf - ref) / jnp.linalg.norm(ref))
    print(f"\nsingle-matmul relative error vs f32: w8a8 {rel:.2e} "
          f"(bf16 baseline {rel_bf:.2e})")
    got_k = int8_matmul_fused(x, q["q8"], q["s"], out_dtype=jnp.float32)
    dk = float(jnp.max(jnp.abs(got_k - got)))
    print(f"pallas kernel vs XLA w8a8 max abs diff: {dk:.2e}")


if __name__ == "__main__":
    main()
