"""Fused W8A8 matmul Pallas kernel — a MEASURED NEGATIVE RESULT, kept
as the reproducible experiment behind docs/PERFORMANCE.md §11.

Hypothesis: XLA's int8 lowering delivers only ~1.3-1.4x over bf16 on the
v5e (vs the datasheet's 2x int8 peak), so a kernel that keeps the whole
contraction row (bm, K) and weight panel (K, bn) in VMEM, computes the
row abs-max exactly (the block spans all of K), quantizes on the VPU and
issues one int8 MXU dot per tile might close the gap.

Measured (examples/bench_int8.py, 24-layer scans, best tiling bm=384):
the kernel runs at 0.99x (MLP shapes) to 1.11x (square projections) of
bf16 — SLOWER than XLA's own w8a8 lowering (1.29-1.39x), while matching
it bit-for-bit on the int32 accumulator.  XLA pipelines the quantize +
dot + rescale across the layer scan better than this single-dot-per-tile
schedule; production (ops/quant.int8_dot) therefore stays on the XLA
path, and this kernel is NOT wired into qdot.

Inference-only: no custom VJP (quantized serving never differentiates).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_block(dim: int, candidates) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


def supported(m: int, k: int, n: int) -> bool:
    """Shapes the kernel handles: every axis tiles onto the MXU/VPU
    without padding logic (the DiT hot-loop shapes all qualify)."""
    return (_pick_block(m, (512, 384, 320, 256, 128)) > 0
            and k % 128 == 0
            and _pick_block(n, (512, 256, 128)) > 0)


def _kernel(x_ref, w_ref, ws_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)                       # (bm, K)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)     # exact: full K
    x_scale = jnp.maximum(amax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # (bm, bn)
    out_ref[:] = (acc.astype(jnp.float32) * x_scale
                  * ws_ref[:].astype(jnp.float32))


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "interpret"))
def _call(x2d, w8, w_scale, block_m, block_n, interpret):
    m, k = x2d.shape
    n = w8.shape[1]
    grid = (m // block_m, n // block_n)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        interpret=interpret,
    )(x2d, w8, w_scale[None, :])
    return out


def int8_matmul_fused(x: jnp.ndarray, w8: jnp.ndarray, w_scale: jnp.ndarray,
                      *, block_m: int = 0, block_n: int = 0,
                      interpret: bool = False,
                      out_dtype=None) -> jnp.ndarray:
    """x @ dequant(w8) with in-kernel dynamic activation quantization.

    x: (..., K) float; w8: (K, N) int8; w_scale: (N,) f32.  Leading axes
    are flattened into rows.  Caller must check `supported()` first.
    """
    if out_dtype is None:
        out_dtype = x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2d = x.reshape(-1, k)
    m, n = x2d.shape[0], w8.shape[1]
    bm = block_m or _pick_block(m, (512, 384, 320, 256, 128))
    bn = block_n or _pick_block(n, (512, 256, 128))
    if not bm or not bn or k % 128:
        raise ValueError(f"unsupported W8A8 kernel shape m={m} k={k} n={n}")
    out = _call(x2d, w8, w_scale, bm, bn, interpret)
    return out.reshape(*lead, n).astype(out_dtype)
