"""Fused decoder residual-stack Pallas kernel.

A DecoderBlock's tail is three dilated residual units
(reference: autoencoder.py:879-900):

    for d in (1, 3, 9):  x += conv_k1(snake(conv_k7_dil_d(snake(x))))

At the decoder's late stages (C∈{192, 96}, L up to 1.3M frames) the XLA
path is bandwidth-bound: each k7 conv is 7 shifted-slice matmuls, each
re-reading the full activation from HBM (~250 MB per pass).  This kernel
runs the WHOLE three-unit chain per L-tile in VMEM: the activation is read
once and written once; the 78-frame left context each tile needs
(6·(1+3+9)) arrives as a second, precomputed halo input — no manual DMA,
no overlapping BlockSpecs.

Causal-exactness: a zero halo equals the one-shot causal left pad, and a
halo of the true previous frames makes tile outputs bit-equal to the
one-shot op (each unit's conv zero-pads inside the extended buffer; the
frames whose receptive field would cross the buffer start are exactly the
halo region, which is trimmed from the output).

Weights for all three units stay resident in VMEM, so the kernel is only
used for C ≤ 384 (3·(7+1)·C²·2 B ≤ 7.1 MB); the wide early stages are
small enough (L ≤ 20k frames) that the XLA path is already fine.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..activations import sin2_poly
from .joint_attention import LANE, _round_up

# Canonical dilation schedule of the codec's residual units
# (reference: autoencoder.py:887-891); models/dac re-exports this.
DILATIONS = (1, 3, 9)


def _halo_width(dilations: Sequence[int]) -> int:
    return 6 * sum(dilations)


def res_stack_eligible(length: int, c: int) -> bool:
    """Auto-dispatch guard: single real accelerator, a bandwidth-bound
    length, and all three units' weights resident in VMEM (C <= 384).
    Multi-device processes fall back to XLA — GSPMD cannot partition a
    Mosaic kernel on its own, and unlike the attention kernel (which has
    fused_joint_attention_sharded) no shard_map wrapper exists here yet;
    codec decode on meshes is rare enough that the XLA path suffices."""
    return (c <= 384 and length >= 4096
            and jax.default_backend() != "cpu"
            and jax.device_count() == 1)


def _res_stack_kernel(x_ref, halo_ref, a1_ref, w1_ref, b1_ref, a2_ref,
                      w2_ref, b2_ref, out_ref, *, dilations, halo,
                      approx_snake=False):
    """One L-tile: run the 3-unit chain on [halo | tile] in VMEM.

    Tile i>0's halo holds the true 78 preceding input frames, so every
    unit's halo-region output is the true preceding output (valid with a
    margin that shrinks by 6·d per unit — exactly 0 left after the last).
    Tile 0 has no preceding frames: the one-shot op zero-pads EVERY conv
    at the sequence start, so the halo region must be forced back to zero
    after each unit (a bias/snake of zeros is not zero)."""
    first = pl.program_id(0) == 0
    buf = jnp.concatenate([halo_ref[0], x_ref[...]], axis=0)
    n = buf.shape[0]
    in_halo = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) < halo

    def snake_f32(v, alpha):
        # Mosaic has no bf16 sin lowering; compute in f32 and cast back
        # (XLA's bf16 sin upcasts internally too).  approx_snake swaps the
        # sin for the range-reduced polynomial (conv.py:sin2_poly twin;
        # static flag, resolved at trace time).
        vf = v.astype(jnp.float32)
        af = alpha.astype(jnp.float32)
        z = af * vf
        if approx_snake:
            s2 = sin2_poly(z)
        else:
            s2 = jnp.square(jnp.sin(z))
        return (vf + (1.0 / (af + 1e-9)) * s2).astype(v.dtype)

    for u, dil in enumerate(dilations):
        y = snake_f32(buf, a1_ref[u])
        pad = 6 * dil
        ypad = jnp.concatenate(
            [jnp.zeros((pad, y.shape[1]), y.dtype), y], axis=0)
        z = jax.lax.dot_general(
            ypad[0:n], w1_ref[u, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for k in range(1, 7):
            z = z + jax.lax.dot_general(
                ypad[k * dil:k * dil + n], w1_ref[u, k],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        z = (z + b1_ref[u]).astype(buf.dtype)
        z = snake_f32(z, a2_ref[u])
        z = (jax.lax.dot_general(
            z, w2_ref[u], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + b2_ref[u]).astype(buf.dtype)
        buf = buf + z
        buf = jnp.where(jnp.logical_and(first, in_halo),
                        jnp.zeros_like(buf), buf)

    out_ref[...] = buf[halo:]


@functools.partial(jax.jit,
                   static_argnames=("block_l", "interpret", "approx_snake"))
def _run(x, halo_arr, a1, w1, b1, a2, w2, b2, *, block_l, interpret,
         approx_snake=False):
    n_tiles = x.shape[0] // block_l
    c = x.shape[1]
    halo = halo_arr.shape[1]
    kern = functools.partial(_res_stack_kernel, dilations=DILATIONS,
                             halo=halo, approx_snake=approx_snake)
    return pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((block_l, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, halo, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(a1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(a2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_l, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], c), x.dtype),
        interpret=interpret,
    )(x, halo_arr, a1, w1, b1, a2, w2, b2)


def _auto_block_l(c_pad: int) -> int:
    """Tile length fitting the ~16 MB scoped-VMEM budget: resident weights
    3·8·C²·2 B plus ~26 B per frame-channel of live chain buffers
    (measured from Mosaic's allocation report at C=384)."""
    weights = 3 * 8 * c_pad * c_pad * 2
    budget = 13 * 1024 * 1024 - weights
    frames = budget // (26 * c_pad) - 2 * _halo_width(DILATIONS)
    return max(256, min(2048, int(frames) // 256 * 256))


def fused_res_stack(units: Sequence[dict], x: jnp.ndarray, *,
                    block_l: int | None = None,
                    interpret: bool = False,
                    approx_snake: bool = False) -> jnp.ndarray:
    """Apply the three dilated residual units to x (B, L, C).

    units: the DecoderBlock's `res_units` param list — [{snake1,
    conv1{kernel (7,C,C), bias}, snake2, conv2{kernel (1,C,C), bias}}]
    with dilations (1, 3, 9) (models/dac/dac.py:DILATIONS).
    """
    b, length, c = x.shape
    halo = _halo_width(DILATIONS)
    c_pad = _round_up(c, LANE)
    if block_l is None:
        block_l = _auto_block_l(c_pad)

    # Keep parameter dtypes — the chain's arithmetic then matches the XLA
    # path op-for-op (snake in param dtype, matmuls with f32 accumulation).
    a1 = jnp.stack([u["snake1"] for u in units])
    w1 = jnp.stack([u["conv1"]["kernel"] for u in units])
    b1 = jnp.stack([u["conv1"]["bias"] for u in units])
    a2 = jnp.stack([u["snake2"] for u in units])
    w2 = jnp.stack([u["conv2"]["kernel"][0] for u in units])
    b2 = jnp.stack([u["conv2"]["bias"] for u in units])
    if c_pad != c:
        a1 = jnp.pad(a1, ((0, 0), (0, c_pad - c)))
        b1 = jnp.pad(b1, ((0, 0), (0, c_pad - c)))
        a2 = jnp.pad(a2, ((0, 0), (0, c_pad - c)))
        b2 = jnp.pad(b2, ((0, 0), (0, c_pad - c)))
        w1 = jnp.pad(w1, ((0, 0), (0, 0), (0, c_pad - c), (0, c_pad - c)))
        w2 = jnp.pad(w2, ((0, 0), (0, c_pad - c), (0, c_pad - c)))

    block_l = min(block_l, _round_up(length, 8))
    l_pad = _round_up(length, block_l)
    n_tiles = l_pad // block_l

    def one(xb):  # (L, C) -> (L, C)
        xp = jnp.pad(xb, ((0, l_pad - length), (0, c_pad - c)))
        # halo[i] = 78 frames preceding tile i (zeros before the start —
        # identical to the one-shot causal left pad)
        xh = jnp.pad(xp, ((halo, 0), (0, 0)))
        idx = (jnp.arange(n_tiles) * block_l)[:, None] + jnp.arange(halo)
        halo_arr = xh[idx]  # (n_tiles, halo, C)
        out = _run(xp, halo_arr, a1, w1, b1, a2, w2, b2,
                   block_l=block_l, interpret=interpret,
                   approx_snake=approx_snake)
        return out[:length, :c]

    # Batch loops in python (B is 1 or tiny) — vmap over pallas_call would
    # prepend a grid dim and shift the kernel's program_id(0) tile index.
    return jnp.stack([one(x[i]) for i in range(b)])
