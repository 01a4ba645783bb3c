"""On-chip accept/reject measurement for int8 static-KV (VERDICT r4
item 5a; ops/quant.quantize_kv_int8).

The prefilled text+speaker KV is per-request constant and read by all 24
layers on each of the 40 sampler steps.  Int8 storage halves its HBM
footprint and read bandwidth; the dequant scales fold into the attention
column scales so no bf16 copy is ever materialized (the cast happens in
VMEM inside the Pallas kernel).  This script measures the 40-step
sampler wall time with bf16 vs int8 KV at:

  * B=1, 640-latent speaker (the headline shape) — expected ~neutral
    (KV reads are ~1% of the step's HBM traffic at B=1);
  * B=8, 6400-latent speaker (the HBM-heavy batch shape: 3.7 GB of KV
    bf16 -> 1.9 GB int8) — where both the bandwidth and capacity deltas
    actually show.

Prints one JSON line per configuration plus a summary; the accept/reject
verdict is recorded in docs/PERFORMANCE.md §13.

Run on the chip: python examples/bench_kv_quant.py [--long-speaker]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

SEQ = 640
TEXT_LEN = 768
NUM_STEPS = 40


def _mem_mb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return (round(stats["bytes_in_use"] / 2**20)
                if stats and "bytes_in_use" in stats else None)
    except Exception:
        return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--long-speaker", action="store_true",
                        help="use the 6400-latent speaker bucket for the "
                        "B=8 case (max KV; +HBM pressure)")
    parser.add_argument("--skip-b8", action="store_true")
    parser.add_argument("--w4a8", action="store_true",
                        help="also measure the W4A8 weight mode "
                        "(int4 weights, int8 activations) at B=1 against "
                        "bf16 and W8A8 — VERDICT r4 item 5b")
    args = parser.parse_args()

    from echo_tts_tpu.config import base_dit_config
    from echo_tts_tpu.models import dit
    from echo_tts_tpu.models.dit import init_dit_params
    from echo_tts_tpu.ops.quant import quantize_kv_int8
    from echo_tts_tpu.sampler.euler import (build_step_plan,
                                            make_cfg_branch_masks,
                                            run_step_segments)

    cfg = base_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    plan = build_step_plan(NUM_STEPS, 0.5, 1.0, None, None, None, None)

    def sampler_fn(quant):
        @jax.jit
        def run(params, kv_static, spk_cols, text_mask, speaker_mask,
                noise):
            mask_cfg, mask_plain = make_cfg_branch_masks(
                cfg, text_mask, speaker_mask)
            latents = run_step_segments(
                params, cfg, noise.astype(jnp.float32), plan, kv_static,
                spk_cols, mask_cfg, mask_plain, cfg_scale_text=3.0,
                cfg_scale_speaker=8.0, speaker_kv_max_layers=None,
                dtype=jnp.bfloat16)
            return latents, jnp.sum(latents)
        return run

    run_bf16 = sampler_fn(False)
    results = []

    def measure(b, spk_len):
        ki = jax.random.split(jax.random.PRNGKey(1), 4)
        text_ids = jax.random.randint(ki[0], (b, TEXT_LEN), 0, 256,
                                      jnp.int32)
        text_mask = jnp.tile(jnp.arange(TEXT_LEN)[None, :] < 200, (b, 1))
        spk_lat = jax.random.normal(ki[1], (b, spk_len, cfg.latent_size),
                                    jnp.float32)
        spk_mask = jnp.ones((b, spk_len), bool)
        noise = jax.random.normal(ki[2], (b, SEQ, cfg.latent_size),
                                  jnp.float32)

        @jax.jit
        def prefill(params, text_ids, text_mask, spk_lat):
            kv_text = dit.get_kv_cache_text(params, cfg, text_ids,
                                            text_mask)
            kv_speaker = dit.get_kv_cache_speaker(
                params, cfg, spk_lat.astype(jnp.bfloat16))
            return dit.concat_static_kv(cfg, kv_text, kv_speaker)

        kv_static, spk_cols = prefill(params, text_ids, text_mask, spk_lat)
        jax.block_until_ready(kv_static)
        kv_bytes_bf16 = sum(a.nbytes for a in kv_static)

        def timed(run, kv):
            lat, chk = run(params, kv, spk_cols, text_mask, spk_mask,
                           noise)
            np.asarray(chk)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                _, chk = run(params, kv, spk_cols, text_mask, spk_mask,
                             noise)
                np.asarray(chk)
                ts.append(time.perf_counter() - t0)
            return 1e3 * float(np.median(ts))

        bf16_ms = timed(run_bf16, kv_static)

        @jax.jit
        def qkv_fn(k, v):
            return quantize_kv_int8(k, v)

        qkv = qkv_fn(*kv_static)
        jax.block_until_ready(qkv)
        kv_bytes_int8 = sum(a.nbytes for a in jax.tree.leaves(qkv))
        del kv_static
        int8_ms = timed(sampler_fn(True), qkv)

        row = {
            "batch": b, "speaker_latents": spk_len,
            "kv_mb_bf16": round(kv_bytes_bf16 / 2**20, 1),
            "kv_mb_int8": round(kv_bytes_int8 / 2**20, 1),
            "sampler_ms_bf16_kv": round(bf16_ms, 1),
            "sampler_ms_int8_kv": round(int8_ms, 1),
            "speedup": round(bf16_ms / int8_ms, 4),
            "hbm_in_use_mb": _mem_mb(),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        del qkv

    measure(1, 640)
    if not args.skip_b8:
        measure(8, 6400 if args.long_speaker else 640)

    if args.w4a8:
        # The surface where 4-bit weights could win is the
        # weight-bandwidth-bound streaming first block (M = 3 CFG rows x
        # 40 latents = 120; §14): per step the trunk reads ~3.84 GB bf16
        # against ~2.3 ms of MXU work.  Time 40 iterations of a 24-layer
        # MLP-shaped scan (2048x5888) in ONE program — the dispatch
        # floor (~25 ms) would swamp a single pass.  jnp.int4 is not
        # lowerable on this backend, so the 4-bit store is the K-halves
        # nibble-packed int8 of ops/quant.quantize_weight_int4.
        from echo_tts_tpu.ops.quant import (int4_dot, int8_dot,
                                            quantize_weight_int4,
                                            quantize_weight_int8)

        L, M, K, N = 24, 120, 2048, 5888
        kw, kx = jax.random.split(jax.random.PRNGKey(2))
        w = jax.random.normal(kw, (L, K, N), jnp.float32) / np.sqrt(K)
        x0 = jax.random.normal(kx, (M, K), jnp.bfloat16)
        q8 = jax.jit(quantize_weight_int8)(w)
        q4 = jax.jit(quantize_weight_int4)(w)
        wbf = w.astype(jnp.bfloat16)

        def scan40(dot, wtree):
            @jax.jit
            def run(x, wtree):
                def body(c, wl):
                    y = dot(c, wl)
                    return (y[:, :K] / jnp.float32(K)).astype(
                        jnp.bfloat16), ()
                def step(i, c):
                    c2, _ = jax.lax.scan(body, c, wtree)
                    return c2
                c = jax.lax.fori_loop(0, NUM_STEPS, step, x)
                return jnp.sum(c.astype(jnp.float32))
            return run

        def timed40(run, wtree):
            np.asarray(run(x0, wtree))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(run(x0, wtree))
                ts.append(time.perf_counter() - t0)
            return 1e3 * float(np.median(ts))

        row = {
            "shape": f"{NUM_STEPS}x{L}-layer scan, M={M}, {K}x{N}",
            "scan_ms_bf16": round(timed40(
                scan40(lambda c, wl: jax.lax.dot_general(
                    c, wl, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32), wbf), wbf), 1),
            "scan_ms_w8a8": round(timed40(
                scan40(lambda c, wl: int8_dot(
                    c, wl["q8"], wl["s"], out_dtype=jnp.float32), q8),
                q8), 1),
            "scan_ms_w4a8_packed": round(timed40(
                scan40(lambda c, wl: int4_dot(
                    c, wl["q4"], wl["s"], out_dtype=jnp.float32), q4),
                q4), 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"summary": results}, indent=2))


if __name__ == "__main__":
    main()
