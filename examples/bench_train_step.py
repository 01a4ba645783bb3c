"""On-chip training-compute benchmark: full-size fwd+bwd (flow-matching
loss + grads, 24-layer DiT, remat) on one v5e.

Scope is deliberately the VALUE-AND-GRAD step, not the optimizer update:
at the published size the AdamW moments alone are ~19 GB fp32, so full
training state needs dp>=2 chips (the driver dryrun AOT-checks sharded
training; parallel/mesh.py shards params/moments) — but the COMPUTE
throughput of a training step is a single-chip property, and this
measures it: bf16 params, fp32 loss, per-layer rematerialization
(train/step.py uses the same forward).  Grads are consumed into a scalar
checksum so only params + transient grads are resident.

Single run:   python examples/bench_train_step.py
  env: ECHO_BENCH_TRAIN_B (default 2), ECHO_BENCH_TRAIN_REMAT
  (full|dots|dots_all|attn|none), ECHO_BENCH_TRAIN_ATTN (auto|xla)

Policy sweep: python examples/bench_train_step.py --sweep
  For each (remat, attention_impl) policy: grow B by doubling until OOM,
  record the HBM-max batch's tokens/s + MFU, print a table (the
  docs/PERFORMANCE.md §12 source).  Lower-B points are also printed so
  the per-policy scaling is visible.
"""
from __future__ import annotations

import argparse
import json
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

SEQ, TEXT_LEN, SPK_LEN = 640, 768, 640
V5E_BF16_PEAK_TFLOPS = 197.0
REMATS = ("full", "dots", "dots_all", "attn", "none")


def _useful_fwd_tflop(cfg, b):
    per_layer_w = (5 * cfg.model_size ** 2
                   + 3 * cfg.model_size * cfg.intermediate_size)
    t_total = SEQ + TEXT_LEN + SPK_LEN // cfg.speaker_patch_size
    trunk_macs = cfg.num_layers * (per_layer_w + 2 * t_total * cfg.model_size)
    trunk = trunk_macs * b * SEQ

    def enc(tokens, d, f, n_layers):
        per_layer = 5 * d * d + 3 * d * f + tokens * d
        return n_layers * per_layer * tokens

    encoders = b * (
        enc(TEXT_LEN, cfg.text_model_size,
            cfg.text_intermediate_size, cfg.text_num_layers)
        + enc(SPK_LEN // cfg.speaker_patch_size, cfg.speaker_model_size,
              cfg.speaker_intermediate_size, cfg.speaker_num_layers))
    return 2 * (trunk + encoders) / 1e12


def _make_batch(cfg, b):
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    return {
        "latents": jax.random.normal(ks[0], (b, SEQ, cfg.latent_size),
                                     jnp.float32),
        "text_ids": jax.random.randint(ks[1], (b, TEXT_LEN), 0, 256,
                                       jnp.int32),
        "text_mask": jnp.ones((b, TEXT_LEN), bool),
        "speaker_latent": jax.random.normal(
            ks[2], (b, SPK_LEN, cfg.latent_size), jnp.float32),
        "speaker_mask": jnp.ones((b, SPK_LEN), bool),
    }


def _measure(cfg, params, b, remat, n=5):
    """Median grad-step seconds at batch b, or None on OOM."""
    from echo_tts_tpu.train.step import flow_matching_loss

    batch = _make_batch(cfg, b)

    @jax.jit
    def grad_step(params, batch, rng):
        loss, grads = jax.value_and_grad(flow_matching_loss)(
            params, cfg, batch, rng, remat=remat)
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree.leaves(grads))
        return loss, gsum

    rng = jax.random.PRNGKey(7)
    try:
        loss, gsum = grad_step(params, batch, rng)
        np.asarray(loss), np.asarray(gsum)
    except Exception as exc:  # XlaRuntimeError: RESOURCE_EXHAUSTED
        # The axon remote-compile helper rewraps the OOM as
        # INTERNAL/HTTP 500 with "Ran out of memory ... Exceeded hbm
        # capacity" in the body, so match case-insensitively.
        msg = str(exc)
        if ("RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
                or "Exceeded hbm capacity" in msg):
            return None
        raise
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        loss, gsum = grad_step(params, batch, rng)
        np.asarray(loss), np.asarray(gsum)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _row(cfg, b, remat, attn, step_s):
    useful = 3 * _useful_fwd_tflop(cfg, b)
    tflops = useful / step_s
    return {
        "remat": remat, "attn": attn, "batch": b,
        "step_ms": round(1e3 * step_s, 1),
        "tokens_per_s": round(b * SEQ / step_s, 1),
        "useful_tflops_rate": round(tflops, 1),
        "mfu_vs_bf16_peak": round(tflops / V5E_BF16_PEAK_TFLOPS, 3),
    }


def _build(attn):
    import dataclasses

    from echo_tts_tpu.config import base_dit_config
    from echo_tts_tpu.models.dit import init_dit_params

    cfg = base_dit_config(blockwise=False)
    if attn != "auto":
        cfg = dataclasses.replace(cfg, attention_impl=attn)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    return cfg, params


def sweep(attns, remats, b_start, b_max):
    """Per policy: double B until OOM; report every measured point.
    Each (policy, B) point is one full-size XLA compile (~minutes cold
    over the tunnel; cached afterwards) — scope with --remats/--attn."""
    rows = []
    for attn in attns:
        cfg, params = _build(attn)
        for remat in remats:
            b = b_start
            best = None
            while b <= b_max:
                step_s = _measure(cfg, params, b, remat, n=3)
                if step_s is None:
                    rows.append({"remat": remat, "attn": attn, "batch": b,
                                 "oom": True})
                    print(json.dumps(rows[-1]), flush=True)
                    break
                row = _row(cfg, b, remat, attn, step_s)
                rows.append(row)
                print(json.dumps(row), flush=True)
                best = row
                b *= 2
            if best is not None:
                best["hbm_max_for_policy"] = True
        del params
    print(json.dumps({"sweep": rows}, indent=2))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep", action="store_true")
    parser.add_argument("--remats", default=",".join(REMATS),
                        help="comma list to sweep")
    parser.add_argument("--attn", default="auto",
                        help="comma list of attention impls (auto,xla)")
    parser.add_argument("--b-start", type=int, default=2)
    parser.add_argument("--b-max", type=int, default=64)
    args = parser.parse_args()
    if args.sweep:
        remats = [r for r in args.remats.split(",") if r]
        bad = [r for r in remats if r not in REMATS]
        if bad:
            raise ValueError(f"unknown remat modes {bad}; choose from "
                             f"{REMATS}")
        sweep([a for a in args.attn.split(",") if a], remats,
              args.b_start, args.b_max)
        return

    b = int(os.environ.get("ECHO_BENCH_TRAIN_B", "2"))
    remat = os.environ.get("ECHO_BENCH_TRAIN_REMAT", "full")
    attn = os.environ.get("ECHO_BENCH_TRAIN_ATTN", "auto")
    if remat not in REMATS:
        raise ValueError(f"ECHO_BENCH_TRAIN_REMAT={remat!r}: "
                         f"expected one of {REMATS}")
    cfg, params = _build(attn)
    step_s = _measure(cfg, params, b, remat)
    if step_s is None:
        print(json.dumps({"metric": "train_grad_step_fullsize",
                          "batch": b, "remat": remat, "attn": attn,
                          "oom": True}))
        return
    row = _row(cfg, b, remat, attn, step_s)
    print(json.dumps({
        "metric": "train_grad_step_fullsize",
        "value": row["step_ms"],
        "unit": "ms",
        "seq": SEQ, **row,
        "note": "MFU = fwd+bwd model flops only (remat re-forwards are "
                "overhead); optimizer state needs dp>=2 (19 GB AdamW "
                "moments) — sharded step is dryrun-checked",
    }))


if __name__ == "__main__":
    main()
