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

Run: python examples/bench_train_step.py        (prints ONE JSON line)
"""
from __future__ import annotations

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

B = int(os.environ.get("ECHO_BENCH_TRAIN_B", "2"))
SEQ, TEXT_LEN, SPK_LEN = 640, 768, 640
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    from echo_tts_tpu.config import base_dit_config
    from echo_tts_tpu.models.dit import init_dit_params
    from echo_tts_tpu.train.step import flow_matching_loss

    cfg = base_dit_config(blockwise=False)
    params = init_dit_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = {
        "latents": jax.random.normal(ks[0], (B, SEQ, cfg.latent_size),
                                     jnp.float32),
        "text_ids": jax.random.randint(ks[1], (B, TEXT_LEN), 0, 256,
                                       jnp.int32),
        "text_mask": jnp.ones((B, TEXT_LEN), bool),
        "speaker_latent": jax.random.normal(
            ks[2], (B, SPK_LEN, cfg.latent_size), jnp.float32),
        "speaker_mask": jnp.ones((B, SPK_LEN), bool),
    }

    remat = os.environ.get("ECHO_BENCH_TRAIN_REMAT", "full")
    if remat not in ("full", "dots"):
        raise ValueError(f"ECHO_BENCH_TRAIN_REMAT={remat!r}: "
                         "expected 'full' or 'dots'")

    @jax.jit
    def grad_step(params, batch, rng):
        loss, grads = jax.value_and_grad(flow_matching_loss)(
            params, cfg, batch, rng, remat=remat)
        # consume grads into a scalar so the program's live outputs are
        # tiny (transferring 4.8 GB of grads over the tunnel would swamp
        # the timing; a real step feeds them to the sharded optimizer)
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree.leaves(grads))
        return loss, gsum

    rng = jax.random.PRNGKey(7)
    loss, gsum = grad_step(params, batch, rng)
    np.asarray(loss), np.asarray(gsum)          # compile + barrier

    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        loss, gsum = grad_step(params, batch, rng)
        np.asarray(loss), np.asarray(gsum)
        ts.append(time.perf_counter() - t0)
    step_s = float(np.median(ts))

    # Useful-work MFU, PaLM-style: model flops of fwd + bwd (2x fwd),
    # REMAT RE-FORWARDS EXCLUDED (they are overhead, not useful work —
    # so full remat reads lower than its raw MXU busy-ness).  All counts
    # derived from the config so the model can't drift from the shapes.
    # (XLA's compiled cost_analysis() was tried and returns flops far
    # below even one forward through this remote-compile stack — not
    # usable here.)
    def useful_fwd_tflop():
        t_total = SEQ + TEXT_LEN + SPK_LEN // cfg.speaker_patch_size
        per_layer_w = (5 * cfg.model_size ** 2
                       + 3 * cfg.model_size * cfg.intermediate_size)
        trunk_macs = cfg.num_layers * (per_layer_w
                                       + 2 * t_total * cfg.model_size)
        trunk = trunk_macs * B * SEQ

        def enc(tokens, d, f, n_layers):
            # causal attention ~ T/2 context x 2 einsums = T*d MACs/token
            per_layer = 5 * d * d + 3 * d * f + tokens * d
            return n_layers * per_layer * tokens

        encoders = B * (
            enc(TEXT_LEN, cfg.text_model_size,
                cfg.text_intermediate_size, cfg.text_num_layers)
            + enc(SPK_LEN // cfg.speaker_patch_size, cfg.speaker_model_size,
                  cfg.speaker_intermediate_size, cfg.speaker_num_layers))
        return 2 * (trunk + encoders) / 1e12

    useful_tflop = 3 * useful_fwd_tflop()        # fwd + bwd(2x)
    tflops = useful_tflop / step_s
    tokens = B * SEQ
    print(json.dumps({
        "metric": "train_grad_step_fullsize",
        "value": round(1e3 * step_s, 1),
        "unit": "ms",
        "batch": B, "seq": SEQ, "remat": remat,
        "tokens_per_s": round(tokens / step_s, 1),
        "useful_tflop_per_step": round(useful_tflop, 2),
        "useful_tflops_rate": round(tflops, 1),
        "mfu_vs_bf16_peak": round(tflops / V5E_BF16_PEAK_TFLOPS, 3),
        "note": "MFU = fwd+bwd model flops only (remat re-forwards are "
                "overhead); optimizer state needs dp>=2 (19 GB AdamW "
                "moments) — sharded step is dryrun-checked",
    }))


if __name__ == "__main__":
    main()
