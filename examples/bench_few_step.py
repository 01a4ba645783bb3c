"""On-chip timing of the few-step NON-PARITY sampler mode.

train/distill.py makes an N-step CFG-free student possible; this script
measures what that mode would run at ON THIS CHIP, using random weights
(timing is weight-value independent): the 8-step plain sampler over the
headline request shape (640-latent utterance, 768-text + 640-speaker KV),
next to the parity 40-step dual-CFG sampler for the same request.

The number is the MECHANICAL ceiling of the distillation lever — real
few-step audio additionally needs distilled weights (environment-blocked;
docs/PERFORMANCE.md closing section).  It must never be read as the
parity headline: bench.py's rtf is the reference-comparable number.

Run: python examples/bench_few_step.py        (prints ONE JSON line)
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEQ = 640
TEXT_LEN = 768
SPK_LEN = 640
FEW_STEPS = 8
AUDIO_SECONDS = SEQ * 2048 / 44100.0


def _timeit(fn, n=3):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(np.asarray, out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    import dataclasses

    from echo_tts_tpu.config import base_dac_config, base_dit_config
    from echo_tts_tpu.models import dit
    from echo_tts_tpu.models.dac import dac as jdac
    from echo_tts_tpu.models.dac.init import init_dac_params, init_pca_params
    from echo_tts_tpu.sampler.euler import (build_step_plan,
                                            make_cfg_branch_masks,
                                            run_step_segments)
    from echo_tts_tpu.train.distill import few_step_sampler_params

    cfg = base_dit_config(blockwise=False)
    dac_cfg = dataclasses.replace(base_dac_config(), snake_approx=True)
    key = jax.random.PRNGKey(0)
    k_dit, k_dac, k_pca = jax.random.split(key, 3)
    params = dit.init_dit_params(k_dit, cfg, dtype=jnp.bfloat16)
    dac_params = init_dac_params(k_dac, dac_cfg, dtype=jnp.bfloat16)
    pca = init_pca_params(k_pca, cfg.latent_size, dac_cfg.latent_dim)

    @jax.jit
    def prefill(params, text_ids, text_mask, speaker_latent):
        kv_text = dit.get_kv_cache_text(params, cfg, text_ids, text_mask)
        kv_speaker = dit.get_kv_cache_speaker(
            params, cfg, speaker_latent.astype(jnp.bfloat16))
        (k, v), spk_cols = dit.concat_static_kv(cfg, kv_text, kv_speaker)
        chk = (jnp.sum(k.astype(jnp.float32))
               + jnp.sum(v.astype(jnp.float32)))
        return (k, v), spk_cols, chk

    fs = few_step_sampler_params(FEW_STEPS)
    plan_few = build_step_plan(fs["num_steps"], fs["cfg_min_t"],
                               fs["cfg_max_t"], None, None, None, None)
    plan_40 = build_step_plan(40, 0.5, 1.0, None, None, None, None)

    def sampler(plan, s_text, s_spk):
        @jax.jit
        def run(params, kv_static, spk_cols, text_mask, speaker_mask,
                noise):
            mask_cfg, mask_plain = make_cfg_branch_masks(
                cfg, text_mask, speaker_mask)
            latents = run_step_segments(
                params, cfg, noise.astype(jnp.float32), plan, kv_static,
                spk_cols, mask_cfg, mask_plain, cfg_scale_text=s_text,
                cfg_scale_speaker=s_spk, speaker_kv_max_layers=None,
                dtype=jnp.bfloat16)
            return latents, jnp.sum(latents)
        return run

    sampler_few = sampler(plan_few, fs["cfg_scale_text"],
                          fs["cfg_scale_speaker"])
    sampler_40 = sampler(plan_40, 3.0, 8.0)

    @jax.jit
    def decode_only(dac_params, pca, latents):
        z_q = jdac.pca_unwhiten(latents, pca)
        audio = jdac.decode_zq(dac_params, dac_cfg,
                               z_q.astype(jnp.bfloat16))
        return jnp.sum(audio.astype(jnp.float32))

    ki = jax.random.split(jax.random.PRNGKey(1), 4)
    text_ids = jax.random.randint(ki[0], (1, TEXT_LEN), 0, 256, jnp.int32)
    text_mask = jnp.arange(TEXT_LEN)[None, :] < 200
    speaker_latent = jax.random.normal(
        ki[1], (1, SPK_LEN, cfg.latent_size), jnp.float32)
    speaker_mask = jnp.ones((1, SPK_LEN), bool)
    noise = jax.random.normal(ki[3], (1, SEQ, cfg.latent_size), jnp.float32)

    kv_static, spk_cols, chk = prefill(params, text_ids, text_mask,
                                       speaker_latent)
    np.asarray(chk)
    prefill_ms = 1e3 * _timeit(lambda: prefill(
        params, text_ids, text_mask, speaker_latent)[2])

    out = {}
    for name, fn in (("few8", sampler_few), ("cfg40", sampler_40)):
        latents, c = fn(params, kv_static, spk_cols, text_mask,
                        speaker_mask, noise)
        np.asarray(c)
        out[name] = 1e3 * _timeit(lambda: fn(
            params, kv_static, spk_cols, text_mask, speaker_mask,
            noise)[1])

    # compounded ceiling: few-step student + the int8 W8A8 serving mode
    # (ops/quant.py) — the two levers are independent (steps x per-step)
    from echo_tts_tpu.ops.quant import quantize_dit_params
    qparams = quantize_dit_params(params)
    _, cq = sampler_few(qparams, kv_static, spk_cols, text_mask,
                        speaker_mask, noise)
    np.asarray(cq)
    out["few8_int8"] = 1e3 * _timeit(lambda: sampler_few(
        qparams, kv_static, spk_cols, text_mask, speaker_mask, noise)[1])
    del qparams

    np.asarray(decode_only(dac_params, pca, latents))
    decode_ms = 1e3 * _timeit(lambda: decode_only(dac_params, pca, latents))

    rtf_few = AUDIO_SECONDS / ((prefill_ms + out["few8"] + decode_ms) / 1e3)
    rtf_40 = AUDIO_SECONDS / ((prefill_ms + out["cfg40"] + decode_ms) / 1e3)
    rtf_few_int8 = AUDIO_SECONDS / (
        (prefill_ms + out["few8_int8"] + decode_ms) / 1e3)
    print(json.dumps({
        "metric": "few_step_nonparity_rtf",
        "value": round(rtf_few, 2),
        "unit": "x_realtime",
        "prefill_ms": round(prefill_ms, 1),
        "sampler_few8_ms": round(out["few8"], 1),
        "sampler_few8_int8_ms": round(out["few8_int8"], 1),
        "sampler_cfg40_ms": round(out["cfg40"], 1),
        "decode_ms": round(decode_ms, 1),
        "rtf_parity_40step": round(rtf_40, 2),
        "rtf_few8_int8": round(rtf_few_int8, 2),
        "note": "few8 = mechanical timing of the distilled mode; needs "
                "distilled weights for real audio (train/distill.py)",
    }))


if __name__ == "__main__":
    main()
