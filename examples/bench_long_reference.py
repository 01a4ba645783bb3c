"""Long-speaker-reference cost on the real chip (VERDICT r3 item 2).

The reference treats up to 6400-latent (~5 min) speaker references as
first-class (reference: inference.py:239-283 chunked encode, 322 max
length); serving buckets voices to {640, 2816, 6400}
(serve/presets.py:SPEAKER_BUCKETS).  The headline bench only measures the
640 bucket — this script measures, per bucket, on the TPU:

  voice_encode_ms  chunked AE encode of a bucket-length reference
                   (10x 30 s static chunks for 6400;
                   pipeline.get_speaker_latent_and_mask)
  prefill_ms       text KV + speaker KV prefill at that bucket width
  sampler_ms       the 40-step dual-CFG Euler loop attending
                   (768 text + bucket speaker) KV columns

Prints ONE JSON line; numbers land in docs/PERFORMANCE.md and back the
sequence-parallel engage decision in parallel/sp.py.

Run: python examples/bench_long_reference.py
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
NUM_STEPS = 40
BUCKETS = (640, 2816, 6400)   # serve/presets.py:SPEAKER_BUCKETS


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
    from echo_tts_tpu.models.dac.init import init_dac_params, init_pca_params
    from echo_tts_tpu.pipeline.pipeline import (EchoModels,
                                                get_speaker_latent_and_mask)
    from echo_tts_tpu.sampler.euler import (build_step_plan,
                                            make_cfg_branch_masks,
                                            run_step_segments)

    cfg = base_dit_config(blockwise=False)
    dac_cfg = dataclasses.replace(base_dac_config(), snake_approx=True)
    key = jax.random.PRNGKey(0)
    k_dit, k_dac, k_pca = jax.random.split(key, 3)
    params = dit.init_dit_params(k_dit, cfg, dtype=jnp.bfloat16)
    dac_params = init_dac_params(k_dac, dac_cfg, dtype=jnp.bfloat16)
    pca = init_pca_params(k_pca, cfg.latent_size, dac_cfg.latent_dim)
    models = EchoModels(params, cfg, dac_params, dac_cfg, pca,
                        dtype=jnp.bfloat16)

    @jax.jit
    def prefill(params, text_ids, text_mask, speaker_latent):
        kv_text = dit.get_kv_cache_text(params, cfg, text_ids, text_mask)
        kv_speaker = dit.get_kv_cache_speaker(
            params, cfg, speaker_latent.astype(jnp.bfloat16))
        (k, v), spk_cols = dit.concat_static_kv(cfg, kv_text, kv_speaker)
        chk = (jnp.sum(k.astype(jnp.float32))
               + jnp.sum(v.astype(jnp.float32)))
        return (k, v), spk_cols, chk

    plan = build_step_plan(NUM_STEPS, 0.5, 1.0, None, None, None, None)

    @jax.jit
    def sampler_only(params, kv_static, spk_cols, text_mask, speaker_mask,
                     noise):
        mask_cfg, mask_plain = make_cfg_branch_masks(
            cfg, text_mask, speaker_mask)
        latents = run_step_segments(
            params, cfg, noise.astype(jnp.float32), plan, kv_static,
            spk_cols, mask_cfg, mask_plain, cfg_scale_text=3.0,
            cfg_scale_speaker=8.0, speaker_kv_max_layers=None,
            dtype=jnp.bfloat16)
        return jnp.sum(latents)

    ki = jax.random.split(jax.random.PRNGKey(1), 4)
    text_ids = jax.random.randint(ki[0], (1, TEXT_LEN), 0, 256, jnp.int32)
    text_mask = jnp.arange(TEXT_LEN)[None, :] < 200
    noise = jax.random.normal(ki[2], (1, SEQ, cfg.latent_size), jnp.float32)

    spl = dac_cfg.frame_length
    rng = np.random.default_rng(7)
    report = {}
    for bucket in BUCKETS:
        # bucket-length reference audio (content irrelevant for timing)
        audio = (0.1 * rng.standard_normal((1, bucket * spl))) \
            .astype(np.float32)

        # warmup (compile the chunk-encode program once, shared: every
        # chunk is a static 640-latent encode)
        get_speaker_latent_and_mask(models, audio,
                                    max_speaker_latent_length=bucket,
                                    pad_to_max=True)
        t0 = time.perf_counter()
        lat, mask = get_speaker_latent_and_mask(
            models, audio, max_speaker_latent_length=bucket,
            pad_to_max=True)
        voice_encode_ms = 1e3 * (time.perf_counter() - t0)

        speaker_latent = jnp.asarray(lat)
        speaker_mask = jnp.asarray(mask)

        kv_static, spk_cols, chk = prefill(params, text_ids, text_mask,
                                           speaker_latent)
        np.asarray(chk)
        prefill_ms = 1e3 * _timeit(lambda: prefill(
            params, text_ids, text_mask, speaker_latent)[2])

        np.asarray(sampler_only(params, kv_static, spk_cols, text_mask,
                                speaker_mask, noise))
        sampler_ms = 1e3 * _timeit(lambda: sampler_only(
            params, kv_static, spk_cols, text_mask, speaker_mask, noise))

        report[str(bucket)] = {
            "voice_encode_ms": round(voice_encode_ms, 1),
            "prefill_ms": round(prefill_ms, 1),
            "sampler_ms": round(sampler_ms, 1),
            "rtf_640seq": round(SEQ * 2048 / 44100.0
                                / ((prefill_ms + sampler_ms) / 1e3), 2),
        }
        del kv_static
        print(f"# bucket {bucket}: {report[str(bucket)]}", file=sys.stderr)

    print(json.dumps({"metric": "long_reference_buckets",
                      "buckets": report}))


if __name__ == "__main__":
    main()
