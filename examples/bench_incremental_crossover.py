"""Incremental latent-prefix KV crossover, measured on the chip
(VERDICT r3: `INCREMENTAL_LATENT_MIN_TOTAL = 2560` was an extrapolation —
this measures a >=2560-latent stream with the incremental path forced ON
and OFF so the threshold is data, not an O(total^2) argument).

Streams TOTAL latents (default 3840 ≈ 2 min 58 s of audio) through the
blockwise sampler only (no codec decode — identical in both paths), with
the serving growing schedule, and times the full drain:

  reencode     reference semantics: the full prefix buffer re-encoded
               through the latent encoder every block (O(total)/block)
  incremental  carried latent-KV appends (O(block)/block,
               dit.latent_kv_append_block)

Run: python examples/bench_incremental_crossover.py [TOTAL ...]
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

TEXT_LEN = 768
SPK_LEN = 640
NUM_STEPS = 40


def main(totals):
    from echo_tts_tpu.config import base_dit_config
    from echo_tts_tpu.models import dit
    from echo_tts_tpu.sampler.blockwise import (
        iter_blockwise_euler_cfg_independent_guidances)
    from echo_tts_tpu.serve.presets import (growing_schedule,
                                            pick_stream_total_bucket)

    cfg = base_dit_config(blockwise=True)
    params = dit.init_dit_params(jax.random.PRNGKey(4), cfg,
                                 dtype=jnp.bfloat16)
    ki = jax.random.split(jax.random.PRNGKey(1), 4)
    text_ids = jax.random.randint(ki[0], (1, TEXT_LEN), 0, 256, jnp.int32)
    text_mask = jnp.arange(TEXT_LEN)[None, :] < 200
    speaker_latent = jax.random.normal(
        ki[1], (1, SPK_LEN, cfg.latent_size), jnp.float32)
    speaker_mask = jnp.ones((1, SPK_LEN), bool)

    kw = dict(num_steps=NUM_STEPS, cfg_scale_text=3.0,
              cfg_scale_speaker=8.0, cfg_min_t=0.5, cfg_max_t=1.0)

    def drain(schedule, bucket, incremental):
        t0 = time.perf_counter()
        for _, x_t, _ in iter_blockwise_euler_cfg_independent_guidances(
                params, cfg, speaker_latent, speaker_mask, text_ids,
                text_mask, block_sizes=schedule, dtype=jnp.bfloat16,
                rng_key=jax.random.PRNGKey(0),
                incremental_latent=incremental,
                total_len_bucket=bucket, **kw):
            np.asarray(x_t)     # the serving layer consumes every block
        return time.perf_counter() - t0

    report = {}
    for total in totals:
        try:
            schedule = growing_schedule(total)
        except ValueError:
            # past the growing-schedule cap (16 blocks / 4440 latents) the
            # serving-acceptable shape is the uniform 320 schedule
            # (chunk_size=320, num_chunks<=16 -> top bucket 5120)
            if total % 320 != 0 or total // 320 > 16:
                raise
            schedule = [320] * (total // 320)
        bucket = pick_stream_total_bucket(total)
        audio_s = total * 2048 / 44100.0
        row = {"schedule_blocks": len(schedule), "bucket": bucket,
               "audio_s": round(audio_s, 1)}
        for label, inc in (("reencode", False), ("incremental", True)):
            t_compile = time.perf_counter()
            drain(schedule, bucket, inc)           # compile + warmup
            warm = time.perf_counter() - t_compile
            runs = [drain(schedule, bucket, inc) for _ in range(2)]
            wall = float(np.median(runs))
            row[label + "_s"] = round(wall, 3)
            row[label + "_rtf"] = round(audio_s / wall, 2)
            print(f"# total {total} {label}: warm+compile {warm:.1f}s, "
                  f"then {wall:.2f}s ({audio_s / wall:.2f}x)",
                  file=sys.stderr)
        row["incremental_wins"] = row["incremental_s"] < row["reencode_s"]
        report[str(total)] = row

    print(json.dumps({"metric": "incremental_latent_crossover",
                      "totals": report}))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]] or [3840]
    main(args)
