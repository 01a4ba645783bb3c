"""On-chip streaming with the int8 (W8A8) DiT: TTFA + streamed RTF.

Streaming's first-audio floor is SAMPLER-bound (docs/PERFORMANCE.md §6:
~272 ms of the ~350 ms floor is the 40-step loop over the first block),
so the int8 mode's per-step gain (§11) is worth measuring at the
streaming surface, not just the one-shot headline.  Runs the bench's
exact streamed shape (growing blocks 40..320, 1240 latents ≈ 57.6 s)
with the bf16 bundle and then the quantized bundle, same schedule, same
seed.  NON-PARITY opt-in mode; bf16 numbers are the reference-comparable
ones.

Run: python examples/bench_stream_int8.py      (prints ONE JSON line)
"""
from __future__ import annotations

import json
import os
import sys

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

import bench  # noqa: E402  (module-level code is env setup only)


def main():
    import dataclasses

    from echo_tts_tpu.config import base_dac_config, base_dit_config
    from echo_tts_tpu.models.dac.init import init_dac_params, init_pca_params
    from echo_tts_tpu.models.dit import init_dit_params
    from echo_tts_tpu.ops.quant import quantize_dit_params
    from echo_tts_tpu.pipeline.pipeline import EchoModels

    cfg = base_dit_config(blockwise=True)
    dac_cfg = dataclasses.replace(base_dac_config(), snake_approx=True)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(4), 3)
    params = init_dit_params(k1, cfg, dtype=jnp.bfloat16)
    models = EchoModels(params, cfg,
                        init_dac_params(k2, dac_cfg, dtype=jnp.bfloat16),
                        dac_cfg,
                        init_pca_params(k3, cfg.latent_size,
                                        dac_cfg.latent_dim),
                        dtype=jnp.bfloat16)

    ki = jax.random.split(jax.random.PRNGKey(1), 2)
    inp = dict(
        speaker_latent=jax.random.normal(
            ki[0], (1, bench.SPK_LEN, cfg.latent_size), jnp.float32),
        speaker_mask=jnp.ones((1, bench.SPK_LEN), bool))
    sampler_kw = dict(num_steps=40, cfg_scale_text=3.0,
                      cfg_scale_speaker=8.0, cfg_min_t=0.5, cfg_max_t=1.0)
    audio_s = sum(bench.STREAM_BLOCKS) * 2048 / 44100.0

    out = {}
    for tag, m in (("bf16", models),
                   ("int8", dataclasses.replace(
                       models,
                       dit_params=quantize_dit_params(models.dit_params)))):
        bench._stream_once(m, inp, sampler_kw)       # compile + warmup
        runs = [bench._stream_once(m, inp, sampler_kw) for _ in range(3)]
        out[f"ttfa_{tag}_ms"] = round(
            1e3 * float(np.median([r[0] for r in runs])), 1)
        out[f"streamed_rtf_{tag}"] = round(
            audio_s / float(np.median([r[1] for r in runs])), 2)

    print(json.dumps(dict(
        metric="stream_int8_nonparity",
        value=out["streamed_rtf_int8"],
        unit="x_realtime",
        **out,
        note="int8 = ECHO_DIT_QUANT=int8 non-parity mode; bf16 keys are "
             "the reference-comparable ones (bench.py)")))


if __name__ == "__main__":
    main()
