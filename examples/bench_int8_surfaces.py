"""On-chip int8 (W8A8) numbers for the two serving surfaces bench.py's
int8 stage does not cover: short-utterance latency (p50, seq 224) and
chip-side batched throughput (B=8).

Together with bench.py (one-shot rtf_int8) and bench_stream_int8.py
(ttfa/streamed), this completes the int8 mode's measurement matrix in
docs/PERFORMANCE.md §11.  NON-PARITY opt-in mode; run bench.py for the
reference-comparable numbers.

Run: python examples/bench_int8_surfaces.py     (prints ONE JSON line)
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

SEQ = 640
SHORT_SEQ = 224
TEXT_LEN = 768
SPK_LEN = 640
AUDIO_SECONDS = SEQ * 2048 / 44100.0
SHORT_AUDIO_SECONDS = SHORT_SEQ * 2048 / 44100.0


def _timeit(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(np.asarray, out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import dataclasses

    from echo_tts_tpu.config import base_dac_config, base_dit_config
    from echo_tts_tpu.models import dit
    from echo_tts_tpu.models.dac import dac as jdac
    from echo_tts_tpu.models.dac.init import init_dac_params, init_pca_params
    from echo_tts_tpu.ops.quant import quantize_dit_params
    from echo_tts_tpu.sampler.euler import (
        build_step_plan, make_cfg_branch_masks, run_step_segments,
        sample_euler_cfg_independent_guidances)

    cfg = base_dit_config(blockwise=False)
    dac_cfg = dataclasses.replace(base_dac_config(), snake_approx=True)
    key = jax.random.PRNGKey(0)
    k_dit, k_dac, k_pca = jax.random.split(key, 3)
    params = dit.init_dit_params(k_dit, cfg, dtype=jnp.bfloat16)
    qparams = quantize_dit_params(params)
    del params                       # int8 surfaces only; free the bf16 set
    dac_params = init_dac_params(k_dac, dac_cfg, dtype=jnp.bfloat16)
    pca = init_pca_params(k_pca, cfg.latent_size, dac_cfg.latent_dim)

    sampler_kw = dict(num_steps=40, cfg_scale_text=3.0,
                      cfg_scale_speaker=8.0, cfg_min_t=0.5, cfg_max_t=1.0)

    def generate_chk(params, dac_params, pca, text_ids, text_mask,
                     speaker_latent, speaker_mask, rng, seq):
        latents = sample_euler_cfg_independent_guidances(
            params, cfg, speaker_latent, speaker_mask, text_ids, text_mask,
            sequence_length=seq, rng_key=rng, **sampler_kw)
        z_q = jdac.pca_unwhiten(latents, pca)
        audio = jdac.decode_zq(dac_params, dac_cfg,
                               z_q.astype(jnp.bfloat16))
        return jnp.sum(audio.astype(jnp.float32))

    gen = jax.jit(generate_chk, static_argnames=("seq",))

    ki = jax.random.split(jax.random.PRNGKey(1), 4)
    text_ids = jax.random.randint(ki[0], (1, TEXT_LEN), 0, 256, jnp.int32)
    text_mask = jnp.arange(TEXT_LEN)[None, :] < 200
    speaker_latent = jax.random.normal(
        ki[1], (1, SPK_LEN, cfg.latent_size), jnp.float32)
    speaker_mask = jnp.ones((1, SPK_LEN), bool)

    def full(seq):
        return gen(qparams, dac_params, pca, text_ids, text_mask,
                   speaker_latent, speaker_mask, ki[2], seq=seq)

    np.asarray(full(SHORT_SEQ))                      # compile + warm
    p50_int8_ms = 1e3 * _timeit(lambda: full(SHORT_SEQ), n=5)

    # ---- chip-side B=8 batch, int8 (mirrors bench.py:_b8_chip) --------
    plan = build_step_plan(40, 0.5, 1.0, None, None, None, None)

    @jax.jit
    def prefill_b8(params, text_ids, text_mask, speaker_latent):
        kv_text = dit.get_kv_cache_text(params, cfg, text_ids, text_mask)
        kv_speaker = dit.get_kv_cache_speaker(
            params, cfg, speaker_latent.astype(jnp.bfloat16))
        (k, v), spk_cols = dit.concat_static_kv(cfg, kv_text, kv_speaker)
        return (k, v), spk_cols, (jnp.sum(k.astype(jnp.float32))
                                  + jnp.sum(v.astype(jnp.float32)))

    @jax.jit
    def sampler_b8(params, kv_static, spk_cols, text_mask, speaker_mask,
                   noise):
        mask_cfg, mask_plain = make_cfg_branch_masks(
            cfg, text_mask, speaker_mask)
        latents = run_step_segments(
            params, cfg, noise.astype(jnp.float32), plan, kv_static,
            spk_cols, mask_cfg, mask_plain, cfg_scale_text=3.0,
            cfg_scale_speaker=8.0, speaker_kv_max_layers=None,
            dtype=jnp.bfloat16)
        return latents, jnp.sum(latents)

    @jax.jit
    def decode_b4(dac_params, pca, latents):
        z_q = jdac.pca_unwhiten(latents, pca)
        audio = jdac.decode_zq(dac_params, dac_cfg,
                               z_q.astype(jnp.bfloat16))
        return jnp.sum(audio.astype(jnp.float32))

    t_ids8 = jnp.tile(text_ids, (8, 1))
    t_mask8 = jnp.tile(text_mask, (8, 1))
    spk8 = jnp.tile(speaker_latent, (8, 1, 1))
    smask8 = jnp.tile(speaker_mask, (8, 1))
    noise8 = jax.random.normal(jax.random.PRNGKey(7),
                               (8, SEQ, cfg.latent_size), jnp.float32)

    def b8_once():
        t0 = time.perf_counter()
        kv, cols, chk = prefill_b8(qparams, t_ids8, t_mask8, spk8)
        latents, chk_s = sampler_b8(qparams, kv, cols, t_mask8, smask8,
                                    noise8)
        c0 = decode_b4(dac_params, pca, latents[:4])
        c1 = decode_b4(dac_params, pca, latents[4:])
        np.asarray(chk), np.asarray(chk_s), np.asarray(c0), np.asarray(c1)
        return time.perf_counter() - t0

    b8_once()                                        # compile + warm
    b8_wall = float(np.median([b8_once() for _ in range(2)]))
    rtf_b8_chip_int8 = 8 * AUDIO_SECONDS / b8_wall

    print(json.dumps({
        "metric": "int8_surfaces_nonparity",
        "value": round(rtf_b8_chip_int8, 2),
        "unit": "x_realtime",
        "p50_short_int8_ms": round(p50_int8_ms, 1),
        "p50_short_rtf_int8": round(
            SHORT_AUDIO_SECONDS / (p50_int8_ms / 1e3), 2),
        "throughput_rtf_b8_chip_int8": round(rtf_b8_chip_int8, 2),
        "note": "ECHO_DIT_QUANT=int8 non-parity surfaces; bench.py has "
                "the reference-comparable numbers"}))


if __name__ == "__main__":
    main()
