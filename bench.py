"""Headline benchmark: voice-cloned TTS real-time factor per chip.

Measures the full on-device generation path for one 640-latent utterance
(≈29.7 s of audio at 44.1 kHz / 2048-sample latent hop):

  text KV prefill (14-layer text encoder)
  + speaker KV prefill (14-layer speaker encoder over a 640-latent reference)
  + 40 Euler steps with dual CFG (text 3.0 / speaker 8.0, window t∈[0.5,1])
  + PCA un-whitening + S1-DAC decode to waveform

which is the reference's headline configuration (sruckh/echo-tts
docs/diagrams/dataflow.svg: ~10 s on an RTX 4090 ⇒ ≈3× real time;
handler.py:426-443 defaults).  Weights are randomly initialized — identical
compute/timing to converted weights.

Prints ONE JSON line.  `metric`/`value`/`unit`/`vs_baseline` carry the
headline RTF; the extra keys break the pipeline down so round-over-round
perf claims are machine-checkable:

  prefill_ms   text+speaker KV prefill (one-time per request)
  sampler_ms   40-step dual-CFG Euler loop over prefilled KV
  decode_ms    PCA un-whiten + S1-DAC decode (640 latents -> 29.7 s audio)
  p50_short_ms p50 end-to-end latency for a ~10 s utterance (seq 224,
               ROADMAP #5), median of 5
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

# The session sitecustomize imports jax BEFORE this file runs, so the
# env var above never reaches jax's config snapshot — set it explicitly
# or the persistent cache stays disabled and every run recompiles.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

SEQ = 640
SHORT_SEQ = 224            # ~10.4 s utterance for the p50 latency metric
TEXT_LEN = 768
SPK_LEN = 640
NUM_STEPS = 40
AUDIO_SECONDS = SEQ * 2048 / 44100.0
BASELINE_RTF = 3.0  # RTX 4090 (reference docs/diagrams/dataflow.svg)


def _timeit(fn, n=3):
    """Median-of-n wall time; np.asarray forces a device->host transfer,
    the only reliable execution barrier on the experimental axon platform
    (block_until_ready alone has been observed returning early there)."""
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.tree_util.tree_map(np.asarray, out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def build():
    from echo_tts_tpu.config import base_dac_config, base_dit_config
    from echo_tts_tpu.models import dit
    from echo_tts_tpu.models.dac import dac as jdac
    from echo_tts_tpu.models.dac.init import init_dac_params, init_pca_params
    from echo_tts_tpu.sampler.euler import (
        build_step_plan, make_cfg_branch_masks, run_step_segments,
        sample_euler_cfg_independent_guidances)

    cfg = base_dit_config(blockwise=False)
    dac_cfg = base_dac_config()

    key = jax.random.PRNGKey(0)
    k_dit, k_dac, k_pca = jax.random.split(key, 3)
    params = dit.init_dit_params(k_dit, cfg, dtype=jnp.bfloat16)
    # bf16 codec matches the reference's production load
    # (handler.py:345,381: bf16 on accelerators)
    dac_params = init_dac_params(k_dac, dac_cfg, dtype=jnp.bfloat16)
    pca = init_pca_params(k_pca, cfg.latent_size, dac_cfg.latent_dim)

    sampler_kw = dict(num_steps=NUM_STEPS, cfg_scale_text=3.0,
                      cfg_scale_speaker=8.0, cfg_min_t=0.5, cfg_max_t=1.0)

    def generate(params, dac_params, pca, text_ids, text_mask,
                 speaker_latent, speaker_mask, rng, seq):
        latents = sample_euler_cfg_independent_guidances(
            params, cfg, speaker_latent, speaker_mask, text_ids, text_mask,
            sequence_length=seq, rng_key=rng, **sampler_kw)
        z_q = jdac.pca_unwhiten(latents, pca)
        audio = jdac.decode_zq(dac_params, dac_cfg,
                               z_q.astype(jnp.bfloat16))
        return audio

    # --- stage programs (prefill / sampler / decode), for the breakdown ---
    # Each returns its outputs AND a scalar checksum: timing transfers only
    # the scalar (the axon tunnel moves ~70 MB/s, so np.asarray of the
    # 440 MB KV cache would swamp the prefill time by seconds).
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
        return latents, jnp.sum(latents)

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

    gen = jax.jit(generate, static_argnames=("seq",))
    inputs = dict(text_ids=text_ids, text_mask=text_mask,
                  speaker_latent=speaker_latent, speaker_mask=speaker_mask,
                  rng=ki[2], noise=noise)
    return (gen, prefill, sampler_only, decode_only, params, dac_params,
            pca, inputs)


def main():
    (gen, prefill, sampler_only, decode_only, params, dac_params, pca,
     inp) = build()

    def full(seq):
        return gen(params, dac_params, pca, inp["text_ids"],
                   inp["text_mask"], inp["speaker_latent"],
                   inp["speaker_mask"], inp["rng"], seq)

    # compile + warmup
    np.asarray(full(SEQ))
    elapsed = _timeit(lambda: full(SEQ), n=3)
    rtf = AUDIO_SECONDS / elapsed

    # stage breakdown (scalar-checksum barriers; see build())
    kv_static, spk_cols, chk0 = prefill(
        params, inp["text_ids"], inp["text_mask"], inp["speaker_latent"])
    np.asarray(chk0)
    prefill_ms = 1e3 * _timeit(lambda: prefill(
        params, inp["text_ids"], inp["text_mask"],
        inp["speaker_latent"])[2])
    latents, chk = sampler_only(
        params, kv_static, spk_cols, inp["text_mask"], inp["speaker_mask"],
        inp["noise"])
    np.asarray(chk)
    sampler_ms = 1e3 * _timeit(lambda: sampler_only(
        params, kv_static, spk_cols, inp["text_mask"], inp["speaker_mask"],
        inp["noise"])[1])
    np.asarray(decode_only(dac_params, pca, latents))
    decode_ms = 1e3 * _timeit(lambda: decode_only(dac_params, pca,
                                                  latents))

    # p50 latency, ~10 s utterance (ROADMAP #5)
    np.asarray(full(SHORT_SEQ))
    p50_short_ms = 1e3 * _timeit(lambda: full(SHORT_SEQ), n=5)

    print(json.dumps({
        "metric": "rtf_audio_sec_per_sec_per_chip",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
        "prefill_ms": round(prefill_ms, 1),
        "sampler_ms": round(sampler_ms, 1),
        "decode_ms": round(decode_ms, 1),
        "p50_short_ms": round(p50_short_ms, 1),
    }))


if __name__ == "__main__":
    main()
