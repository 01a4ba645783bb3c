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

Prints ONE JSON line:
  {"metric": "rtf_audio_sec_per_sec_per_chip", "value": R, "unit":
   "x_realtime", "vs_baseline": R / 3.0}
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

jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

SEQ = 640
TEXT_LEN = 768
SPK_LEN = 640
NUM_STEPS = 40
AUDIO_SECONDS = SEQ * 2048 / 44100.0
BASELINE_RTF = 3.0  # RTX 4090 (reference docs/diagrams/dataflow.svg)


def build():
    from echo_tts_tpu.config import base_dac_config, base_dit_config
    from echo_tts_tpu.models import dit
    from echo_tts_tpu.models.dac import dac as jdac
    from echo_tts_tpu.models.dac.init import init_dac_params, init_pca_params
    from echo_tts_tpu.sampler.euler import (
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

    def generate(params, dac_params, pca, text_ids, text_mask,
                 speaker_latent, speaker_mask, rng):
        latents = sample_euler_cfg_independent_guidances(
            params, cfg, speaker_latent, speaker_mask, text_ids, text_mask,
            num_steps=NUM_STEPS, cfg_scale_text=3.0, cfg_scale_speaker=8.0,
            cfg_min_t=0.5, cfg_max_t=1.0, sequence_length=SEQ,
            rng_key=rng)
        z_q = jdac.pca_unwhiten(latents, pca)
        audio = jdac.decode_zq(dac_params, dac_cfg,
                               z_q.astype(jnp.bfloat16))
        return audio

    gen = jax.jit(generate)

    ki = jax.random.split(jax.random.PRNGKey(1), 4)
    text_ids = jax.random.randint(ki[0], (1, TEXT_LEN), 0, 256, jnp.int32)
    text_mask = jnp.arange(TEXT_LEN)[None, :] < 200
    speaker_latent = jax.random.normal(
        ki[1], (1, SPK_LEN, cfg.latent_size), jnp.float32)
    speaker_mask = jnp.ones((1, SPK_LEN), bool)
    args = (params, dac_params, pca, text_ids, text_mask, speaker_latent,
            speaker_mask, ki[2])
    return gen, args


def main():
    gen, args = build()
    # compile + warmup; np.asarray forces a device->host transfer, which is
    # the only reliable execution barrier on the experimental axon platform
    # (block_until_ready alone has been observed returning early there).
    np.asarray(gen(*args))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(gen(*args))
        times.append(time.perf_counter() - t0)
    elapsed = min(times)
    rtf = AUDIO_SECONDS / elapsed
    print(json.dumps({
        "metric": "rtf_audio_sec_per_sec_per_chip",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }))


if __name__ == "__main__":
    main()
