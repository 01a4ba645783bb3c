"""TTFA decomposition: where the stream's first ~340 ms actually goes.

Times every stage between "request arrives" and "first block's audio on
the host" for the production growing schedule (first block = 40 latents
~ 1.9 s of audio; serve/presets.py STREAM_CHUNK_SIZES):

  host_text_ms     byte tokenize + pad to the 768 bucket (host)
  prefill_ms       text + speaker KV prefill program
  sampler40_ms     the 40-latent first-block program (40 steps, dual CFG;
                   latent-free specialized first-block core)
  decode40_ms      incremental codec decode of the 40-latent block
                   (fresh decode state), scalar-checksum barrier
  transfer_ms      device->host of the (1, 81920) f32 first-block audio
                   (a dev-tunnel cost; production host is on the pod)
  wav_write_ms     WAV encode to disk (host)
  ttfa_stream_ms   measured end-to-end TTFA of stream_synthesize
                   (bench.py's ttfa_ms stage)
  residual_ms      ttfa_stream - (host_text + prefill + sampler40 +
                   decode40 + transfer) — dispatch gaps + generator
                   machinery; the axon tunnel's ~25 ms/dispatch floor
                   times the number of serialized dispatches

  fused_first_ms   ONE jitted program running prefill + first-block
                   sampler + first-block decode back-to-back (KV and
                   decode state stay on device as outputs) — measures
                   how much of the residual a fused first-block program
                   would recover before committing to the surgery.

Run on the chip: python examples/bench_ttfa_breakdown.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
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

TEXT_LEN = 768
SPK_LEN = 640
FIRST_BLOCK = 40
NUM_STEPS = 40
STREAM_BLOCKS = (40, 80, 160, 320, 320, 320)
STREAM_TEXT = ("The quick brown fox jumps over the lazy dog while the "
               "orchestra tunes quietly in the hall, and a narrator "
               "describes the scene in a calm, steady voice for the "
               "benchmark recording. ") * 3


def _median(fn, n=5):
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return 1e3 * float(np.median(times))


def main():
    import dataclasses

    from echo_tts_tpu.config import (SAMPLER_DEFAULTS, base_dac_config,
                                     base_dit_config)
    from echo_tts_tpu.models import dit
    from echo_tts_tpu.models.dac import dac as jdac
    from echo_tts_tpu.models.dac.init import init_dac_params, init_pca_params
    from echo_tts_tpu.models.dac.streaming import (MAX_POSITIONS,
                                                   decode_zq_block,
                                                   init_decode_state)
    from echo_tts_tpu.models.dit import init_dit_params
    from echo_tts_tpu.pipeline import audio_io
    from echo_tts_tpu.pipeline.pipeline import (EchoModels, ae_decode_block,
                                                ae_decode_stream_init)
    from echo_tts_tpu.pipeline.text import get_text_input_ids_and_mask
    from echo_tts_tpu.sampler import blockwise as bw
    from echo_tts_tpu.serve.streaming import stream_synthesize

    cfg = base_dit_config(blockwise=True)
    dac_cfg = dataclasses.replace(base_dac_config(), snake_approx=True)
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    params = init_dit_params(k1, cfg, dtype=jnp.bfloat16)
    dac_params = init_dac_params(k2, dac_cfg, dtype=jnp.bfloat16)
    pca = init_pca_params(k3, cfg.latent_size, dac_cfg.latent_dim)
    models = EchoModels(params, cfg, dac_params, dac_cfg, pca,
                        dtype=jnp.bfloat16)

    p = dict(SAMPLER_DEFAULTS)
    p.pop("sequence_length")
    sampler_kw = p

    rng = np.random.default_rng(3)
    spk_lat_np = (0.1 * rng.standard_normal(
        (1, SPK_LEN, cfg.latent_size))).astype(np.float32)
    spk_mask_np = np.ones((1, SPK_LEN), bool)
    spk_lat = jnp.asarray(spk_lat_np)
    spk_mask = jnp.asarray(spk_mask_np)

    # ---- host text stage
    host_text_ms = _median(lambda: get_text_input_ids_and_mask(
        [STREAM_TEXT], max_length=TEXT_LEN), n=9)
    text_ids, text_mask = get_text_input_ids_and_mask(
        [STREAM_TEXT], max_length=TEXT_LEN)
    text_ids = jnp.asarray(text_ids)
    text_mask = jnp.asarray(text_mask)

    # ---- prefill stage (scalar-checksum twin of bw._prefill_core)
    @jax.jit
    def prefill_chk(params, text_ids, text_mask, speaker_latent):
        kv_text = dit.get_kv_cache_text(params, cfg, text_ids, text_mask)
        kv_speaker = dit.get_kv_cache_speaker(
            params, cfg, speaker_latent.astype(jnp.bfloat16))
        chk = (jnp.sum(kv_text[0][..., 0].astype(jnp.float32))
               + jnp.sum(kv_speaker[0][..., 0].astype(jnp.float32)))
        return kv_text, kv_speaker, chk

    kv_text, kv_speaker, chk = prefill_chk(params, text_ids, text_mask,
                                           spk_lat)
    np.asarray(chk)
    prefill_ms = _median(lambda: np.asarray(
        prefill_chk(params, text_ids, text_mask, spk_lat)[2]))

    # ---- first-block sampler stage (the production first-block core)
    statics = (NUM_STEPS, 3.0, 8.0, 0.5, 1.0, None, None, None, None,
               None, None, jnp.dtype(jnp.bfloat16))
    core = bw._block_core(cfg, FIRST_BLOCK, FIRST_BLOCK, *statics,
                          False, True)
    noise = jax.random.normal(jax.random.PRNGKey(5),
                              (1, FIRST_BLOCK, cfg.latent_size),
                              jnp.float32)
    x_t = core(params, noise, kv_text, kv_speaker, text_mask, spk_mask)
    np.asarray(x_t)
    # x_t is 12.8 KB — its transfer is negligible next to the 40 steps
    sampler40_ms = _median(lambda: np.asarray(core(
        params, noise, kv_text, kv_speaker, text_mask, spk_mask)))

    # ---- first-block incremental decode (fresh state, like the stream)
    def decode_once():
        state = ae_decode_stream_init(models)
        audio, _ = ae_decode_block(models, state, x_t)
        return audio

    audio_dev = decode_once()
    np.asarray(audio_dev)

    @jax.jit
    def _chk(a):
        return jnp.sum(a.astype(jnp.float32))

    decode40_ms = _median(lambda: np.asarray(_chk(decode_once())))
    transfer_ms = _median(lambda: np.asarray(audio_dev), n=9)

    # ---- WAV write (host)
    audio_np = np.asarray(audio_dev)
    tmp = tempfile.mkdtemp(prefix="ttfa_breakdown_")
    wav_write_ms = _median(lambda: audio_io.write_wav(
        os.path.join(tmp, "b.wav"), audio_np, 44100), n=9)

    # ---- measured end-to-end stream TTFA (bench.py's stage)
    def stream_ttfa():
        t0 = time.perf_counter()
        for chunk in stream_synthesize(
                models, STREAM_TEXT, speaker_latent=spk_lat_np,
                speaker_mask=spk_mask_np, chunk_sizes=list(STREAM_BLOCKS),
                seed=0, sampler_params=sampler_kw):
            ttfa = time.perf_counter() - t0
            break
        # drain so the next run starts clean
        for _ in stream_synthesize(
                models, STREAM_TEXT, speaker_latent=spk_lat_np,
                speaker_mask=spk_mask_np, chunk_sizes=list(STREAM_BLOCKS),
                seed=0, sampler_params=sampler_kw):
            pass
        return ttfa

    # warm every program in the schedule once
    for _ in stream_synthesize(models, STREAM_TEXT,
                               speaker_latent=spk_lat_np,
                               speaker_mask=spk_mask_np,
                               chunk_sizes=list(STREAM_BLOCKS), seed=0,
                               sampler_params=sampler_kw):
        pass
    ttfa_stream_ms = float(np.median([1e3 * stream_ttfa()
                                      for _ in range(3)]))

    # ---- the fused first-block opportunity: one program, one dispatch
    dec_state0 = init_decode_state(dac_cfg, 1, jnp.bfloat16)

    @jax.jit
    def fused_first(params, dac_params, pca, text_ids, text_mask,
                    speaker_latent, speaker_mask, noise, dec_state):
        kv_text = dit.get_kv_cache_text(params, cfg, text_ids, text_mask)
        kv_speaker = dit.get_kv_cache_speaker(
            params, cfg, speaker_latent.astype(jnp.bfloat16))
        # nested jit inlines during tracing — one fused XLA program
        x_t = core(params, noise, kv_text, kv_speaker,
                   text_mask, speaker_mask)
        z_q = jdac.pca_unwhiten(x_t, pca)
        audio, dec_state = decode_zq_block(
            dac_params, dac_cfg, dec_state, z_q.astype(jnp.bfloat16),
            max_positions=MAX_POSITIONS)
        return (audio[..., 0].astype(jnp.float32), x_t, kv_text,
                kv_speaker, dec_state)

    out = fused_first(params, dac_params, pca, text_ids, text_mask,
                      spk_lat, spk_mask, noise, dec_state0)
    np.asarray(out[0])
    fused_first_ms = _median(lambda: np.asarray(fused_first(
        params, dac_params, pca, text_ids, text_mask, spk_lat, spk_mask,
        noise, dec_state0)[0]))

    components = (host_text_ms + prefill_ms + sampler40_ms + decode40_ms
                  + transfer_ms + wav_write_ms)
    print(json.dumps({
        "host_text_ms": round(host_text_ms, 2),
        "prefill_ms": round(prefill_ms, 1),
        "sampler40_ms": round(sampler40_ms, 1),
        "decode40_ms": round(decode40_ms, 1),
        "transfer_ms": round(transfer_ms, 2),
        "wav_write_ms": round(wav_write_ms, 2),
        "components_sum_ms": round(components, 1),
        "ttfa_stream_ms": round(ttfa_stream_ms, 1),
        "residual_ms": round(ttfa_stream_ms - components + wav_write_ms,
                             1),
        "fused_first_ms": round(fused_first_ms, 1),
        "fused_vs_split_ms": round(
            (prefill_ms + sampler40_ms + decode40_ms + transfer_ms)
            - fused_first_ms, 1),
    }, indent=2))


if __name__ == "__main__":
    main()
