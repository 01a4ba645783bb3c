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
  ttfa_ms      streaming time-to-first-audio: call -> first block's audio
               on the host (growing blocks [40, 80, 160, 320, 320, 320],
               first block ~1.9 s of audio; serve/streaming.py pipelined
               loop), median of 3
  streamed_rtf streaming real-time factor over the same 1240-latent
               (57.6 s) long-form utterance: audio seconds / wall seconds
               from call to last block on host, median of 3
  throughput_rtf_b8  batched serving throughput: 8 requests through
               serve/batcher.run_batch (ONE (3*8)-row CFG-batched sampler
               + one B=8 decode, shared 640-latent voice latent), nominal
               generated audio seconds / wall seconds, median of 2
  throughput_rtf_b8_chip  the same batch measured CHIP-SIDE (scalar-
               checksum stage programs: B=8 prefill + (3*8)-row sampler +
               2x B=4 decode) — excludes host text processing and the
               axon tunnel's device->host audio transfers, which are a
               dev-tunnel artifact, not a production cost
  ttfa_serve_ms  time-to-first-audio measured at the SERVING layer
               (serve/handler.iter_synthesize_stream: request validation,
               cached voice latent, per-block WAV write + event emit) —
               the delta over ttfa_ms is the serve layer's own overhead
  sampler_int8_ms  the same 40-step loop with the W8A8 DiT
               (ECHO_DIT_QUANT=int8, ops/quant.py — opt-in NON-PARITY
               mode; int8 MXU matmuls, same sampler semantics)
  rtf_int8     end-to-end RTF of the int8 mode, computed from stages
               (prefill and decode are mode-independent):
               audio_s / (prefill + sampler_int8 + decode)
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
    # snake_approx mirrors the serving default on accelerators
    # (serve/models.py:_serving_dac_config): the polynomial sin^2's 1.6e-6
    # error is ~100x below the bf16 codec's own rounding, and the decoder
    # is otherwise bound by the VPU sin (180 -> 114 ms measured).
    import dataclasses
    dac_cfg = dataclasses.replace(base_dac_config(), snake_approx=True)

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

    # The timed end-to-end program returns ONLY a scalar checksum: the axon
    # tunnel moves ~70 MB/s device->host, so transferring the 5 MB waveform
    # inside the timed region would add ~70 ms of tunnel time that the
    # stage breakdown (also scalar-checksum) excludes, making
    # prefill+sampler+decode fail to reconcile with the headline.
    def generate_chk(*a, seq):
        audio = generate(*a, seq=seq)
        return jnp.sum(audio.astype(jnp.float32))

    gen = jax.jit(generate_chk, static_argnames=("seq",))
    inputs = dict(text_ids=text_ids, text_mask=text_mask,
                  speaker_latent=speaker_latent, speaker_mask=speaker_mask,
                  rng=ki[2], noise=noise)

    # The streaming stage needs the blockwise sampler, whose latent-prefix
    # encoder params the blockwise=False build drops
    # (delete_blockwise_modules, inference.py:28-34) — so the EchoModels
    # bundle carries a SECOND, blockwise=True parameter set.  The one-shot
    # stages keep the blockwise=False params so their banked compiles
    # (pytree-structure-keyed) stay valid.
    from echo_tts_tpu.pipeline.pipeline import EchoModels
    cfg_bw = base_dit_config(blockwise=True)
    params_bw = dit.init_dit_params(jax.random.PRNGKey(4), cfg_bw,
                                    dtype=jnp.bfloat16)
    models = EchoModels(params_bw, cfg_bw, dac_params, dac_cfg, pca,
                        dtype=jnp.bfloat16)

    # --- chip-side B=8 stage programs (close over cfg_bw: they run on the
    # models bundle's params, AFTER the one-shot arrays are freed) ---
    @jax.jit
    def prefill_b8(params, text_ids, text_mask, speaker_latent):
        kv_text = dit.get_kv_cache_text(params, cfg_bw, text_ids, text_mask)
        kv_speaker = dit.get_kv_cache_speaker(
            params, cfg_bw, speaker_latent.astype(jnp.bfloat16))
        (k, v), spk_cols = dit.concat_static_kv(cfg_bw, kv_text, kv_speaker)
        chk = (jnp.sum(k.astype(jnp.float32))
               + jnp.sum(v.astype(jnp.float32)))
        return (k, v), spk_cols, chk

    @jax.jit
    def sampler_b8(params, kv_static, spk_cols, text_mask, speaker_mask,
                   noise):
        mask_cfg, mask_plain = make_cfg_branch_masks(
            cfg_bw, text_mask, speaker_mask)
        latents = run_step_segments(
            params, cfg_bw, noise.astype(jnp.float32), plan, kv_static,
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

    b8 = (prefill_b8, sampler_b8, decode_b4)
    return (gen, prefill, sampler_only, decode_only, params, dac_params,
            pca, inputs, models, sampler_kw, b8)


# Streamed-stage block schedule: growing blocks (serve/presets.py:
# growing_schedule) — a ~1.9 s first block for first audio, then doubling
# to the per-query-efficient 320s; 1240 latents ≈ 57.6 s of audio, the
# long-form shape streaming exists for.
STREAM_BLOCKS = (40, 80, 160, 320, 320, 320)
STREAM_TEXT = ("The quick brown fox jumps over the lazy dog while the "
               "orchestra tunes quietly in the hall, and a narrator "
               "describes the scene in a calm, steady voice for the "
               "benchmark recording. ") * 3  # ~600 bytes < the 768 bucket


def _stream_once(models, inp, sampler_kw):
    """One pipelined streamed synthesis; returns (ttfa_s, total_s)."""
    from echo_tts_tpu.serve.streaming import stream_synthesize
    t0 = time.perf_counter()
    ttfa = None
    for chunk in stream_synthesize(
            models, STREAM_TEXT,
            speaker_latent=np.asarray(inp["speaker_latent"]),
            speaker_mask=np.asarray(inp["speaker_mask"]),
            chunk_sizes=STREAM_BLOCKS, seed=0, sampler_params=sampler_kw):
        if ttfa is None:
            ttfa = time.perf_counter() - t0
    return ttfa, time.perf_counter() - t0


def _serve_ttfa_once(models, job, cfg_srv):
    """One streamed request through the SERVING layer; returns first-block
    latency (request validation + cached voice latent + sampler block +
    incremental decode + WAV write + event build).  The stream is drained
    fully so the next run never overlaps leftover device work."""
    from echo_tts_tpu.serve import handler as h
    t0 = time.perf_counter()
    ttfa = None
    for ev in h.iter_synthesize_stream(job, cfg=cfg_srv, models=models):
        if ttfa is None and ev.get("event") == "block":
            ttfa = time.perf_counter() - t0
    return ttfa


def _serve_ttfa(models, sampler_kw, n=3):
    import shutil
    import tempfile

    from echo_tts_tpu.pipeline import audio_io
    from echo_tts_tpu.serve.config import load_config

    tmp = tempfile.mkdtemp(prefix="echo_bench_serve_")
    try:
        voices = os.path.join(tmp, "voices")
        os.makedirs(voices)
        rng = np.random.default_rng(3)
        # ~30 s voice -> the 640-latent bucket, matching the library stage
        audio = (0.1 * rng.standard_normal((1, 640 * 2048))).astype(
            np.float32)
        audio_io.write_wav(os.path.join(voices, "bench.wav"), audio, 44100)
        cfg_srv = load_config({"AUDIO_VOICES_DIR": voices,
                               "OUTPUT_AUDIO_DIR": os.path.join(tmp, "out"),
                               "HF_TOKEN": "x"})
        job = {"text": STREAM_TEXT, "stream": True,
               "chunk_sizes": list(STREAM_BLOCKS), "seed": 0,
               "speaker_voice": "bench.wav", "parameters": dict(sampler_kw)}
        _serve_ttfa_once(models, job, cfg_srv)  # warm voice cache + programs
        return 1e3 * float(np.median(
            [_serve_ttfa_once(models, job, cfg_srv) for _ in range(n)]))
    finally:
        # ~10 MB of voice + drained block WAVs per run; don't litter /tmp
        shutil.rmtree(tmp, ignore_errors=True)


BATCH_TEXTS = [
    "Request number %d reads a different sentence so the batch is not "
    "degenerate; the narrator keeps an even pace throughout." % i
    for i in range(8)
]


def _batch_once(models, inp, sampler_kw):
    """8 requests through the micro-batcher; returns wall seconds."""
    from echo_tts_tpu.serve.batcher import BatchRequest, run_batch
    lat = np.asarray(inp["speaker_latent"])
    reqs = [BatchRequest(text=t, seed=100 + i, speaker_latent=lat)
            for i, t in enumerate(BATCH_TEXTS)]
    t0 = time.perf_counter()
    results = run_batch(models, reqs,
                        sampler_params=dict(sampler_kw,
                                            sequence_length=SEQ))
    assert len(results) == 8
    return time.perf_counter() - t0


def _b8_chip(b8, models, inp, n=2):
    """Chip-side wall time for one 8-request batch: B=8 prefill +
    (3*8)-row sampler + 2x B=4 decode, each stage a scalar-checksum
    program (no host text processing, no audio transfer over the
    tunnel).  Returns (wall_s, latents) — stages timed back-to-back in
    one region so inter-stage dispatch overlap is counted honestly."""
    prefill_b8, sampler_b8, decode_b4 = b8
    params = models.dit_params
    text_ids = jnp.tile(inp["text_ids"], (8, 1))
    text_mask = jnp.tile(inp["text_mask"], (8, 1))
    spk_lat = jnp.tile(inp["speaker_latent"], (8, 1, 1))
    spk_mask = jnp.tile(inp["speaker_mask"], (8, 1))
    noise = jax.random.normal(jax.random.PRNGKey(7),
                              (8, SEQ, spk_lat.shape[-1]), jnp.float32)

    def once():
        t0 = time.perf_counter()
        kv, cols, chk = prefill_b8(params, text_ids, text_mask, spk_lat)
        latents, chk_s = sampler_b8(params, kv, cols, text_mask, spk_mask,
                                    noise)
        c0 = decode_b4(models.dac_params, models.pca, latents[:4])
        c1 = decode_b4(models.dac_params, models.pca, latents[4:])
        np.asarray(chk), np.asarray(chk_s), np.asarray(c0), np.asarray(c1)
        return time.perf_counter() - t0

    once()                                    # compile + warmup
    return float(np.median([once() for _ in range(n)]))


def main():
    (gen, prefill, sampler_only, decode_only, params, dac_params, pca,
     inp, models, sampler_kw, b8) = build()

    def full(seq):
        return gen(params, dac_params, pca, inp["text_ids"],
                   inp["text_mask"], inp["speaker_latent"],
                   inp["speaker_mask"], inp["rng"], seq=seq)

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

    # int8 opt-in serving mode (ops/quant.py; ECHO_DIT_QUANT=int8): the
    # identical 40-step program over the W8A8 parameter tree.  Timed on
    # the same KV/noise; prefill and decode never touch the quantized
    # leaves, so rtf_int8 is reported from the stage sum (the round-3
    # measurement change made the stages reconcile with end-to-end).
    from echo_tts_tpu.ops.quant import quantize_dit_params
    qparams = quantize_dit_params(params)
    _, chk_q = sampler_only(qparams, kv_static, spk_cols, inp["text_mask"],
                            inp["speaker_mask"], inp["noise"])
    np.asarray(chk_q)
    sampler_int8_ms = 1e3 * _timeit(lambda: sampler_only(
        qparams, kv_static, spk_cols, inp["text_mask"], inp["speaker_mask"],
        inp["noise"])[1])
    del qparams
    rtf_int8 = AUDIO_SECONDS / (
        (prefill_ms + sampler_int8_ms + decode_ms) / 1e3)

    # Free the one-shot stage arrays before the blockwise/batched stages:
    # two full DiT parameter sets plus B=8 activations would pressure the
    # 16 GB HBM (the batch stage OOMed before this was added).
    del params, kv_static, latents

    # streaming: time-to-first-audio + streamed RTF (pipelined loop,
    # serve/streaming.py; blockwise sampler + incremental codec decode)
    _stream_once(models, inp, sampler_kw)          # compile + warmup
    stream_runs = [_stream_once(models, inp, sampler_kw) for _ in range(3)]
    ttfa_ms = 1e3 * float(np.median([r[0] for r in stream_runs]))
    stream_audio_s = sum(STREAM_BLOCKS) * 2048 / 44100.0
    streamed_rtf = stream_audio_s / float(
        np.median([r[1] for r in stream_runs]))

    # serving-layer TTFA: the same streamed shape through
    # serve/handler.iter_synthesize_stream (validation + cached voice
    # latent + per-block WAV write + event emit)
    ttfa_serve_ms = _serve_ttfa(models, sampler_kw)

    # batched throughput: 8 requests, one (G*8)-row sampler + B=8 decode
    _batch_once(models, inp, sampler_kw)           # compile + warmup
    batch_wall = float(np.median([_batch_once(models, inp, sampler_kw)
                                  for _ in range(2)]))
    throughput_rtf_b8 = 8 * AUDIO_SECONDS / batch_wall

    # the same batch chip-side (scalar checksums; no tunnel audio
    # transfer, no host text processing) — the production-relevant number
    b8_wall = _b8_chip(b8, models, inp)
    throughput_rtf_b8_chip = 8 * AUDIO_SECONDS / b8_wall

    print(json.dumps({
        "metric": "rtf_audio_sec_per_sec_per_chip",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
        "prefill_ms": round(prefill_ms, 1),
        "sampler_ms": round(sampler_ms, 1),
        "decode_ms": round(decode_ms, 1),
        "p50_short_ms": round(p50_short_ms, 1),
        "ttfa_ms": round(ttfa_ms, 1),
        "ttfa_serve_ms": round(ttfa_serve_ms, 1),
        "streamed_rtf": round(streamed_rtf, 3),
        "throughput_rtf_b8": round(throughput_rtf_b8, 3),
        "throughput_rtf_b8_chip": round(throughput_rtf_b8_chip, 3),
        "sampler_int8_ms": round(sampler_int8_ms, 1),
        "rtf_int8": round(rtf_int8, 3),
    }))


if __name__ == "__main__":
    main()
