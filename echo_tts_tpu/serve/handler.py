"""Serverless-style request handler.

Re-implements the reference worker's request contract
(reference: handler.py:682-861) on the TPU pipeline:

  handler({"input": {...}}) -> dict

  synthesis input: {"text": str (<=4000 chars), "speaker_voice": filename?,
                    "parameters": {...sampler params...}, "seed": int?,
                    "session_id": str?, "boundary_mode":
                    "normalize"|"crossfade"|"none",
                    "max_chars_per_chunk": int?, "target_chunk_duration": s?}
  streaming:       {"text": ..., "stream": true, "chunk_size"?,
                    "num_chunks"?} -> per-block WAVs as they are produced
                    (the stdin protocol emits one JSON line per block)
  health check:    {"action": "health_check"}

Per-chunk seeds advance seed + idx*1000 (reference: handler.py:749); chunk
boundaries go through normalize_chunk_boundaries / crossfade_chunks
(reference: handler.py:763-768); the error envelope returns
{error, error_type, traceback} (reference: handler.py:797-803).
"""
from __future__ import annotations

import logging
import os
import time
import traceback
import uuid
from typing import Dict, List, Optional

import jax
import numpy as np

from ..config import SAMPLER_DEFAULTS
from ..pipeline import audio_io, dsp
from ..pipeline.pipeline import EchoModels, sample_pipeline
from ..sampler.euler import sample_euler_cfg_independent_guidances
from ..utils.profiling import StageTimer
from . import metrics
from . import models as models_mod
from .config import AUDIO_EXTENSIONS, ServeConfig, device_info, load_config, scan_voices
# Shape buckets live in serve/presets.py (repo rule); bound here so tests
# can shrink them via monkeypatch on this module.
from .presets import MAX_STREAM_CHUNKS, STREAM_CHUNK_SIZES
from .storage import sanitize_component, save_and_upload_audio

log = logging.getLogger("echo_tts_tpu.serve")

MAX_TEXT_CHARS = 4000       # reference: handler.py:690-698
SAMPLE_RATE = 44100
SEED_STRIDE = 1000          # reference: handler.py:749

# Voice-latent cache: encoding a reference voice costs 1-10 AE encodes
# (one per 30 s chunk — seconds of device time for a 5-minute voice), but
# serving traffic reuses a small library of voice files
# (reference: handler.py:711-718 voices dir).  Cache the encoded
# (latent, mask, bucket) per (path, mtime, size): repeat requests skip the
# encode entirely.  ~2 MB per 6400-latent entry; LRU-bounded.
import collections
import threading

VOICE_CACHE_MAX = 16
_VOICE_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_VOICE_CACHE_LOCK = threading.Lock()


def clear_voice_cache() -> None:
    with _VOICE_CACHE_LOCK:
        _VOICE_CACHE.clear()


def get_voice_latent(models: EchoModels, path: str):
    """(speaker_latent, speaker_mask, bucket) for a voice file, cached.
    The latent is padded to its static speaker bucket
    (serve/presets.py:pick_speaker_bucket) with the mask carrying the true
    length, so cache entries feed every request path (one-shot, stream,
    batch) without reshaping.  mtime+size key the entry: replacing the
    file re-encodes.  The MODEL bundle's identity is part of the key —
    latents are only valid for the encoder that produced them — and
    models.clear_models() clears this cache too (id() values may be
    reused after a bundle is garbage-collected)."""
    import weakref

    st = os.stat(path)
    key = (id(models), os.path.abspath(path), st.st_mtime_ns, st.st_size,
           models_frame_length(models))
    with _VOICE_CACHE_LOCK:
        hit = _VOICE_CACHE.get(key)
        # the weakref guards id() reuse for bundles NOT managed by the
        # serve.models singleton (clear_models covers the singleton): a
        # GC'd bundle whose address CPython hands to a new bundle must
        # miss, not serve latents from the old bundle's encoder
        if hit is not None and hit[0]() is models:
            _VOICE_CACHE.move_to_end(key)
            return hit[1]
    audio = audio_io.load_audio(path)
    from ..pipeline.pipeline import get_speaker_latent_and_mask
    from .presets import pick_speaker_bucket
    n_latents = audio.shape[-1] // models_frame_length(models)
    bucket = pick_speaker_bucket(n_latents)
    lat, mask = get_speaker_latent_and_mask(
        models, audio, max_speaker_latent_length=bucket, pad_to_max=True)
    with _VOICE_CACHE_LOCK:
        _VOICE_CACHE[key] = (weakref.ref(models), (lat, mask, bucket))
        while len(_VOICE_CACHE) > VOICE_CACHE_MAX:
            _VOICE_CACHE.popitem(last=False)
    log.info("voice cached: %s (bucket %d, %d entries)",
             os.path.basename(path), bucket, len(_VOICE_CACHE))
    return lat, mask, bucket


def build_sample_fn(parameters: Optional[Dict] = None,
                    preset: Optional[str] = None):
    """functools.partial-equivalent over the Euler sampler with request
    parameters + defaults (reference: handler.py:426-443); an optional named
    preset (serve/sampler_presets.json) supplies a base that explicit
    parameters override."""
    p = dict(SAMPLER_DEFAULTS)
    if preset:
        from .presets import get_preset
        p.update(get_preset(preset))
    unknown = set(parameters or ()) - set(p)
    if unknown:
        raise ValueError(f"unknown sampler parameters: {sorted(unknown)}")
    p.update(parameters or {})

    def sample_fn(models: EchoModels, speaker_latent, speaker_mask,
                  text_ids, text_mask, rng_seed: int):
        return sample_euler_cfg_independent_guidances(
            models.dit_params, models.dit_cfg, speaker_latent, speaker_mask,
            text_ids, text_mask, dtype=models.dtype,
            rng_key=jax.random.PRNGKey(rng_seed), **p)

    return sample_fn, p


def models_frame_length(models: EchoModels) -> int:
    return models.dac_cfg.frame_length


def _resolve_voice(cfg: ServeConfig, speaker_voice: str) -> str:
    """Path-traversal + extension checks (reference: handler.py:711-718)."""
    name = os.path.basename(speaker_voice)
    if name != speaker_voice or speaker_voice.startswith("."):
        raise ValueError("invalid speaker_voice: path components not allowed")
    if not name.lower().endswith(AUDIO_EXTENSIONS):
        raise ValueError(
            f"invalid speaker_voice extension; allowed: {AUDIO_EXTENSIONS}")
    path = os.path.join(cfg.voices_dir, name)
    if not os.path.isfile(path):
        raise FileNotFoundError(f"voice file not found: {name}")
    return path


def health_check(cfg: Optional[ServeConfig] = None,
                 batch_server=None) -> Dict:
    """Operational status without synthesis
    (reference: handler.py:609-679), extended with the metrics snapshot
    and — in concurrent mode — the micro-batch server's queue stats
    (depth/in-flight/expired/...; serve/server.py), so starvation and
    backpressure are VISIBLE, not inferred."""
    cfg = cfg or load_config()
    voices = scan_voices(cfg.voices_dir)
    out = {
        "status": "healthy" if not cfg.issues else "degraded",
        "config_issues": cfg.issues,
        "models_loaded": models_mod.models_loaded(),
        "device": device_info(),
        "s3_configured": cfg.s3_configured,
        "voices_dir": cfg.voices_dir,
        "voices_available": voices,
        "output_dir": cfg.output_dir,
        "ffmpeg": audio_io.ffmpeg_available(),
        # which DiT the worker serves (bf16 parity vs W8A8 non-parity) —
        # quality triage needs this visible; derived from the LOADED
        # bundle's parameter tree, not the env var (serve/models.py)
        "dit_quant": models_mod.served_quant_mode(),
        "metrics": metrics.snapshot(),
    }
    if batch_server is not None:
        out["batch_queue"] = batch_server.stats()
    return out


def synthesize(job_input: Dict, cfg: Optional[ServeConfig] = None,
               models: Optional[EchoModels] = None,
               batch_server=None) -> Dict:
    """Main synthesis path (reference: handler.py:682-803).

    With `batch_server` (a serve.server.MicroBatchServer), the request's
    chunks are submitted to the shared micro-batching executor instead of
    running inline — concurrent requests' chunks coalesce into one
    (G·B)-row sampler pass (serve/batcher.py).  Everything around the
    sampler (validation, chunking, voice encode-once, boundary DSP,
    upload, metadata) is identical in both modes, and per-request outputs
    match the serial path (seeds/noise are per-request, masks carry true
    lengths; equality pinned in test_server_integration)."""
    # Sanitize user-controlled filename components BEFORE any synthesis
    # work — failing at upload time would waste the full generation.
    request_id = sanitize_component(
        job_input.get("request_id") or uuid.uuid4().hex[:12], "request_id")
    if job_input.get("session_id") is not None:
        sanitize_component(job_input["session_id"], "session_id")
    t_start = time.time()
    timer = StageTimer()
    cfg = cfg or load_config()

    text = job_input.get("text")
    if not text or not isinstance(text, str):
        raise ValueError("'text' is required")
    if len(text) > MAX_TEXT_CHARS:
        raise ValueError(
            f"text too long: {len(text)} > {MAX_TEXT_CHARS} chars")

    boundary_mode = job_input.get("boundary_mode", "normalize")
    if boundary_mode not in ("normalize", "crossfade", "none"):
        raise ValueError(f"unknown boundary_mode: {boundary_mode}")

    sample_fn, sample_params = build_sample_fn(
        job_input.get("parameters"), preset=job_input.get("preset"))

    if models is None:
        with timer.stage("model_load"):
            models = models_mod.load_models(
                cfg.model_dir,
                allow_random=bool(job_input.get("_allow_random")))

    voice_path = None
    voice_name = job_input.get("speaker_voice")
    if voice_name:
        # existence/traversal checks fail fast; the (cached) encode runs
        # after text chunking so bad text never pays an encode
        voice_path = _resolve_voice(cfg, voice_name)

    from ..pipeline.text import chunk_text_for_audio

    chunks = chunk_text_for_audio(
        text,
        max_chars=int(job_input.get("max_chars_per_chunk", 300)),
        target_duration_seconds=float(
            job_input.get("target_chunk_duration", 10.0)))
    if not chunks:
        raise ValueError("text is empty after normalization")

    # Optional latency feature: bound generation length per chunk by the
    # text's estimated duration (bucketed), instead of the reference's
    # always-640-then-crop. Off by default — it changes sampling shapes
    # and therefore outputs for a given seed.
    auto_seq = bool(job_input.get("auto_sequence_length", False))

    seed = int(job_input.get("seed", 0))

    # Encode the voice ONCE for the whole request, through the process
    # voice-latent cache (bucket-padded to a static shape,
    # serve/presets.py) — repeat requests for a library voice skip the
    # encode entirely.
    spk_latent = spk_mask = None
    speaker_bucket = None
    if voice_path is not None:
        with timer.stage("voice_encode"):
            if batch_server is not None:
                # Concurrent mode: an uncached voice encode is DEVICE work
                # running on a pool thread — take the server's device lock
                # so it never co-resides in HBM with a padded batch pass
                # or a streaming job (the one-device-stream invariant,
                # serve/server.py).  get_voice_latent re-checks its cache
                # inside, so a second thread racing on the same voice
                # waits here and then hits the cache instead of encoding
                # twice.
                with batch_server.device_lock:
                    spk_latent, spk_mask, speaker_bucket = get_voice_latent(
                        models, voice_path)
            else:
                spk_latent, spk_mask, speaker_bucket = get_voice_latent(
                    models, voice_path)

    # Chunks run SEQUENTIALLY through the warm B=1 sampler program (the
    # repo's static-shape discipline: one compiled shape per bucket).
    # Batching a request's chunks was tried and reverted: the B=1 sampler
    # is already ~94% MFU, so grouped passes bought ~nothing while every
    # distinct chunk count compiled a fresh full-size program and large
    # speaker buckets multiplied HBM footprint.  The durable win — the
    # voice encoded ONCE above instead of per chunk — is kept.
    audio_chunks: List[np.ndarray] = []
    if batch_server is not None:
        # Concurrent mode: submit every chunk up front (so chunks of THIS
        # request coalesce with other requests' chunks in the executor),
        # then gather in order.  Seed progression and the pre-encoded
        # bucket-padded voice latent are identical to the serial loop.
        from .batcher import BatchRequest
        futs = []
        for idx, chunk in enumerate(chunks):
            chunk_params = dict(sample_params)
            if auto_seq:
                from .presets import pick_sequence_bucket
                chunk_params["sequence_length"] = pick_sequence_bucket(
                    chunk, sample_params["sequence_length"])
            futs.append(batch_server.submit(
                BatchRequest(text=chunk, seed=seed + idx * SEED_STRIDE,
                             speaker_latent=spk_latent,
                             speaker_mask=spk_mask,
                             request_id=f"{request_id}:{idx}"),
                chunk_params))
        with timer.stage("synthesis"):
            for idx, fut in enumerate(futs):
                res = fut.result()
                audio_chunks.append(np.asarray(res.audio))
                log.info("[%s] chunk %d/%d done (%.1fs audio, batched)",
                         request_id, idx + 1, len(chunks),
                         res.audio.shape[-1] / SAMPLE_RATE)
    else:
        for idx, chunk in enumerate(chunks):
            chunk_fn = sample_fn
            if auto_seq:
                from .presets import pick_sequence_bucket
                bucket = pick_sequence_bucket(
                    chunk, sample_params["sequence_length"])
                chunk_fn, _ = build_sample_fn(
                    {**(job_input.get("parameters") or {}),
                     "sequence_length": bucket},
                    preset=job_input.get("preset"))
            with timer.stage("synthesis"):
                chunk_audio, _ = sample_pipeline(
                    models, chunk_fn, chunk, None,
                    rng_seed=seed + idx * SEED_STRIDE,
                    speaker_latent=spk_latent, speaker_mask=spk_mask,
                    pad_to_max_speaker_latent_length=(
                        None if spk_latent is not None else speaker_bucket))
            audio_chunks.append(np.asarray(chunk_audio))
            log.info("[%s] chunk %d/%d done (%.1fs audio)", request_id,
                     idx + 1, len(chunks),
                     chunk_audio.shape[-1] / SAMPLE_RATE)

    with timer.stage("host_dsp"):
        if len(audio_chunks) == 1 or boundary_mode == "none":
            audio = np.concatenate(audio_chunks, axis=-1)
        elif boundary_mode == "crossfade":
            audio = dsp.crossfade_chunks(audio_chunks)
        else:  # "normalize" (validated above)
            audio = dsp.normalize_chunk_boundaries(audio_chunks)

    if audio.ndim == 1:
        audio = audio[None, :]

    with timer.stage("encode_upload"):
        upload = save_and_upload_audio(
            audio, SAMPLE_RATE, cfg, request_id,
            session_id=job_input.get("session_id"))

    gen_seconds = time.time() - t_start
    rtf = round((audio.shape[-1] / SAMPLE_RATE) / max(gen_seconds, 1e-9), 4)
    stage_timings = timer.report()
    for stage, rep in stage_timings.items():
        metrics.histogram(f"stage_{stage}_seconds").observe(rep["seconds"])
    metrics.histogram("request_seconds").observe(gen_seconds)
    metrics.histogram("rtf").observe(rtf)

    return {
        "status": "success",
        **upload,
        "metadata": {
            "request_id": request_id,
            "sample_rate": SAMPLE_RATE,
            "duration_seconds": round(audio.shape[-1] / SAMPLE_RATE, 3),
            "num_chunks": len(chunks),
            "seed": seed,
            "sampler": sample_params,
            "speaker_voice": voice_name,
            "device": device_info()["platform"],
            "generation_time_seconds": round(gen_seconds, 3),
            "stage_timings": stage_timings,
            "rtf": rtf,
        },
    }




def iter_synthesize_stream(job_input: Dict,
                           cfg: Optional[ServeConfig] = None,
                           models: Optional[EchoModels] = None):
    """Generator form of the streaming synthesis job: yields one
    {"event": "block", ...} dict per produced audio block (its WAV already
    on disk), then the final {"event": "final", ...} envelope — the shape
    runpod's generator-handler protocol and the stdin protocol both need.

    input: {"text", "stream": true, "speaker_voice"?, "seed"?,
            "chunk_size"? in STREAM_CHUNK_SIZES (default 160),
            "num_chunks"? 1..MAX_STREAM_CHUNKS (default 4),
            "chunk_sizes"? explicit per-block schedule (each in
            STREAM_CHUNK_SIZES; overrides chunk_size/num_chunks — e.g.
            [80, 160, 160, 160] halves time-to-first-audio), "preset"?,
            "parameters"? (sampler params sans sequence_length),
            "session_id"?}
    The reference has no streaming serving path — this is a framework
    addition on its blockwise sampler.
    """
    from .streaming import stream_synthesize

    request_id = job_input.get("request_id") or uuid.uuid4().hex[:12]
    request_id = sanitize_component(request_id, "request_id")
    session_id = job_input.get("session_id")
    if session_id is not None:
        session_id = sanitize_component(session_id, "session_id")
    t_start = time.time()
    cfg = cfg or load_config()

    text = job_input.get("text")
    if not text or not isinstance(text, str):
        raise ValueError("'text' is required")
    if len(text) > MAX_TEXT_CHARS:
        raise ValueError(
            f"text too long: {len(text)} > {MAX_TEXT_CHARS} chars")

    chunk_size = int(job_input.get("chunk_size", 160))
    if chunk_size not in STREAM_CHUNK_SIZES:
        raise ValueError(
            f"chunk_size must be one of {STREAM_CHUNK_SIZES} (static-shape "
            "buckets; arbitrary values would compile a new program each)")
    num_chunks = int(job_input.get("num_chunks", 4))
    if not 1 <= num_chunks <= MAX_STREAM_CHUNKS:
        raise ValueError(
            f"num_chunks must be in [1, {MAX_STREAM_CHUNKS}]")
    chunk_sizes = job_input.get("chunk_sizes")
    if chunk_sizes is not None:
        chunk_sizes = [int(c) for c in chunk_sizes]
        if not chunk_sizes or len(chunk_sizes) > MAX_STREAM_CHUNKS:
            raise ValueError(
                f"chunk_sizes must have 1..{MAX_STREAM_CHUNKS} entries")
        bad = [c for c in chunk_sizes if c not in STREAM_CHUNK_SIZES]
        if bad:
            raise ValueError(
                f"chunk_sizes entries must be in {STREAM_CHUNK_SIZES} "
                f"(static-shape buckets), got {bad}")

    # preset + parameter validation/merge shared with the batch path
    _, params = build_sample_fn(job_input.get("parameters"),
                                preset=job_input.get("preset"))
    params = dict(params)
    params.pop("sequence_length", None)

    if models is None:
        models = models_mod.load_models(
            cfg.model_dir, allow_random=bool(job_input.get("_allow_random")))

    spk_latent = spk_mask = None
    voice_name = job_input.get("speaker_voice")
    if voice_name:
        # cached + bucket-padded (same static-shape discipline as the
        # batch path; repeat streams of a library voice skip the encode)
        spk_latent, spk_mask, _ = get_voice_latent(
            models, _resolve_voice(cfg, voice_name))

    out_dir = (os.path.join(cfg.output_dir, session_id) if session_id
               else cfg.output_dir)
    os.makedirs(out_dir, exist_ok=True)

    blocks = []
    pieces = []
    for chunk in stream_synthesize(
            models, text, None, chunk_size=chunk_size,
            num_chunks=num_chunks, chunk_sizes=chunk_sizes,
            seed=int(job_input.get("seed", 0)),
            sampler_params=params, speaker_latent=spk_latent,
            speaker_mask=spk_mask):
        path = os.path.join(
            out_dir, f"{request_id}_block{chunk.index:03d}.wav")
        audio_io.write_wav(path, chunk.audio, SAMPLE_RATE)
        info = {
            "event": "block",
            "request_id": request_id,
            "index": chunk.index,
            "local_path": path,
            "latent_start": chunk.latent_start,
            "latent_end": chunk.latent_end,
            "duration_seconds": round(chunk.audio.shape[-1] / SAMPLE_RATE,
                                      3),
            "is_last": chunk.is_last,
            "elapsed_seconds": round(time.time() - t_start, 3),
        }
        if not blocks:  # first audio out the door — the stream's TTFA
            metrics.histogram("ttfa_seconds").observe(
                info["elapsed_seconds"])
        blocks.append(info)
        pieces.append(chunk.audio)
        yield info

    audio = np.concatenate(pieces, axis=-1)
    # final artifact goes through the same Opus/S3 path as batch jobs
    upload = save_and_upload_audio(audio, SAMPLE_RATE, cfg, request_id,
                                   session_id=session_id)
    total = time.time() - t_start
    metrics.histogram("stream_seconds").observe(total)
    metrics.histogram("streamed_rtf").observe(
        round((audio.shape[-1] / SAMPLE_RATE) / max(total, 1e-9), 4))
    yield {
        "event": "final",
        "status": "success",
        **upload,
        "blocks": blocks,
        "metadata": {
            "request_id": request_id,
            "sample_rate": SAMPLE_RATE,
            "duration_seconds": round(audio.shape[-1] / SAMPLE_RATE, 3),
            "num_blocks": len(blocks),
            "seed": int(job_input.get("seed", 0)),
            "sampler": params,
            "speaker_voice": voice_name,
            "device": device_info()["platform"],
            "generation_time_seconds": round(total, 3),
            "first_block_seconds": blocks[0]["elapsed_seconds"],
            "rtf": round((audio.shape[-1] / SAMPLE_RATE)
                         / max(total, 1e-9), 4),
        },
    }


def synthesize_stream(job_input: Dict, cfg: Optional[ServeConfig] = None,
                      models: Optional[EchoModels] = None,
                      on_block=None) -> Dict:
    """Blocking wrapper over iter_synthesize_stream: fires on_block per
    block and returns the final envelope."""
    final = None
    for event in iter_synthesize_stream(job_input, cfg=cfg, models=models):
        if event.get("event") == "block":
            if on_block is not None:
                on_block(event)
        else:
            final = event
    return final


def handler(job: Dict, on_block=None, batch_server=None,
            cfg: Optional[ServeConfig] = None) -> Dict:
    """Queue-worker entry point (reference: handler.py:806-816).
    `batch_server` routes synthesis jobs through the shared
    micro-batching executor (see synthesize); streaming jobs always run
    serially — their latency contract is per-block, not per-request.
    `cfg` (optional) avoids re-reading the environment per job — the
    concurrent intake loop passes its own config through."""
    try:
        job_input = job.get("input") or {}
        action = job_input.get("action")
        if action == "health_check":
            return health_check(cfg, batch_server=batch_server)
        if action == "metrics":
            # metrics-only poll: cheaper than a full health check and
            # safe to hit at high frequency (no dir scans / device calls)
            out = {"metrics": metrics.snapshot()}
            if batch_server is not None:
                out["batch_queue"] = batch_server.stats()
            return out
        metrics.counter("requests_total").inc()
        if job_input.get("stream"):
            out = synthesize_stream(job_input, cfg=cfg, on_block=on_block)
        else:
            out = synthesize(job_input, cfg=cfg, batch_server=batch_server)
        return out
    except Exception as exc:
        metrics.counter("errors_total").inc()
        metrics.counter(f"errors_{type(exc).__name__}").inc()
        return {
            "error": str(exc),
            "error_type": type(exc).__name__,
            "traceback": traceback.format_exc(),
        }
    finally:
        if cfg is not None and cfg.metrics_file:
            try:
                extra = ({"batch_queue": batch_server.stats()}
                         if batch_server is not None else None)
                metrics.write_metrics_file(cfg.metrics_file, extra=extra)
            except OSError as exc:  # never fail a job on metrics IO
                log.warning("metrics file write failed: %r", exc)


def handler_generator(job: Dict):
    """Generator entry point for runpod's streaming protocol — opt-in:
    `runpod.serverless.start({"handler": handler_generator,
    "return_aggregate_stream": True})` delivers per-block events over
    /stream, but ALSO changes every aggregated output (batch jobs,
    health checks, errors) to a one-element LIST of the envelope.  The
    default deployment keeps the dict-shaped `handler` contract
    (identical to the reference worker); streaming jobs there still write
    block WAVs progressively to the output dir for polling."""
    try:
        job_input = job.get("input") or {}
        if job_input.get("action") == "health_check":
            yield health_check()
        elif job_input.get("stream"):
            yield from iter_synthesize_stream(job_input)
        else:
            yield synthesize(job_input)
    except Exception as exc:
        yield {
            "error": str(exc),
            "error_type": type(exc).__name__,
            "traceback": traceback.format_exc(),
        }


def warmup_compile(models: EchoModels,
                   parameters: Optional[Dict] = None, *,
                   full: bool = False, batch_sizes=(),
                   manifest=None) -> None:
    """Compile the production programs so no accepted request shape pays
    an XLA compile at traffic time (run with a persistent
    JAX_COMPILATION_CACHE_DIR and every restart is warm).

    The shapes come from serve.presets.warmup_manifest — derived from the
    SAME constants request validation uses, so the warmed surface and the
    accepted surface cannot drift apart.  Default: the high-traffic
    subset (default sequence length, speaker {none, smallest bucket},
    default + growing stream schedules).  full=True enumerates the
    ENTIRE accepted surface (every sequence x speaker bucket, every
    reachable (stream-total bucket x block size x first/later) program);
    batch_sizes warms the micro-batch server's (G*B)-row programs.
    Every entry executes through the real request paths so the XLA cache
    keys match production exactly."""
    from .presets import warmup_manifest
    from .streaming import stream_synthesize

    if manifest is None:
        manifest = warmup_manifest(
            batch_sizes, full=full,
            default_sequence_length=(parameters or {}).get(
                "sequence_length"))

    def spk_latent(bucket):
        if bucket is None:
            return None
        return np.zeros((1, bucket, models.dit_cfg.latent_size),
                        np.float32)

    t_all = time.time()
    # Voice AE-encode program: every manifest entry passes a pre-made
    # latent, but a real `speaker_voice` request encodes the reference
    # through get_speaker_latent_and_mask — ONE static 30 s-chunk encode
    # program shared by all buckets (pipeline.py). Warm it here or the
    # first voiced request pays the codec-encoder compile.
    from ..pipeline.pipeline import get_speaker_latent_and_mask
    from .presets import pick_speaker_bucket
    spl = models.dac_cfg.frame_length
    get_speaker_latent_and_mask(
        models, np.zeros((1, 640 * spl), np.float32),
        max_speaker_latent_length=pick_speaker_bucket(640),
        pad_to_max=True)
    log.info("warmup voice-encode program: %.1fs", time.time() - t_all)
    for i, e in enumerate(manifest):
        t0 = time.time()
        s = e.get("speaker_bucket")
        if e["kind"] == "oneshot":
            sample_fn, _ = build_sample_fn(
                {**(parameters or {}),
                 "sequence_length": e["sequence_length"]})
            lat = spk_latent(s)
            sample_pipeline(
                models, sample_fn, "Warmup utterance.", None, rng_seed=0,
                speaker_latent=lat,
                speaker_mask=(None if lat is None
                              else np.ones(lat.shape[:2], bool)))
        elif e["kind"] == "stream":
            for _ in stream_synthesize(
                    models, "Warmup utterance.", None,
                    chunk_sizes=e["chunk_sizes"],
                    speaker_latent=spk_latent(s),
                    sampler_params=parameters):
                pass
        elif e["kind"] == "batch":
            from .batcher import BatchRequest, run_batch
            lat = spk_latent(s)
            run_batch(
                models,
                [BatchRequest(text="Warmup utterance.", seed=k,
                              speaker_latent=lat)
                 for k in range(e["batch_size"])],
                sampler_params={**(parameters or {}),
                                "sequence_length": e["sequence_length"]},
                speaker_bucket=s)
        else:
            raise ValueError(f"unknown warmup entry kind: {e['kind']!r}")
        log.info("warmup %d/%d %s: %.1fs", i + 1, len(manifest), e,
                 time.time() - t0)
    log.info("warmup compile: %d entries in %.1fs", len(manifest),
             time.time() - t_all)


def serve_stdin_concurrent(cfg: ServeConfig, *, max_batch: int,
                           allow_random: bool = False,
                           lines=None, emit=None) -> None:
    """Concurrent stdin/stdout protocol: synthesis jobs run on a thread
    pool and their chunks coalesce in one MicroBatchServer (one device
    stream, bounded HBM — serve/server.py); streaming jobs run on a
    dedicated single worker (intake never blocks) that holds the
    server's device_lock for the stream's duration, so a blockwise
    stream's KV never co-resides in HBM with a padded batch pass — the
    one-device-stream invariant survives concurrency at the cost of
    batch work queueing behind an active stream.  Responses carry
    request_id; completion order is NOT input order (clients correlate
    by request_id).  `lines`/`emit` exist for tests; production uses
    stdin/print."""
    import json
    import sys
    from concurrent.futures import ThreadPoolExecutor

    from .server import MicroBatchServer

    models = models_mod.load_models(cfg.model_dir,
                                    allow_random=allow_random)
    server = MicroBatchServer(models, max_batch=max_batch)
    if emit is None:
        import threading
        _lock = threading.Lock()

        def emit(obj):
            with _lock:
                print(json.dumps(obj), flush=True)

    pool = ThreadPoolExecutor(max_workers=max_batch,
                              thread_name_prefix="echo-job")
    stream_pool = ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix="echo-stream")

    def run_stream(j):
        with server.device_lock:
            emit(handler(j, on_block=emit, cfg=cfg))

    pending = []
    try:
        for line in (lines if lines is not None else sys.stdin):
            line = line.strip() if isinstance(line, str) else line
            if not line:
                continue
            if isinstance(line, str):
                try:
                    job = json.loads(line)
                except json.JSONDecodeError as exc:
                    emit({"error": f"invalid JSON: {exc}",
                          "error_type": "JSONDecodeError", "traceback": ""})
                    continue
            else:
                job = line
            job_input = job.get("input") or {}
            if job_input.get("stream"):
                pending.append(stream_pool.submit(run_stream, job))
            else:
                pending.append(pool.submit(
                    lambda j=job: emit(handler(j, batch_server=server,
                                               cfg=cfg))))
            # completed futures are done emitting; drop them so a
            # long-lived worker's pending list stays O(in-flight), not
            # O(total requests served).  handler() envelopes job errors,
            # so an exception here means EMIT itself failed (e.g. a
            # broken stdout pipe) — that must be logged, not swallowed,
            # or the worker keeps burning synthesis passes with every
            # response lost.
            still = []
            for f in pending:
                if not f.done():
                    still.append(f)
                elif f.exception() is not None:
                    log.error("response emit failed: %r", f.exception())
            pending = still
        for f in pending:
            try:
                f.result()
            except Exception as exc:  # same treatment as the mid-run drain
                log.error("response emit failed: %r", exc)
    finally:
        pool.shutdown(wait=True)
        stream_pool.shutdown(wait=True)
        server.shutdown()


def main(argv: Optional[List[str]] = None) -> None:
    """CLI: `--warmup` pre-loads models then exits
    (reference: handler.py:822-861); `--warmup-compile` additionally
    compiles the default-shape programs.  Otherwise starts the runpod
    worker when available, else serves stdin/stdout JSON lines —
    serially by default, or with `--concurrent N` / ECHO_CONCURRENT=N
    through the micro-batching executor (serve_stdin_concurrent)."""
    import argparse
    import json
    import sys

    parser = argparse.ArgumentParser()
    parser.add_argument("--warmup", action="store_true")
    parser.add_argument("--warmup-compile", action="store_true")
    parser.add_argument(
        "--warmup-full", action="store_true",
        help="warm the ENTIRE accepted shape surface (every sequence x "
             "speaker bucket and stream program; one-time, long on a "
             "cold cache) instead of the high-traffic subset")
    parser.add_argument("--allow-random-weights", action="store_true")
    parser.add_argument(
        "--concurrent", type=int,
        default=int(os.environ.get("ECHO_CONCURRENT", "0")),
        help="coalesce up to N concurrent synthesis jobs per device batch "
             "(stdin protocol; 0 = serial, matching the reference worker)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    # Multi-host pods: join the jax.distributed cluster BEFORE any backend
    # use when ECHO_COORD is set (parallel/distributed.py launch recipe);
    # single-host (the default stance, like the reference's share-nothing
    # workers) is a no-op.
    from ..parallel.distributed import initialize_from_env
    if initialize_from_env():
        log.info("joined jax.distributed cluster: process %d/%d",
                 jax.process_index(), jax.process_count())

    cfg = load_config()
    for issue in cfg.issues:
        log.warning("config: %s (starting anyway)", issue)

    if args.warmup or args.warmup_compile or args.warmup_full:
        models = models_mod.load_models(
            cfg.model_dir, allow_random=args.allow_random_weights)
        if args.warmup_compile or args.warmup_full:
            # warm every batch bucket the server can pad a group to —
            # the server never runs any other batch size
            # (serve/server.py padding, presets.batch_size_buckets)
            from .presets import batch_size_buckets
            warmup_compile(
                models, full=args.warmup_full,
                batch_sizes=(batch_size_buckets(args.concurrent)
                             if args.concurrent > 0 else ()))
        log.info("warmup complete")
        return

    try:
        import runpod
        # dict-shaped contract (matches the reference worker); swap in
        # handler_generator + return_aggregate_stream for per-block
        # /stream delivery — see handler_generator's docstring for the
        # output-shape trade-off.  Streaming jobs still write block WAVs
        # progressively under this handler.
        runpod.serverless.start({"handler": handler})
    except ImportError:
        if args.concurrent > 0:
            log.info("runpod not installed; serving JSON lines on stdin "
                     "with micro-batching (max_batch=%d)", args.concurrent)
            serve_stdin_concurrent(
                cfg, max_batch=args.concurrent,
                allow_random=args.allow_random_weights)
            return
        log.info("runpod not installed; serving JSON lines on stdin")
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            try:
                job = json.loads(line)
            except json.JSONDecodeError as exc:
                print(json.dumps({"error": f"invalid JSON: {exc}",
                                  "error_type": "JSONDecodeError",
                                  "traceback": ""}), flush=True)
                continue
            # streaming jobs emit one JSON line per audio block as it is
            # produced, then the final envelope
            out = handler(job, cfg=cfg,
                          on_block=lambda b: print(json.dumps(b),
                                                   flush=True))
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
