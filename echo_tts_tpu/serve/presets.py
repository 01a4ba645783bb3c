"""Sampler presets + static-shape bucketing.

Presets mirror the reference's sampler_presets.json (6 presets varying CFG
scales, truncation and temporal rescale; reference: sampler_presets.json:1-62,
loaded at gradio_app.py:431-451).  Values here are proper JSON numbers
instead of the reference's strings.

Buckets are the static-shape discipline the reference uses to keep
torch.compile shapes stable (reference: gradio_app.py:128-155,229-247) —
exactly what XLA needs: text {768}, speaker {640, 2816, 6400} latents,
picked with find_min_bucket_gte.
"""
from __future__ import annotations

import functools
import json
import os
from typing import Dict, Optional

from ..pipeline.text import find_min_bucket_gte

PRESETS_PATH = os.path.join(os.path.dirname(__file__),
                            "sampler_presets.json")

TEXT_BUCKETS = "768"
SPEAKER_BUCKETS = "640, 2816, 6400"
# Generation-length buckets for auto_sequence_length (latents; 640 ≈ 29.7 s)
SEQUENCE_BUCKETS = "160, 320, 480, 640"
# Streaming-job block sizes (latents) and block-count cap: only these are
# accepted so the number of compiled (prefix_len, block_size) programs
# stays bounded (sampler/blockwise.py compiles one program per pair).
# 40 exists for time-to-first-audio (a ~1.9 s first block samples in
# ~170 ms); larger blocks are per-query cheaper (the MXU pads the query
# rows to 128-row tiles), so a GROWING schedule like (40, 80, 160, 320,
# 320, ...) is the latency/throughput sweet spot (docs/PERFORMANCE.md §6).
STREAM_CHUNK_SIZES = (40, 80, 160, 320)
MAX_STREAM_CHUNKS = 16
# Stream-TOTAL buckets: the blockwise sampler compiles per (total_len,
# block_size), so without bucketing every distinct schedule total is a
# fresh full-size XLA compile.  stream_synthesize pads the prefix buffer
# to the smallest bucket >= the schedule total (masked padding — outputs
# identical, sampler/blockwise.py), making the serving compile surface
# FINITE: buckets x block sizes x {first, later} x speaker widths.  The
# top bucket covers the largest acceptable schedule (16 x 320 = 5120).
STREAM_TOTAL_BUCKETS = "320, 640, 960, 1280, 1920, 2560, 3840, 5120"


def pick_stream_total_bucket(total_latents: int,
                             buckets: str = STREAM_TOTAL_BUCKETS):
    """Smallest bucket >= total, or None when total exceeds every bucket
    (the caller then runs unbucketed — correct, just a fresh compile)."""
    b = find_min_bucket_gte(buckets, total_latents)
    return None if b is None or b < total_latents else b


def growing_schedule(total_latents: int) -> list:
    """Block schedule for one stream: smallest first for first-audio, then
    doubling up to 320 (the per-query-efficient size).  total_latents must
    be expressible as a suffix-sum of STREAM_CHUNK_SIZES steps; remaining
    length is filled with 320s then topped off with the largest fitting
    sizes."""
    out, acc = [], 0
    for c in STREAM_CHUNK_SIZES:
        if acc + c > total_latents:
            break
        out.append(c)
        acc += c
    while acc + 320 <= total_latents:
        out.append(320)
        acc += 320
    for c in reversed(STREAM_CHUNK_SIZES):
        while acc + c <= total_latents:
            out.append(c)
            acc += c
    if acc != total_latents:
        raise ValueError(
            f"total_latents {total_latents} not reachable with chunk sizes "
            f"{STREAM_CHUNK_SIZES} (got to {acc}); pick a multiple of 40")
    if len(out) > MAX_STREAM_CHUNKS:
        # the growing ramp means 16 blocks reach 40+80+160 + 13*320, not
        # 16*320 — report the ACTUAL maximum so a retry can succeed
        biggest = max(STREAM_CHUNK_SIZES)
        ramp = [c for c in STREAM_CHUNK_SIZES if c != biggest]
        max_total = sum(ramp) + (MAX_STREAM_CHUNKS - len(ramp)) * biggest
        raise ValueError(
            f"{total_latents} latents needs {len(out)} blocks, over the "
            f"serving cap MAX_STREAM_CHUNKS={MAX_STREAM_CHUNKS} "
            f"(max {max_total} latents per growing-schedule stream); "
            "split the text and resume with continuation_latent")
    return out

# Host-side speech-rate heuristic shared with the chunker
# (reference: handler.py:109 target_chars = duration * 12)
CHARS_PER_SECOND = 12.0
LATENTS_PER_SECOND = 44100.0 / 2048.0


def pick_sequence_bucket(text: str, max_sequence_length: int,
                         margin: float = 1.5,
                         buckets: str = SEQUENCE_BUCKETS) -> int:
    """Latency feature (off by default in the handler): bound the
    generation length by the text's estimated speech duration instead of
    always generating the full sequence and cropping.  margin=1.5 leaves
    headroom for slow delivery; the end-of-speech crop still trims the
    tail (inference.py:288-301 semantics unchanged)."""
    est_seconds = max(len(text), 1) / CHARS_PER_SECOND
    est_latents = int(est_seconds * LATENTS_PER_SECOND * margin)
    bucket = find_min_bucket_gte(buckets, est_latents)
    return min(bucket, max_sequence_length)


@functools.lru_cache(maxsize=1)
def load_presets(path: Optional[str] = None) -> Dict[str, Dict]:
    with open(path or PRESETS_PATH) as f:
        return json.load(f)


def get_preset(name: str) -> Dict:
    presets = load_presets()
    if name not in presets:
        raise KeyError(
            f"unknown sampler preset {name!r}; available: "
            f"{sorted(presets)}")
    return dict(presets[name])


def pick_text_bucket(actual_length: int,
                     buckets: str = TEXT_BUCKETS) -> int:
    return find_min_bucket_gte(buckets, actual_length)


def _parse_buckets(values_str: str):
    return [int(v.strip()) for v in values_str.split(",") if v.strip()]


def _later_cover_schedule(tb: int, buckets: str = STREAM_TOTAL_BUCKETS,
                          min_total: int = 0):
    """A valid stream schedule whose total lands in bucket `tb` and that
    contains every STREAM_CHUNK_SIZES entry reachable as a NON-first
    block within the bucket — warming, in one stream, every
    (total-bucket, later-block-size) program the bucket can serve.
    Sizes whose inclusion would overflow the bucket (e.g. a later-320 in
    the 320 bucket) are genuinely unreachable in traffic and skipped.

    min_total > 0 additionally tops the schedule up to at least that
    total (still within the bucket) — used to build a schedule that
    crosses INCREMENTAL_LATENT_MIN_TOTAL so the incremental-KV programs
    of the threshold bucket get warmed too (serve/streaming.py keys its
    block programs on the re-encode/incremental choice)."""
    totals = _parse_buckets(buckets)
    prev = max([t for t in totals if t < tb], default=0)
    sched = [min(STREAM_CHUNK_SIZES)]
    for c in sorted(STREAM_CHUNK_SIZES):
        if sum(sched) + c <= tb and len(sched) < MAX_STREAM_CHUNKS:
            sched.append(c)
    biggest = max(STREAM_CHUNK_SIZES)
    while (sum(sched) <= prev and sum(sched) + biggest <= tb
           and len(sched) < MAX_STREAM_CHUNKS):
        sched.append(biggest)
    for c in sorted(STREAM_CHUNK_SIZES, reverse=True):
        while (sum(sched) < min_total and sum(sched) + c <= tb
               and len(sched) < MAX_STREAM_CHUNKS):
            sched.append(c)
    if sum(sched) <= prev or sum(sched) < min_total:
        raise ValueError(
            f"cannot build a schedule landing in total bucket {tb} "
            f"(>= {min_total}) within MAX_STREAM_CHUNKS="
            f"{MAX_STREAM_CHUNKS}")
    return sched


def warmup_manifest(batch_sizes=(), *, full: bool = False,
                    default_sequence_length: Optional[int] = None):
    """Every static shape the serving surface accepts, derived from THE
    SAME constants request validation uses (this module) so the two can
    never drift apart (pinned in tests/test_warmup_manifest.py).

    Entry kinds (executed by serve.handler.warmup_compile through the
    real request paths, so XLA cache keys match production exactly):

      {"kind": "oneshot", "text_bucket", "speaker_bucket", "sequence_length"}
      {"kind": "stream",  "speaker_bucket", "chunk_sizes", "total_bucket"}
      {"kind": "batch",   "batch_size", "speaker_bucket", "sequence_length"}

    full=False (default) warms the high-traffic subset: default sequence
    length, speaker {none, smallest bucket}, the default stream schedule
    plus the growing schedule, and the given batch sizes.  full=True
    enumerates the ENTIRE accepted surface — every sequence bucket x
    speaker bucket, and every (stream-total bucket x block size x
    first/later) combination; expect it to take a long time on a cold
    cache (one full-size XLA compile per program) but it is one-time per
    cache volume.
    """
    from ..config import MAX_TEXT_LENGTH, SAMPLER_DEFAULTS
    seq_default = (default_sequence_length
                   or SAMPLER_DEFAULTS["sequence_length"])
    # Every request path pads text to MAX_TEXT_LENGTH (pipeline.py /
    # streaming.py call get_text_input_ids_and_mask with that max), so
    # there is exactly ONE compiled text width.  Guard the constant pair
    # loudly: a second TEXT_BUCKETS value would need its own warm entries
    # AND a request path that actually buckets text — neither exists.
    text_buckets = _parse_buckets(TEXT_BUCKETS)
    if text_buckets != [MAX_TEXT_LENGTH]:
        raise AssertionError(
            f"TEXT_BUCKETS {text_buckets} != [MAX_TEXT_LENGTH "
            f"{MAX_TEXT_LENGTH}]: request paths pad text to "
            "MAX_TEXT_LENGTH only — adding a text bucket requires "
            "bucketing the request paths and extending warmup_manifest")
    speaker_all = [None] + _parse_buckets(SPEAKER_BUCKETS)
    seq_all = sorted(set(_parse_buckets(SEQUENCE_BUCKETS)) | {seq_default})
    totals = _parse_buckets(STREAM_TOTAL_BUCKETS)
    sizes = list(STREAM_CHUNK_SIZES)

    speakers = speaker_all if full else [None, speaker_all[1]]
    seqs = seq_all if full else [seq_default]

    entries = []
    for t in text_buckets:
        for s in speakers:
            for q in seqs:
                entries.append({"kind": "oneshot", "text_bucket": t,
                                "speaker_bucket": s, "sequence_length": q})

    def stream_entry(s, schedule):
        total = sum(schedule)
        return {"kind": "stream", "speaker_bucket": s,
                "chunk_sizes": list(schedule),
                "total_bucket": pick_stream_total_bucket(total)}

    if full:
        # Later-block programs are keyed on (total bucket, block size);
        # first-block programs only on block size (sampler/blockwise.py).
        # So: per (total bucket x speaker), ONE stream whose schedule
        # contains every chunk size as a NON-first block (skipping sizes
        # unreachable as later blocks within the bucket), plus one
        # single-block stream per remaining size for the first-block
        # programs.
        # Block programs are ALSO keyed on the re-encode vs incremental-KV
        # choice (serve/streaming.py engages incremental past
        # INCREMENTAL_LATENT_MIN_TOTAL).  Buckets whose cover schedule
        # lands below the threshold but that contain >= threshold totals
        # (the threshold bucket itself) get a second, topped-up schedule
        # so BOTH paths' programs are warm.  Lazy import: streaming
        # imports this module at load time.
        from .streaming import INCREMENTAL_LATENT_MIN_TOTAL as _inc_min
        for s in speakers:
            for c in sizes[1:]:
                entries.append(stream_entry(s, [c]))
            for tb in totals:
                entries.append(stream_entry(s, _later_cover_schedule(tb)))
                if (tb >= _inc_min
                        and sum(_later_cover_schedule(tb)) < _inc_min):
                    entries.append(stream_entry(
                        s, _later_cover_schedule(tb, min_total=_inc_min)))
    else:
        for s in speakers:
            entries.append(stream_entry(s, [160] * 4))   # default schedule
            entries.append(stream_entry(s, list(sizes)))  # growing ramp
    # Batched programs are keyed on (batch size, sequence_length) too —
    # the server groups by identical sampler params (batcher.py:
    # group_compatible), so an auto_sequence_length chunk batching to a
    # non-default bucket runs its own (G*B)-row program.  Warm batch x
    # the same seq list the one-shot entries use (all buckets iff full).
    for b in batch_sizes:
        for s in speakers:
            for q in seqs:
                entries.append({"kind": "batch", "batch_size": int(b),
                                "speaker_bucket": s,
                                "sequence_length": q})
    return entries


def pick_speaker_bucket(actual_latents: int,
                        buckets: str = SPEAKER_BUCKETS) -> int:
    return find_min_bucket_gte(buckets, actual_latents)


def batch_size_buckets(max_batch: int):
    """Batch sizes the micro-batch server pads its groups to: powers of
    two up to max_batch, plus max_batch itself.  Every distinct batch
    size compiles its own full-size (G*B)-row sampler program, and the
    server's drain window can gather ANY count 1..max_batch — padding to
    this bounded set keeps the compile surface at O(log max_batch)
    programs instead of one per arrival count (serve/server.py)."""
    if max_batch < 1:
        raise ValueError(f"max_batch must be >= 1, got {max_batch}")
    out = {max_batch}
    b = 1
    while b < max_batch:
        out.add(b)
        b *= 2
    return tuple(sorted(out))


def pick_batch_bucket(n: int, max_batch: int) -> int:
    """Smallest warmed batch size >= n (n in 1..max_batch)."""
    for b in batch_size_buckets(max_batch):
        if b >= n:
            return b
    raise ValueError(f"batch of {n} exceeds max_batch {max_batch}")
