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


def pick_speaker_bucket(actual_latents: int,
                        buckets: str = SPEAKER_BUCKETS) -> int:
    return find_min_bucket_gte(buckets, actual_latents)
