"""Streaming synthesis: blockwise generation with incremental decode.

The reference's streaming story is the blockwise sampler (7.5 s latent
blocks with prefix conditioning, inference_blockwise.py; README.md:95-102
chunk_size=160); it decodes the full latent buffer at the end.  This module
turns that into a true audio stream: after each latent block the codec
decodes JUST that block through a carried decode state — per-layer rolling
window-128 KV for the post_module plus conv-tail histories for the
upsample/decoder stacks (models/dac/streaming.py) — and yields the block's
audio.  Per-block decode cost is O(block); streamed audio equals the
one-shot decode up to float reduction order (the reference built a KVCache
class for this, autoencoder.py:660-680, but never used it).

`continuation_latent` is prepended to the prefix buffer for generation
resume (inference_blockwise.py:62-65); the decode state is warmed by
decoding the continuation region first (its audio is not re-yielded).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (MAX_SPEAKER_LATENT_LENGTH, MAX_TEXT_LENGTH,
                      SAMPLER_DEFAULTS)
from ..pipeline.pipeline import (EchoModels, ae_decode_block,
                                 ae_decode_stream_init,
                                 get_speaker_latent_and_mask)
from ..pipeline.text import get_text_input_ids_and_mask
from ..sampler import blockwise as bw
from ..sampler.blockwise import (
    iter_blockwise_euler_cfg_independent_guidances, sampler_statics)


# Stream length (latents) past which the incremental latent-prefix KV
# (O(block) appends) beats the reference-semantics full re-encode
# (O(total) per block): ~2 minutes of audio.  Measured on the v5e
# (examples/bench_incremental_crossover.py): loses 3% at 1240,
# break-even at 2560, wins 1.6%/1.1% at 3840/5120 — the crossover is a
# measurement, not an estimate (docs/PERFORMANCE.md §9 table).
INCREMENTAL_LATENT_MIN_TOTAL = 2560


@dataclasses.dataclass
class StreamChunk:
    index: int
    audio: np.ndarray            # (1, samples) float32 — this block only
    latent_start: int
    latent_end: int
    is_last: bool


@functools.lru_cache(maxsize=16)
def _fused_first_core(dit_cfg, dac_cfg, block_size: int, statics: tuple,
                      dac_dtype, max_positions: int):
    """ONE jitted program for the stream's first audio: text+speaker KV
    prefill + the latent-free first-block sampler + the first incremental
    codec decode, back to back on the device.  Splitting these into three
    dispatches costs ~68 ms of host round trips on the axon tunnel
    (examples/bench_ttfa_breakdown.py: 361 -> 294 ms TTFA measured) with
    no compute difference — the KV caches and decode state stay on device
    as outputs for the rest of the stream.  The sampler body is the SAME
    cached first-block core the iterator would use (nested jit inlines),
    so fused and unfused streams are numerically identical."""
    from ..models import dit
    from ..models.dac import dac as jdac
    from ..models.dac.streaming import decode_zq_block

    dt = statics[-1]
    core = bw._block_core(dit_cfg, block_size, block_size, *statics,
                          False, True)

    @jax.jit
    def run(dit_params, dac_params, pca, text_ids, text_mask,
            speaker_latent, speaker_mask, key0, dec_state):
        # noise drawn IN-program (same key the iterator would fold) —
        # one less host dispatch on the TTFA-critical path
        noise = jax.random.normal(
            key0, (text_ids.shape[0], block_size, dit_cfg.latent_size),
            jnp.float32)
        kv_text = dit.get_kv_cache_text(dit_params, dit_cfg, text_ids,
                                        text_mask)
        kv_speaker = dit.get_kv_cache_speaker(
            dit_params, dit_cfg, speaker_latent.astype(dt))
        x_t = core(dit_params, noise, kv_text, kv_speaker, text_mask,
                   speaker_mask)
        z_q = jdac.pca_unwhiten(x_t, pca)
        audio, dec_state = decode_zq_block(
            dac_params, dac_cfg, dec_state, z_q.astype(dac_dtype),
            max_positions=max_positions)
        return (audio[..., 0].astype(jnp.float32), x_t, kv_text,
                kv_speaker, dec_state)

    return run


def stream_synthesize(
    models: EchoModels,
    text: str,
    speaker_audio: Optional[np.ndarray] = None,
    *,
    chunk_size: int = 160,       # reference: README.md:95-102
    num_chunks: int = 4,
    chunk_sizes: Optional[Sequence[int]] = None,
    seed: int = 0,
    sampler_params: Optional[Dict] = None,
    continuation_latent: Optional[np.ndarray] = None,
    speaker_bucket: Optional[int] = None,
    speaker_latent: Optional[np.ndarray] = None,
    speaker_mask: Optional[np.ndarray] = None,
) -> Iterator[StreamChunk]:
    """Yield audio block-by-block for one utterance.

    `chunk_sizes` overrides the uniform chunk_size*num_chunks schedule with
    an explicit per-block size list — e.g. a SMALLER FIRST BLOCK
    ([80, 160, 160, 160]) cuts time-to-first-audio roughly in half at the
    cost of one extra compiled block program (sampler/blockwise.py compiles
    one program per (total_len, block_size) pair).

    The loop is PIPELINED: block i+1's sampler program is dispatched
    before block i's audio is forced to the host, so the per-block
    device->host transfer and the host-side dispatch round trip (~50-150 ms
    on the axon tunnel) overlap device compute instead of idling the chip
    between blocks."""
    p = dict(SAMPLER_DEFAULTS)
    p.update(sampler_params or {})
    p.pop("sequence_length", None)  # streaming length = blocks * chunk_size
    ps = models.dit_cfg.speaker_patch_size

    if chunk_sizes is None:
        chunk_sizes = [chunk_size] * num_chunks
    chunk_sizes = [int(c) for c in chunk_sizes]
    if not chunk_sizes or min(chunk_sizes) <= 0:
        raise ValueError(f"chunk_sizes must be non-empty positive, got "
                         f"{chunk_sizes}")

    from ..models.dac.streaming import MAX_POSITIONS
    total = (sum(chunk_sizes)
             + (0 if continuation_latent is None
                else continuation_latent.shape[1]))
    if total > MAX_POSITIONS:
        raise ValueError(
            f"stream of {total} latents exceeds the decode RoPE bound "
            f"{MAX_POSITIONS} (~{MAX_POSITIONS / 21.5 / 60:.1f} min); past "
            "it the incremental decoder's RoPE slice would clamp silently")

    text_ids, text_mask = get_text_input_ids_and_mask(
        [text], max_length=MAX_TEXT_LENGTH)

    if speaker_latent is not None:
        # Pre-encoded voice (a serving voice-latent cache, or the bench):
        # skip the AE encode entirely.
        if speaker_audio is not None:
            raise ValueError(
                "pass speaker_audio OR speaker_latent, not both")
        if speaker_mask is None:
            speaker_mask = np.ones(speaker_latent.shape[:2], bool)
    elif speaker_audio is None:
        speaker_latent = np.zeros((1, ps, models.dit_cfg.latent_size),
                                  np.float32)
        speaker_mask = np.zeros((1, ps), bool)
    else:
        # speaker_bucket pads the reference to a static bucket length so
        # serving voices of any length share compiled programs
        # (serve/presets.py:pick_speaker_bucket)
        speaker_latent, speaker_mask = get_speaker_latent_and_mask(
            models, speaker_audio,
            max_speaker_latent_length=(speaker_bucket
                                       or MAX_SPEAKER_LATENT_LENGTH),
            pad_to_max=speaker_bucket is not None)

    # Incremental latent-prefix KV is O(block) per block vs the
    # reference-semantics O(total) re-encode, but its separate append
    # program carries a fixed per-block cost that measured NET-SLOWER at
    # bench scale (1240 latents: streamed RTF 18.8 -> 18.2 on a v5e) —
    # only multi-minute streams, where the quadratic re-encode dominates,
    # come out ahead (measured +1.6% at 3840).  Engage it past the
    # measured crossover.
    use_inc = (total >= INCREMENTAL_LATENT_MIN_TOTAL
               and all(c % ps == 0 for c in chunk_sizes)
               and (continuation_latent is None
                    or continuation_latent.shape[1] % ps == 0))
    # Pad the prefix buffer to a static total bucket so every schedule
    # whose total lands in the same bucket shares compiled block programs
    # (identical outputs — the position-gated mask hides the padding;
    # sampler/blockwise.py).  Keeps the serving compile surface finite.
    from .presets import pick_stream_total_bucket
    total_bucket = pick_stream_total_bucket(total)
    if total_bucket is not None and total_bucket % ps != 0:
        total_bucket = None

    state = ae_decode_stream_init(models)

    # Fresh streams run prefill + first block + first decode as ONE fused
    # program (_fused_first_core): first audio pays one dispatch round
    # trip instead of three (~68 ms of TTFA on the axon tunnel,
    # docs/PERFORMANCE.md §14).  The KV and decode state come back as
    # device outputs; the iterator continues the stream from them.
    # Continuation streams keep the split path (their first block is a
    # regular prefix-conditioned block).
    prefill_kv = None
    first_latents = None
    fused_audio0 = None
    if continuation_latent is None:
        from ..pipeline.pipeline import _dac_dtype
        key0 = jax.random.fold_in(jax.random.PRNGKey(seed), 0)
        statics = sampler_statics(dtype=models.dtype, **p)
        fused = _fused_first_core(
            models.dit_cfg, models.dac_cfg, chunk_sizes[0], statics,
            jnp.dtype(_dac_dtype(models)), MAX_POSITIONS)
        fused_audio0, first_latents, kv_text, kv_speaker, dec_inner = fused(
            models.dit_params, models.dac_params, models.pca,
            jnp.asarray(text_ids), jnp.asarray(text_mask),
            jnp.asarray(speaker_latent), jnp.asarray(speaker_mask),
            key0, state["inner"])
        state = {"inner": dec_inner, "pos": state["pos"] + chunk_sizes[0]}
        prefill_kv = (kv_text, kv_speaker)

    blocks = iter_blockwise_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg,
        jnp.asarray(speaker_latent), jnp.asarray(speaker_mask),
        jnp.asarray(text_ids), jnp.asarray(text_mask),
        block_sizes=chunk_sizes,
        continuation_latent=(None if continuation_latent is None
                             else jnp.asarray(continuation_latent)),
        dtype=models.dtype, rng_key=jax.random.PRNGKey(seed),
        incremental_latent=use_inc, total_len_bucket=total_bucket,
        prefill_kv=prefill_kv, first_block_latents=first_latents, **p)

    if continuation_latent is not None:
        # Warm the decode state with the continuation region so the first
        # generated block decodes with its true causal context.
        _, state = ae_decode_block(models, state,
                                   jnp.asarray(continuation_latent))

    # Pipelined drain: `pending` holds block i's on-device audio while the
    # generator's next() dispatches block i+1's sampler; only then is
    # block i forced to the host (np.asarray).  All dispatch is async, so
    # the device queue stays full: [sampler i] [decode i] [sampler i+1] ...
    # The FIRST block is forced and yielded eagerly instead: advancing the
    # generator first would block first audio on block 2's program build
    # (a synchronous XLA compile on any cold schedule), and the forgone
    # overlap is only the first (smallest) block's ~ms audio transfer.
    n_blocks = len(chunk_sizes)
    if fused_audio0 is not None:
        # First audio leaves BEFORE the iterator is even advanced — the
        # iterator's first next() does block-0 bookkeeping (prefix buffer
        # creation + write-in) and dispatches block 1, all of which now
        # overlaps the consumer playing block 0 instead of delaying it.
        yield StreamChunk(index=0, audio=np.asarray(fused_audio0),
                          latent_start=0, latent_end=chunk_sizes[0],
                          is_last=(n_blocks == 1))
    pending = None
    for idx, (start, block, _prefix) in enumerate(blocks):
        if idx == 0 and fused_audio0 is not None:
            continue               # chunk 0 already yielded above
        audio, state = ae_decode_block(models, state, block)
        if pending is not None:
            pending.audio = np.asarray(pending.audio)
            yield pending
        pending = StreamChunk(
            index=idx,
            audio=audio,           # still on device; forced one block later
            latent_start=start,
            latent_end=start + chunk_sizes[idx],
            is_last=(idx == n_blocks - 1))
        if idx == 0:
            pending.audio = np.asarray(pending.audio)
            yield pending
            pending = None
    if pending is not None:
        pending.audio = np.asarray(pending.audio)
        yield pending
