"""Streaming synthesis: blockwise generation with incremental decode.

The reference's streaming story is the blockwise sampler (7.5 s latent
blocks with prefix conditioning, inference_blockwise.py; README.md:95-102
chunk_size=160); it decodes the full latent buffer at the end.  This module
turns that into a true audio stream: after each latent block, the codec
decodes the new block with `decode_context` latents of left context (the
codec is causal — its post_module is a window-128 causal transformer and
the conv stacks have a bounded receptive field, autoencoder.py:744-802,
932-998), drops the context warm-up samples, and yields the block's audio.
First-audio latency is therefore one block (~7.5 s of audio at defaults)
instead of the whole utterance.

`decode_context` trades exactness for compute.  The codec's receptive
field is dominated by the post_module: 8 causal layers of window-128
attention stack to ~8*127 ≈ 1016 latents (autoencoder.py:744-802), plus a
few latents for the conv stacks — so the default 1152 makes streamed audio
sample-identical to the one-shot decode for any prefix (tested).  Smaller
values (e.g. 256) cut decode compute ~proportionally at the cost of tiny
boundary differences deep in the attention tail.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MAX_TEXT_LENGTH, SAMPLER_DEFAULTS
from ..pipeline.pipeline import (EchoModels, ae_decode,
                                 get_speaker_latent_and_mask)
from ..pipeline.text import get_text_input_ids_and_mask
from ..sampler.blockwise import iter_blockwise_euler_cfg_independent_guidances


@dataclasses.dataclass
class StreamChunk:
    index: int
    audio: np.ndarray            # (1, samples) float32 — this block only
    latent_start: int
    latent_end: int
    is_last: bool


def stream_synthesize(
    models: EchoModels,
    text: str,
    speaker_audio: Optional[np.ndarray] = None,
    *,
    chunk_size: int = 160,       # reference: README.md:95-102
    num_chunks: int = 4,
    seed: int = 0,
    sampler_params: Optional[Dict] = None,
    continuation_latent: Optional[np.ndarray] = None,
    decode_context: int = 1152,
) -> Iterator[StreamChunk]:
    """Yield audio block-by-block for one utterance."""
    p = dict(SAMPLER_DEFAULTS)
    p.update(sampler_params or {})
    p.pop("sequence_length", None)  # streaming length = blocks * chunk_size
    ps = models.dit_cfg.speaker_patch_size
    spl = models.dac_cfg.frame_length

    text_ids, text_mask = get_text_input_ids_and_mask(
        [text], max_length=MAX_TEXT_LENGTH)

    if speaker_audio is None:
        speaker_latent = np.zeros((1, ps, models.dit_cfg.latent_size),
                                  np.float32)
        speaker_mask = np.zeros((1, ps), bool)
    else:
        speaker_latent, speaker_mask = get_speaker_latent_and_mask(
            models, speaker_audio)

    blocks = iter_blockwise_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg,
        jnp.asarray(speaker_latent), jnp.asarray(speaker_mask),
        jnp.asarray(text_ids), jnp.asarray(text_mask),
        block_sizes=[chunk_size] * num_chunks,
        continuation_latent=(None if continuation_latent is None
                             else jnp.asarray(continuation_latent)),
        dtype=models.dtype, rng_key=jax.random.PRNGKey(seed), **p)

    for idx, (start, block, prefix) in enumerate(blocks):
        end = start + chunk_size
        ctx = min(start, decode_context)
        audio = np.asarray(ae_decode(
            models, prefix[:, start - ctx:end]))
        yield StreamChunk(
            index=idx,
            audio=audio[:, ctx * spl:],
            latent_start=start,
            latent_end=end,
            is_last=(idx == num_chunks - 1))
