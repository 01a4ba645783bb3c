"""Batched multi-request execution.

The reference serves one request per worker (share-nothing RunPod workers,
SURVEY.md §2e); on TPU the right shape is micro-batching: group compatible
requests (same sampler parameters, same speaker bucket), stack them along
the batch axis, and run ONE sampler + decode pass — the CFG×G factor and
the batch fold into a single (G·B) DiT forward, amortizing weight reads
over B requests.

Per-request seed semantics are preserved: request i's initial noise is
jax.random.normal(PRNGKey(seed_i), (S, 80)) — identical to what the
single-request path draws, so a request returns the same audio whether it
was batched or not.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MAX_TEXT_LENGTH, SAMPLER_DEFAULTS
from ..pipeline import dsp
from ..pipeline.pipeline import (EchoModels, ae_decode,
                                 get_speaker_latent_and_mask)
from ..pipeline.text import get_text_input_ids_and_mask
from ..sampler.euler import sample_euler_cfg_independent_guidances


@dataclasses.dataclass
class BatchRequest:
    text: str
    seed: int
    speaker_audio: Optional[np.ndarray] = None  # (1, samples) float32
    # Pre-encoded voice (1, T, 80) — a serving voice-latent cache entry;
    # skips the per-request AE encode.  Mutually exclusive with
    # speaker_audio.  speaker_mask (1, T) carries the true length when the
    # latent is bucket-padded; defaults to all-True.
    speaker_latent: Optional[np.ndarray] = None
    speaker_mask: Optional[np.ndarray] = None
    request_id: Optional[str] = None


@dataclasses.dataclass
class BatchResult:
    audio: np.ndarray        # (1, samples) float32, flattening-cropped
    normalized_text: str
    request_id: Optional[str]


def _group_key(params: Dict) -> Tuple:
    return tuple(sorted(params.items()))


def _key_data(seed: int):
    """PRNGKey's threefry key data computed host-side — handles negative
    and 64-bit seeds exactly like jax.random.PRNGKey without a device
    round trip per request (equality pinned in test_batcher).

    With x64 disabled (the default) PRNGKey canonicalizes the seed to 32
    bits, so the key is [0, seed mod 2^32]; with x64 on it splits the
    int64 two's-complement value into [hi, lo] words."""
    v = int(seed) & 0xFFFFFFFFFFFFFFFF
    if jax.config.jax_enable_x64:
        return ((v >> 32) & 0xFFFFFFFF, v & 0xFFFFFFFF)
    return (0, v & 0xFFFFFFFF)


@functools.lru_cache(maxsize=8)
def _draw_noise(cfg, seq_len: int):
    """Jitted per-seed noise stack: row i == what PRNGKey(seed_i) draws in
    the single-request path, so batched == single bit-for-bit."""
    @jax.jit
    def run(key_data):
        return jax.vmap(lambda kd: jax.random.normal(
            jax.random.wrap_key_data(kd), (seq_len, cfg.latent_size),
            jnp.float32))(key_data)
    return run


def group_compatible(requests: Sequence[Tuple[BatchRequest, Dict]],
                     max_batch: int) -> List[List[int]]:
    """Indices grouped by identical sampler params, split to max_batch."""
    by_key: Dict[Tuple, List[int]] = {}
    for i, (_, params) in enumerate(requests):
        by_key.setdefault(_group_key(params), []).append(i)
    groups: List[List[int]] = []
    for idxs in by_key.values():
        for j in range(0, len(idxs), max_batch):
            groups.append(idxs[j:j + max_batch])
    return groups


def run_batch(
    models: EchoModels,
    requests: Sequence[BatchRequest],
    sampler_params: Optional[Dict] = None,
    speaker_bucket: Optional[int] = None,
    decode_batch: int = 4,
) -> List[BatchResult]:
    """Execute one homogeneous batch (same sampler params for all).

    Speaker latents are padded to `speaker_bucket` (default: the max actual
    length in the batch, rounded up to the patch size) so mixed-length
    references batch together; masks carry the true lengths.

    The sampler runs the whole batch in ONE (G*B)-row program (weight
    reads amortize over B); the codec decode runs in `decode_batch`-sized
    slices — decode is bandwidth-bound with no weight-reuse win from
    batching, and its activations are ~250 MB/request at full length, so
    a full B=8 decode alongside the sampler's KV would pressure HBM.
    """
    if not requests:
        return []
    p = dict(SAMPLER_DEFAULTS)
    p.update(sampler_params or {})
    seq_len = p.pop("sequence_length")
    b = len(requests)
    ps = models.dit_cfg.speaker_patch_size

    text_ids, text_mask, normalized = get_text_input_ids_and_mask(
        [r.text for r in requests], max_length=MAX_TEXT_LENGTH,
        return_normalized_text=True)

    # Speaker latents -> common bucket
    latents, masks = [], []
    for r in requests:
        if r.speaker_latent is not None:
            if r.speaker_audio is not None:
                raise ValueError(
                    "pass speaker_audio OR speaker_latent, not both")
            sl = np.asarray(r.speaker_latent, np.float32)
            latents.append(sl)
            masks.append(np.ones(sl.shape[:2], bool)
                         if r.speaker_mask is None
                         else np.asarray(r.speaker_mask, bool))
        elif r.speaker_audio is None:
            latents.append(np.zeros((1, ps, models.dit_cfg.latent_size),
                                    np.float32))
            masks.append(np.zeros((1, ps), bool))
        else:
            sl, sm = get_speaker_latent_and_mask(models, r.speaker_audio)
            latents.append(sl)
            masks.append(sm)
    max_len = max(sl.shape[1] for sl in latents)
    bucket = speaker_bucket or -(-max_len // ps) * ps
    if any(sl.shape[1] > bucket for sl in latents):
        raise ValueError(f"speaker_bucket {bucket} smaller than a "
                         "reference in the batch")
    spk_lat = np.zeros((b, bucket, models.dit_cfg.latent_size), np.float32)
    spk_mask = np.zeros((b, bucket), bool)
    for i, (sl, sm) in enumerate(zip(latents, masks)):
        spk_lat[i, :sl.shape[1]] = sl[0]
        spk_mask[i, :sm.shape[1]] = sm[0]

    # Per-request seed semantics: draw exactly the (S, 80) array the
    # single-request sampler would draw for each seed — but in ONE device
    # program (vmap over seeds) with no host round trip: B sequential
    # np.asarray'd draws cost ~100 ms each over the axon tunnel.
    noise = _draw_noise(models.dit_cfg, seq_len)(
        jnp.asarray(np.asarray([_key_data(r.seed) for r in requests],
                               dtype=np.uint32)))

    latent_out = sample_euler_cfg_independent_guidances(
        models.dit_params, models.dit_cfg,
        jnp.asarray(spk_lat), jnp.asarray(spk_mask),
        jnp.asarray(text_ids), jnp.asarray(text_mask),
        sequence_length=seq_len, dtype=models.dtype,
        initial_noise=jnp.asarray(noise), **p)

    # Dispatch every decode slice before forcing any to the host: slice
    # i's device->host audio transfer then overlaps slice i+1's decode
    # compute (dispatch is async; the device queue serializes compute).
    decoded = [ae_decode(models, latent_out[i:i + decode_batch])
               for i in range(0, b, decode_batch)]
    audio = np.concatenate([np.asarray(a) for a in decoded], axis=0)
    spl = models.dac_cfg.frame_length
    results = []
    for i, r in enumerate(requests):
        cropped = dsp.crop_audio_to_flattening_point(
            audio[i:i + 1], np.asarray(latent_out[i]),
            samples_per_latent=spl)
        results.append(BatchResult(audio=cropped,
                                   normalized_text=normalized[i],
                                   request_id=r.request_id))
    return results
