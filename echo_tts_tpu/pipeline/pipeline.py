"""Text -> audio orchestration (host side).

Mirrors the reference pipeline (reference: inference.py:218-388): AE encode
of the speaker reference in ~30 s chunks, sampler invocation, AE decode,
end-of-speech crop, and the chunked-text variant.

A `sample_fn` has the signature
    sample_fn(models, speaker_latent, speaker_mask, text_ids, text_mask,
              rng_seed) -> latents (B, S, 80) float32
and is normally built with functools.partial over one of the samplers
(see serve/handler.py, mirroring handler.py:426-443).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (DACConfig, EchoDiTConfig,
                      MAX_SPEAKER_LATENT_LENGTH, MAX_TEXT_LENGTH)
from ..models.dac import dac as jdac
from . import dsp
from .text import get_text_input_ids_and_mask


@dataclasses.dataclass
class EchoModels:
    """Bundle of converted parameters + configs (the analog of the
    reference's (model, fish_ae, pca_state) triple)."""
    dit_params: dict
    dit_cfg: EchoDiTConfig
    dac_params: dict
    dac_cfg: DACConfig
    pca: dict
    dtype: object = jnp.bfloat16


SampleFn = Callable[..., jnp.ndarray]


def _dac_dtype(models: EchoModels):
    """Codec compute dtype = its parameter dtype (the reference loads the
    fish AE in bf16 on accelerators, handler.py:345,381; fp32 on CPU)."""
    return models.dac_params["encoder"]["conv_in"]["kernel"].dtype


@functools.lru_cache(maxsize=8)
def _encode_core(dac_cfg: DACConfig, dtype):
    """Cached jitted encode so un-jitted callers compile once per shape."""
    @jax.jit
    def run(dac_params, pca, audio):
        z_q = jdac.encode_zq(dac_params, dac_cfg, audio.astype(dtype))
        return jdac.pca_whiten(z_q.astype(jnp.float32), pca)
    return run


@functools.lru_cache(maxsize=8)
def _decode_core(dac_cfg: DACConfig, dtype):
    @jax.jit
    def run(dac_params, pca, latents):
        z_q = jdac.pca_unwhiten(latents, pca)
        audio = jdac.decode_zq(dac_params, dac_cfg, z_q.astype(dtype))
        return audio[..., 0].astype(jnp.float32)
    return run


def ae_encode(models: EchoModels, audio: jnp.ndarray) -> jnp.ndarray:
    """(B, L) or (B, L, 1) waveform -> (B, T, 80) whitened latents
    (reference: inference.py:218-224)."""
    if audio.ndim == 2:
        audio = audio[..., None]
    return _encode_core(models.dac_cfg, _dac_dtype(models))(
        models.dac_params, models.pca, audio)


def ae_decode(models: EchoModels, latents: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 80) latents -> (B, T*2048) float32 waveform
    (reference: inference.py:227-229)."""
    return _decode_core(models.dac_cfg, _dac_dtype(models))(
        models.dac_params, models.pca, latents)


def ae_reconstruct(models: EchoModels, audio: jnp.ndarray) -> jnp.ndarray:
    """Debug round-trip (reference: inference.py:231-235)."""
    return ae_decode(models, ae_encode(models, audio))


@functools.lru_cache(maxsize=8)
def _decode_block_core(dac_cfg: DACConfig, dtype, max_positions: int):
    from ..models.dac.streaming import decode_zq_block

    @jax.jit
    def run(dac_params, pca, state, latents):
        z_q = jdac.pca_unwhiten(latents, pca)
        audio, state = decode_zq_block(dac_params, dac_cfg, state,
                                       z_q.astype(dtype),
                                       max_positions=max_positions)
        return audio[..., 0].astype(jnp.float32), state
    return run


@functools.lru_cache(maxsize=8)
def _decode_state_template(dac_cfg: DACConfig, batch: int, dtype) -> dict:
    """The all-zeros initial decode state, built ONCE per configuration.
    It is dozens of small device arrays (per-layer rolling KV + conv-tail
    pads); rebuilding them per stream costs a burst of host->device
    transfers right on the TTFA-critical path.  JAX arrays are immutable
    and no decode program donates its state operands, so one template is
    safely shared by every stream."""
    from ..models.dac.streaming import init_decode_state
    return init_decode_state(dac_cfg, batch, dtype)


def ae_decode_stream_init(models: EchoModels, batch: int = 1) -> dict:
    """Fresh incremental-decode state.  The device state lives under
    "inner"; "pos" is a HOST-side position mirror so the per-block RoPE
    bound check costs no device sync (models/dac/streaming.py)."""
    return {"inner": _decode_state_template(models.dac_cfg, batch,
                                            jnp.dtype(_dac_dtype(models))),
            "pos": 0}


@functools.lru_cache(maxsize=8)
def _encode_block_core(dac_cfg: DACConfig, dtype, max_positions: int):
    from ..models.dac.streaming import encode_zq_block

    @jax.jit
    def run(dac_params, pca, state, audio):
        z_q, state = encode_zq_block(dac_params, dac_cfg, state,
                                     audio.astype(dtype),
                                     max_positions=max_positions)
        return jdac.pca_whiten(z_q.astype(jnp.float32), pca), state
    return run


def ae_encode_stream_init(models: EchoModels, batch: int = 1) -> dict:
    """Fresh incremental-encode state; "pos" mirrors the encoder-frame
    position host-side (models/dac/streaming.py)."""
    from ..models.dac.streaming import init_encode_state
    return {"inner": init_encode_state(models.dac_cfg, batch,
                                       _dac_dtype(models)),
            "pos": 0}


def ae_encode_block(models: EchoModels, state: dict, audio: jnp.ndarray,
                    *, max_positions: Optional[int] = None):
    """Incremental ae_encode: (B, L_block) or (B, L_block, 1) waveform
    (L_block a frame_length multiple) -> ((B, L_block/2048, 80) whitened
    latents, new state).  Feeding consecutive blocks reproduces ae_encode
    of the concatenated audio at O(block) cost — unlike the reference's
    30 s chunking, which encodes each chunk with NO left context
    (inference.py:244-267)."""
    from ..models.dac.streaming import MAX_ENC_POSITIONS
    if max_positions is None:
        max_positions = MAX_ENC_POSITIONS
    if audio.ndim == 2:
        audio = audio[..., None]
    # RoPE-bound guard: the binding rate is the encoder-tail transformer
    # (hop_length frames); past the bound the in-graph slice clamps
    # silently, so fail loudly here (host-side "pos" mirror, no sync).
    cfg = models.dac_cfg
    frames = audio.shape[1] // cfg.hop_length
    pos = state["pos"]
    if pos + frames > max_positions:
        raise ValueError(
            f"encode stream position {pos} + block {frames} frames "
            f"exceeds the RoPE bound {max_positions} "
            f"(~{max_positions * cfg.hop_length / cfg.sample_rate:.0f}"
            " s of audio); raise max_positions consistently for longer")
    lat, inner = _encode_block_core(models.dac_cfg, _dac_dtype(models),
                                    max_positions)(
        models.dac_params, models.pca, state["inner"], audio)
    return lat, {"inner": inner, "pos": pos + frames}


def ae_decode_block(models: EchoModels, state: dict, latents: jnp.ndarray,
                    *, max_positions: Optional[int] = None):
    """Incremental ae_decode: (B, T_block, 80) latents -> ((B, T_block*2048)
    float32 waveform, new state).  Feeding consecutive blocks reproduces
    ae_decode of the concatenated latents (up to float reduction order) at
    O(block) cost per block instead of O(context + block).

    max_positions (default streaming.MAX_POSITIONS) bounds the absolute
    RoPE positions one stream may reach; exceeding it raises here (the
    in-graph RoPE slice would clamp silently).  The check uses the
    host-side "pos" mirror — no device sync per block."""
    from ..models.dac.streaming import MAX_POSITIONS
    if max_positions is None:
        max_positions = MAX_POSITIONS
    pos = state["pos"]
    if pos + latents.shape[1] > max_positions:
        raise ValueError(
            f"decode stream position {pos} + block {latents.shape[1]} "
            f"exceeds the RoPE bound {max_positions}; raise max_positions "
            "(consistently across the stream) for longer audio")
    audio, inner = _decode_block_core(models.dac_cfg, _dac_dtype(models),
                                      max_positions)(
        models.dac_params, models.pca, state["inner"], latents)
    return audio, {"inner": inner, "pos": pos + latents.shape[1]}


def get_speaker_latent_and_mask(
    models: EchoModels,
    audio: np.ndarray,  # (1, length) float32
    max_speaker_latent_length: int = MAX_SPEAKER_LATENT_LENGTH,
    audio_chunk_size: Optional[int] = None,
    pad_to_max: bool = False,
    divis_by_patch_size: Optional[int] = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Chunked AE-encode of the speaker reference
    (reference: inference.py:239-283): fixed ~30 s chunks, each zero-padded
    to the full chunk (so every encode has the same static shape), then
    concatenated and cropped/padded.  The samples-per-latent factor comes
    from the codec config (2048 == frame_length for the published build,
    inference.py:251 + autoencoder.py:1044); chunks default to 640 latents
    of audio (~30 s)."""
    assert audio.ndim == 2 and audio.shape[0] == 1
    spl = models.dac_cfg.frame_length  # samples per latent
    if audio_chunk_size is None:
        audio_chunk_size = 640 * spl
    max_audio_len = max_speaker_latent_length * spl
    audio = np.asarray(audio, dtype=np.float32)[:, :max_audio_len]

    latent_arr = []
    for i in range(0, audio.shape[1], audio_chunk_size):
        chunk = audio[:, i:i + audio_chunk_size]
        if chunk.shape[1] < audio_chunk_size:
            chunk = np.pad(chunk, ((0, 0), (0, audio_chunk_size - chunk.shape[1])))
        latent = ae_encode(models, jnp.asarray(chunk))
        latent_arr.append(np.asarray(latent))

    speaker_latent = np.concatenate(latent_arr, axis=1)
    actual = audio.shape[1] // spl
    speaker_mask = (np.arange(speaker_latent.shape[1]) < actual)[None, :]

    if pad_to_max and speaker_latent.shape[1] < max_speaker_latent_length:
        pad = max_speaker_latent_length - speaker_latent.shape[1]
        speaker_latent = np.pad(speaker_latent, ((0, 0), (0, pad), (0, 0)))
        speaker_mask = np.pad(speaker_mask, ((0, 0), (0, pad)))
    elif not pad_to_max:
        speaker_latent = speaker_latent[:, :actual]
        speaker_mask = speaker_mask[:, :actual]

    if divis_by_patch_size is not None:
        n = speaker_latent.shape[1] // divis_by_patch_size * divis_by_patch_size
        speaker_latent = speaker_latent[:, :n]
        speaker_mask = speaker_mask[:, :n]

    return speaker_latent.astype(np.float32), speaker_mask


def sample_pipeline(
    models: EchoModels,
    sample_fn: SampleFn,
    text_prompt: str,
    speaker_audio: Optional[np.ndarray],
    rng_seed: int,
    pad_to_max_speaker_latent_length: Optional[int] = None,
    pad_to_max_text_length: Optional[int] = None,
    normalize_text: bool = True,
    speaker_latent: Optional[np.ndarray] = None,
    speaker_mask: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, str]:
    """Single-chunk text -> audio (reference: inference.py:308-347).
    Returns ((1, samples) float32, normalized_text).

    A pre-encoded (speaker_latent, speaker_mask) pair skips the AE encode
    — callers synthesizing many chunks of one request encode the voice
    ONCE instead of per chunk (serve/handler.py).  If the latent is
    BUCKET-PADDED, speaker_mask is REQUIRED to carry the true length:
    the all-True default would attend encoded-zero padding as reference
    speech and silently degrade cloning."""
    # Text is always padded to the (bucketed) max length — the reference's
    # pad_to_max=False branch is a no-op slice (inference.py:206-207), so
    # sample_pipeline always runs 768-wide text; that is also exactly the
    # static-shape discipline XLA wants.
    text_ids, text_mask, normalized = get_text_input_ids_and_mask(
        [text_prompt],
        max_length=min(pad_to_max_text_length or MAX_TEXT_LENGTH,
                       MAX_TEXT_LENGTH),
        normalize=normalize_text, return_normalized_text=True)

    if speaker_latent is not None:
        if speaker_audio is not None:
            raise ValueError(
                "pass speaker_audio OR speaker_latent, not both")
        if speaker_mask is None:
            speaker_mask = np.ones(speaker_latent.shape[:2], bool)
    elif speaker_audio is None:
        n = pad_to_max_speaker_latent_length or 4
        speaker_latent = np.zeros((1, n, models.dit_cfg.latent_size),
                                  dtype=np.float32)
        speaker_mask = np.zeros((1, n), dtype=bool)
    else:
        speaker_latent, speaker_mask = get_speaker_latent_and_mask(
            models, speaker_audio,
            max_speaker_latent_length=(pad_to_max_speaker_latent_length
                                       or MAX_SPEAKER_LATENT_LENGTH),
            pad_to_max=pad_to_max_speaker_latent_length is not None)

    latent_out = sample_fn(models, jnp.asarray(speaker_latent),
                           jnp.asarray(speaker_mask), jnp.asarray(text_ids),
                           jnp.asarray(text_mask), rng_seed)

    audio_out = np.asarray(ae_decode(models, latent_out))
    audio_out = dsp.crop_audio_to_flattening_point(
        audio_out, np.asarray(latent_out[0]),
        samples_per_latent=models.dac_cfg.frame_length)
    return audio_out, normalized[0]


def sample_pipeline_chunked(
    models: EchoModels,
    sample_fn: SampleFn,
    text_prompt: str,
    speaker_audio: Optional[np.ndarray],
    rng_seed: int,
    *,
    max_chars_per_chunk: int = 300,
    pad_to_max_speaker_latent_length: Optional[int] = None,
    pad_to_max_text_length: Optional[int] = None,
    normalize_text: bool = True,
) -> Tuple[np.ndarray, str]:
    """Library chunked variant with per-chunk seed progression seed+idx and
    plain concatenation (reference: inference.py:349-388).

    The speaker reference is AE-encoded ONCE and the latent reused across
    chunks — numerically identical to per-chunk encoding (the encode is
    deterministic) but saves (n_chunks - 1) codec passes, matching the
    serving path's encode-once fast path (serve/handler.py)."""
    from .text import chunk_text

    chunks = chunk_text(text_prompt, max_chars=max_chars_per_chunk)
    if not chunks:
        raise ValueError("text_prompt is empty after normalization")

    speaker_latent = speaker_mask = None
    if speaker_audio is not None:
        speaker_latent, speaker_mask = get_speaker_latent_and_mask(
            models, speaker_audio,
            max_speaker_latent_length=(pad_to_max_speaker_latent_length
                                       or MAX_SPEAKER_LATENT_LENGTH),
            pad_to_max=pad_to_max_speaker_latent_length is not None)

    audio_chunks: List[np.ndarray] = []
    normalized_chunks: List[str] = []
    for idx, chunk in enumerate(chunks):
        audio_out, normalized = sample_pipeline(
            models, sample_fn, chunk, None, rng_seed + idx,
            pad_to_max_speaker_latent_length=pad_to_max_speaker_latent_length,
            pad_to_max_text_length=pad_to_max_text_length,
            normalize_text=normalize_text,
            speaker_latent=speaker_latent, speaker_mask=speaker_mask)
        audio_chunks.append(audio_out)
        normalized_chunks.append(normalized)

    return (np.concatenate(audio_chunks, axis=-1),
            "\n".join(normalized_chunks))
