"""Full-size numerical confidence without network access.

Round-1 gap: every parity test ran the tiny config, so nothing pinned
(a) that the converter consumes EVERY key of the published checkpoint's
state dict, or (b) that the fp32-island cast points hold at the published
2048-dim width.  Real weights cannot be downloaded here, but both
properties are checkable against the live torch reference:

  * Key coverage: the reference state-dict key NAMES depend only on the
    module structure (layer counts), not widths — so a structure-full
    (24/14/14-layer DiT, full-rate DAC) build with tiny widths has exactly
    the key set of `jordand/echo-tts-base` / `fish-s1-dac-min`
    (reference: inference.py:14-47, 56-76).  A tracking mapping asserts
    the converter reads every key and invents none.
  * Width parity: a full-width (2048-dim, 16-head, 5888-inter) DiT with
    few layers runs one forward vs torch at fp32 — cast-point drift that
    dim-64 tests cannot see (reference: model.py:563-604).
"""
import dataclasses

import numpy as np
import torch

import jax.numpy as jnp

from echo_tts_tpu.config import (DACConfig, base_dit_config,
                                 tiny_dit_config)
from echo_tts_tpu.models import dit
from echo_tts_tpu.tools.convert import convert_dit_state

from torch_ref import (build_torch_dac, build_torch_dit,
                       jax_params_from_torch, rand, torch_state_to_numpy)


class _Tracker(dict):
    """State-dict wrapper recording which keys the converter reads."""

    def __init__(self, state):
        super().__init__(state)
        self.accessed = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)


# ---------------------------------------------------------------------------
# Converter key coverage
# ---------------------------------------------------------------------------

# Full structure (layer counts of the published checkpoint), tiny widths.
STRUCT_DIT = dataclasses.replace(
    tiny_dit_config(), num_layers=24, text_num_layers=14,
    speaker_num_layers=14)

BLOCKWISE_KEY_MARKERS = ("latent_encoder.", "latent_norm.",
                         ".wk_latent.", ".wv_latent.")


def _is_blockwise_key(key: str) -> bool:
    """delete_blockwise_modules key set (reference: inference.py:28-34)."""
    return any(m in key for m in BLOCKWISE_KEY_MARKERS)


def test_dit_converter_consumes_every_checkpoint_key():
    tmodel = build_torch_dit(STRUCT_DIT, seed=0)
    state = _Tracker(torch_state_to_numpy(tmodel))
    convert_dit_state(state, STRUCT_DIT)
    missing = set(state) - state.accessed
    assert not missing, f"checkpoint keys silently dropped: {sorted(missing)}"
    invented = state.accessed - set(state)
    assert not invented, f"converter read non-existent keys: {invented}"


def test_dit_converter_blockwise_false_drops_exactly_latent_keys():
    cfg = dataclasses.replace(STRUCT_DIT, blockwise=False)
    tmodel = build_torch_dit(STRUCT_DIT, seed=0)  # full checkpoint on disk
    state = _Tracker(torch_state_to_numpy(tmodel))
    convert_dit_state(state, cfg)
    skipped = set(state) - state.accessed
    assert skipped == {k for k in state if _is_blockwise_key(k)}


def test_dac_converter_consumes_every_checkpoint_key():
    from echo_tts_tpu.tools.convert_dac import convert_dac_state

    # Full structure (rates, 8-layer quantizer transformers, 9 codebooks,
    # window-512 encoder transformer), minimal widths.
    cfg = DACConfig(
        encoder_dim=4, encoder_rates=(2, 4, 8, 8), latent_dim=64,
        decoder_dim=64, decoder_rates=(8, 8, 4, 2),
        encoder_transformer_layers=(0, 0, 0, 4), n_codebooks=9,
        codebook_size=16, codebook_dim=4, semantic_codebook_size=32,
        downsample_factor=(2, 2), quantizer_transformer_layers=8)
    tdac = build_torch_dac(cfg, seed=0)
    state = _Tracker({k: v.detach().cpu().float().numpy()
                      for k, v in tdac.state_dict().items()})
    convert_dac_state(state, cfg)
    # weight-norm parametrizations read original0/original1 pairs; every
    # checkpoint PARAMETER must be consumed.  The registered buffers
    # `causal_mask`/`freqs_cis` are derived tables the reference rebuilds
    # from config (autoencoder.py:589-608) and we recompute at trace time
    # (models/dac/transformer.py) — rightly not converted.
    buffers = {k for k in state
               if k.endswith(("causal_mask", "freqs_cis"))}
    missing = set(state) - state.accessed - buffers
    assert not missing, f"checkpoint keys silently dropped: {sorted(missing)}"


# ---------------------------------------------------------------------------
# Full-width forward parity (2048-dim cast points)
# ---------------------------------------------------------------------------

WIDE_DIT = dataclasses.replace(
    base_dit_config(), num_layers=2, text_num_layers=2,
    speaker_num_layers=2, attention_impl="xla")


def test_dit_forward_parity_at_full_width():
    """One CFG-batched DiT forward at the published widths (model 2048,
    heads 16, inter 5888, text/speaker 1280) vs the torch reference, fp32.
    Pins the fp32-island cast points (RMSNorm/AdaLN fp32 compute,
    model.py:76-103; float32 output, model.py:604) at real scale."""
    tmodel = build_torch_dit(WIDE_DIT, seed=3)
    params = jax_params_from_torch(tmodel, WIDE_DIT)

    rng = np.random.default_rng(17)
    b, g, s, tt, ts = 1, 3, 64, 48, 16
    x = rand(rng, g * b, s, WIDE_DIT.latent_size)
    t = rng.uniform(0.1, 0.9, size=(g * b,)).astype(np.float32)
    ids = rng.integers(0, 256, size=(b, tt))
    tmask_b = np.ones((b, tt), bool)
    spk = rand(rng, b, ts, WIDE_DIT.latent_size)
    smask_b = np.ones((b, ts), bool)
    # CFG branch masks [cond, uncond_text, uncond_speaker]
    tmask = np.concatenate([tmask_b, ~tmask_b, tmask_b], axis=0)
    smask = np.concatenate([smask_b, smask_b, ~smask_b], axis=0)

    with torch.no_grad():
        kv_text = tmodel.get_kv_cache_text(
            torch.tensor(ids), torch.tensor(tmask_b))
        kv_spk = tmodel.get_kv_cache_speaker(torch.tensor(spk))
        kv_text3 = [(k.repeat(g, 1, 1, 1), v.repeat(g, 1, 1, 1))
                    for k, v in kv_text]
        kv_spk3 = [(k.repeat(g, 1, 1, 1), v.repeat(g, 1, 1, 1))
                   for k, v in kv_spk]
        ref = tmodel(
            torch.tensor(x), torch.tensor(t), torch.tensor(tmask),
            torch.tensor(smask), kv_cache_text=kv_text3,
            kv_cache_speaker=kv_spk3).numpy()

    kvt = dit.get_kv_cache_text(params, WIDE_DIT, jnp.asarray(ids),
                                jnp.asarray(tmask_b))
    kvs = dit.get_kv_cache_speaker(params, WIDE_DIT, jnp.asarray(spk))
    got = np.asarray(dit.dit_forward(
        params, WIDE_DIT, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(tmask), jnp.asarray(smask), kvt, kvs))

    mse = float(np.mean((got - ref) ** 2))
    assert mse < 1e-8, f"full-width forward MSE {mse}"
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-4)
