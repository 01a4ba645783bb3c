"""Production weight-load path drill (offline).

The one path a real deployment MUST get right — reference-format
safetensors in ECHO_MODEL_DIR -> serve.models.load_models -> synthesize ->
tools/checkpoint round trip — previously had no test (round-2 VERDICT
weak #1): only the allow_random path was exercised, so a malformed key
mapping or dtype bug would have surfaced on first real deployment.

Real weights cannot be downloaded here (no egress), but the FILE FORMAT is
fully specified by the reference module tree (reference: inference.py:14-47,
handler.py:323-423): this test builds the live torch reference at full
structure / tiny widths (the STRUCT configs of test_fullsize_confidence),
writes its state dicts as the exact safetensors trio serve.models expects
(pytorch_model.safetensors / fish_ae.safetensors / pca_state.safetensors),
and drills the whole serving path on it.
"""
import dataclasses
import importlib
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from echo_tts_tpu.config import DACConfig, tiny_dit_config

from torch_ref import (build_torch_dac, build_torch_dit,
                       jax_params_from_torch, torch_state_to_numpy)

h = importlib.import_module("echo_tts_tpu.serve.handler")
models_mod = importlib.import_module("echo_tts_tpu.serve.models")

# Full layer structure of the published checkpoints, tiny widths
# (same shapes as tests/test_fullsize_confidence.py key-coverage tests).
STRUCT_DIT = dataclasses.replace(
    tiny_dit_config(), num_layers=24, text_num_layers=14,
    speaker_num_layers=14)
STRUCT_DAC = DACConfig(
    encoder_dim=4, encoder_rates=(2, 4, 8, 8), latent_dim=64,
    decoder_dim=64, decoder_rates=(8, 8, 4, 2),
    encoder_transformer_layers=(0, 0, 0, 4), n_codebooks=9,
    codebook_size=16, codebook_dim=4, semantic_codebook_size=32,
    downsample_factor=(2, 2), quantizer_transformer_layers=8)

PCA_SCALE = 0.731


def _write_safetensors(path, state):
    """Write a torch state dict (as numpy) in reference file format.
    Complex-typed derived buffers (freqs_cis) are rebuilt from config by
    both the reference and this repo and are not storable in safetensors;
    every PARAMETER is written."""
    from safetensors.numpy import save_file
    out = {}
    for k, v in state.items():
        if np.iscomplexobj(v):
            continue
        out[k] = np.ascontiguousarray(v)
    save_file(out, path)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("echo_model_dir")

    tdit = build_torch_dit(STRUCT_DIT, seed=1)
    _write_safetensors(str(d / models_mod.DIT_WEIGHTS),
                       torch_state_to_numpy(tdit))

    tdac = build_torch_dac(STRUCT_DAC, seed=2)
    _write_safetensors(
        str(d / models_mod.DAC_WEIGHTS),
        {k: v.detach().cpu().float().numpy()
         for k, v in tdac.state_dict().items()})

    rng = np.random.default_rng(3)
    pca = {
        "pca_components": rng.standard_normal(
            (STRUCT_DIT.latent_size, STRUCT_DAC.latent_dim))
        .astype(np.float32),
        "pca_mean": rng.standard_normal(
            (STRUCT_DAC.latent_dim,)).astype(np.float32),
        "latent_scale": np.asarray(PCA_SCALE, dtype=np.float32),
    }
    _write_safetensors(str(d / models_mod.PCA_WEIGHTS), pca)

    return str(d), tdit


@pytest.fixture()
def struct_configs(monkeypatch):
    """Point serve.models' production loaders at the STRUCT configs."""
    monkeypatch.setattr(models_mod, "base_dit_config",
                        lambda blockwise=True: dataclasses.replace(
                            STRUCT_DIT, blockwise=blockwise))
    monkeypatch.setattr(models_mod, "base_dac_config", lambda: STRUCT_DAC)
    models_mod.clear_models()
    yield
    models_mod.clear_models()


def test_load_models_from_dir_matches_in_memory_conversion(
        model_dir, struct_configs):
    """The disk path (safetensors -> converters) must produce bit-identical
    parameters to the in-memory conversion the parity suite validates."""
    d, tdit = model_dir
    bundle = models_mod.load_models(d, dtype=jnp.float32)
    assert bundle.dit_cfg == dataclasses.replace(STRUCT_DIT, blockwise=True)
    assert bundle.dac_cfg == STRUCT_DAC

    expect = jax_params_from_torch(tdit, STRUCT_DIT)
    flat_got = jax.tree_util.tree_leaves_with_path(bundle.dit_params)
    flat_exp = dict(jax.tree_util.tree_leaves_with_path(expect))
    assert len(flat_got) == len(flat_exp)
    for path, leaf in flat_got:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_exp[path]),
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")

    assert float(bundle.pca["latent_scale"]) == pytest.approx(PCA_SCALE)


def test_hub_loader_with_mocked_downloads(model_dir, monkeypatch):
    """tools/hub.load_models_from_hf (reference: inference.py:14-47,
    56-76, 92-99) drilled offline: hf_hub_download is mocked to return
    the reference-format files on disk; the resulting bundle must be
    bit-identical to serve.models' disk loader."""
    import echo_tts_tpu.tools.hub as hub

    d, tdit = model_dir
    files = {
        (hub.DIT_REPO, hub.DIT_FILE): os.path.join(d, models_mod.DIT_WEIGHTS),
        (hub.DAC_REPO, hub.DAC_FILE): os.path.join(d, models_mod.DAC_WEIGHTS),
        (hub.DIT_REPO, hub.PCA_FILE): os.path.join(d, models_mod.PCA_WEIGHTS),
    }
    monkeypatch.setattr(hub, "_download",
                        lambda repo, fn, token: files[(repo, fn)])
    monkeypatch.setattr(
        hub, "base_dit_config",
        lambda blockwise=True: dataclasses.replace(STRUCT_DIT,
                                                   blockwise=blockwise))
    monkeypatch.setattr(hub, "base_dac_config", lambda: STRUCT_DAC)

    bundle = hub.load_models_from_hf(token=None, dtype=jnp.float32)
    assert bundle.dit_cfg == dataclasses.replace(STRUCT_DIT, blockwise=True)

    expect = jax_params_from_torch(tdit, STRUCT_DIT)
    got = dict(jax.tree_util.tree_leaves_with_path(bundle.dit_params))
    for path, leaf in jax.tree_util.tree_leaves_with_path(expect):
        np.testing.assert_array_equal(
            np.asarray(got[path]), np.asarray(leaf),
            err_msg=f"hub param mismatch at {jax.tree_util.keystr(path)}")
    assert float(bundle.pca["latent_scale"]) == pytest.approx(PCA_SCALE)

    # blockwise=False drops exactly the latent-encoder modules
    slim = hub.load_models_from_hf(token=None, dtype=jnp.float32,
                                   blockwise=False)
    assert "latent_encoder" not in slim.dit_params
    assert "wk_latent" not in slim.dit_params["blocks"]["attn"]


def test_synthesize_and_checkpoint_roundtrip_identical_audio(
        model_dir, struct_configs, tmp_path):
    """ECHO_MODEL_DIR -> load_models -> synthesize, then orbax checkpoint
    save/load -> synthesize again: byte-identical WAVs.  This is the full
    cold-start path of a real deployment (reference: handler.py:323-423)."""
    d, _ = model_dir
    from echo_tts_tpu.serve.config import load_config
    from echo_tts_tpu.tools.checkpoint import (load_checkpoint,
                                               save_checkpoint)

    cfg = load_config({
        "ECHO_MODEL_DIR": d,
        "AUDIO_VOICES_DIR": str(tmp_path / "voices"),
        "OUTPUT_AUDIO_DIR": str(tmp_path / "out"),
        "HF_TOKEN": "test",
    })
    os.makedirs(cfg.voices_dir, exist_ok=True)

    bundle = models_mod.load_models(d, dtype=jnp.float32)
    job = {"text": "Deployment drill.", "seed": 11,
           "parameters": {"num_steps": 2, "sequence_length": 8}}
    out1 = h.synthesize(dict(job), cfg=cfg, models=bundle)
    assert out1["status"] == "success", out1

    ck = str(tmp_path / "ckpt")
    save_checkpoint(ck, bundle)
    restored = load_checkpoint(ck)
    assert restored.dit_cfg == bundle.dit_cfg
    assert restored.dac_cfg == bundle.dac_cfg

    out2 = h.synthesize(dict(job), cfg=cfg, models=restored)
    assert out2["status"] == "success", out2

    with open(out1["local_path"], "rb") as f:
        wav1 = f.read()
    with open(out2["local_path"], "rb") as f:
        wav2 = f.read()
    assert out1["local_path"] != out2["local_path"]
    assert wav1 == wav2, "restored checkpoint produced different audio"
