"""Offline drill of tools/validate_weights — the one-command real-weight
gate (ROADMAP item 1) must be known-good BEFORE weights are ever
reachable: this builds reference-format safetensors from the live torch
reference at structural configs (full layer structure, tiny widths),
runs the tool end-to-end, and asserts the gate passes with fp32-exact
MSEs — and that it FAILS loudly on corrupted weights.
"""
import dataclasses
import os

import numpy as np
import pytest

from echo_tts_tpu.config import DACConfig, tiny_dit_config
from echo_tts_tpu.tools import validate_weights as vw

from torch_ref import build_torch_dac, build_torch_dit, torch_state_to_numpy

STRUCT_DIT = dataclasses.replace(
    tiny_dit_config(), num_layers=24, text_num_layers=14,
    speaker_num_layers=14)
STRUCT_DAC = DACConfig(
    encoder_dim=4, encoder_rates=(2, 4, 8, 8), latent_dim=64,
    decoder_dim=64, decoder_rates=(8, 8, 4, 2),
    encoder_transformer_layers=(0, 0, 0, 4), n_codebooks=9,
    codebook_size=16, codebook_dim=4, semantic_codebook_size=32,
    downsample_factor=(2, 2), quantizer_transformer_layers=8)

# one fast preset pair is enough to drill the loop; the production run
# iterates the real 6-preset table (pinned in test_demo_presets)
FAST_PRESETS = {
    "drill-default": {"num_steps": 2, "cfg_scale_text": 3.0,
                      "cfg_scale_speaker": 8.0, "cfg_min_t": 0.5,
                      "cfg_max_t": 1.0},
    "drill-flat": {"num_steps": 2, "cfg_scale_text": 3.0,
                   "cfg_scale_speaker": 8.0, "cfg_min_t": 0.5,
                   "cfg_max_t": 1.0, "truncation_factor": 0.8,
                   "rescale_k": 1.2, "rescale_sigma": 3.0},
}


def _write_safetensors(path, state):
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()
               if not np.iscomplexobj(v)}, path)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from echo_tts_tpu.serve import models as models_mod

    d = tmp_path_factory.mktemp("vw_model_dir")
    tdit = build_torch_dit(STRUCT_DIT, seed=4)
    _write_safetensors(str(d / models_mod.DIT_WEIGHTS),
                       torch_state_to_numpy(tdit))
    tdac = build_torch_dac(STRUCT_DAC, seed=5)
    _write_safetensors(
        str(d / models_mod.DAC_WEIGHTS),
        {k: v.detach().cpu().float().numpy()
         for k, v in tdac.state_dict().items()})
    rng = np.random.default_rng(6)
    _write_safetensors(str(d / models_mod.PCA_WEIGHTS), {
        "pca_components": rng.standard_normal(
            (STRUCT_DIT.latent_size, STRUCT_DAC.latent_dim))
        .astype(np.float32),
        "pca_mean": rng.standard_normal(
            (STRUCT_DAC.latent_dim,)).astype(np.float32),
        "latent_scale": np.asarray(0.7, np.float32),
    })
    return str(d)


def test_validate_passes_on_reference_format_weights(model_dir, tmp_path):
    report = vw.validate(
        model_dir, gate=1e-3, num_steps=2, sequence_length=8,
        speaker_len=8, dit_cfg=STRUCT_DIT, dac_cfg=STRUCT_DAC,
        presets=FAST_PRESETS,
        save_checkpoint_dir=str(tmp_path / "ckpt"))
    assert report["pass"], report
    for name, r in report["presets"].items():
        # fp32 through both stacks with identical weights: near-exact
        assert r["latent_mse"] < 1e-7, (name, r)
    assert report["codec"]["encode_pass"], report["codec"]
    # no checkpoint key silently dropped by the converters
    assert report["load"]["dit_unexpected_keys"] == []
    assert report["load"]["dac_unexpected_keys"] == []
    assert report["checkpoint"]["saved"]
    assert os.path.isdir(str(tmp_path / "ckpt"))


def test_validate_int8_report(model_dir):
    """--int8-report adds per-preset int8-vs-fp32 error (informational:
    a large int8 error must NOT fail the gate)."""
    report = vw.validate(
        model_dir, gate=1e-3, num_steps=2, sequence_length=8,
        speaker_len=8, dit_cfg=STRUCT_DIT, dac_cfg=STRUCT_DAC,
        presets=FAST_PRESETS, int8_report=True)
    assert report["pass"], report
    assert set(report["int8_mode"]) == set(FAST_PRESETS)
    for name, r in report["int8_mode"].items():
        assert np.isfinite(r["latent_mse_vs_fp32"]), (name, r)
        assert np.isfinite(r["rel_err"]) and r["rel_err"] >= 0.0, (name, r)


def test_validate_fails_on_converter_divergence(model_dir, monkeypatch):
    """The gate's failure mode is the two stacks DISAGREEING (a converter
    mapping/transpose/dtype bug): simulate one by perturbing a single
    JAX-side tensor after load — the preset MSE must blow past the gate.
    (Corrupting the FILE would corrupt both stacks identically and still
    pass — the gate pins conversion, not file integrity.)"""
    import jax

    real = vw.load_bundle_fp32

    def perturbed(*a, **k):
        bundle = real(*a, **k)
        leaves, treedef = jax.tree.flatten(bundle.dit_params)
        i = next(j for j, l in enumerate(leaves) if l.ndim >= 2)
        leaves[i] = leaves[i] + 0.3
        bundle.dit_params = jax.tree.unflatten(treedef, leaves)
        return bundle

    monkeypatch.setattr(vw, "load_bundle_fp32", perturbed)
    report = vw.validate(
        model_dir, gate=1e-6, num_steps=2, sequence_length=8,
        speaker_len=8, dit_cfg=STRUCT_DIT, dac_cfg=STRUCT_DAC,
        presets=FAST_PRESETS)
    assert not report["pass"]
    assert any(not r["pass"] for r in report["presets"].values())


def test_cli_json_report(model_dir, tmp_path, monkeypatch):
    """CLI wiring: exit code + JSON report on disk."""
    out = str(tmp_path / "report.json")
    monkeypatch.setattr(vw, "validate", lambda *a, **k: {
        "pass": True, "presets": {}, "codec": {}})
    assert vw.main(["--model-dir", model_dir, "--out", out]) == 0
    import json
    with open(out) as f:
        assert json.load(f)["pass"] is True

    monkeypatch.setattr(vw, "validate", lambda *a, **k: {"pass": False})
    assert vw.main(["--model-dir", model_dir]) == 1


def test_resolve_paths_from_hub_mock(monkeypatch, model_dir):
    """--from-hf resolves through tools.hub._download with the reference's
    repo/filename pairs (inference.py:25,61,92)."""
    import echo_tts_tpu.tools.hub as hub

    calls = []

    def fake(repo, fn, token):
        calls.append((repo, fn))
        return os.path.join(model_dir, fn)

    monkeypatch.setattr(hub, "_download", fake)
    paths = vw.resolve_weight_paths(None, from_hf=True, token="t")
    assert calls == [(hub.DIT_REPO, hub.DIT_FILE),
                     (hub.DAC_REPO, hub.DAC_FILE),
                     (hub.DIT_REPO, hub.PCA_FILE)]
    assert hub.DAC_FILE == "pytorch_model.safetensors"  # inference.py:61
    assert len(paths) == 3

    with pytest.raises(ValueError, match="--model-dir or --from-hf"):
        vw.resolve_weight_paths(None, from_hf=False)
