"""One-command real-weight validation gate.

Runs, given reachable hub weights (`--from-hf`) or a pre-populated model
dir (reference-format safetensors, see serve/models.py):

  1. load through the production converters (tools/convert*.py),
  2. fixed injected-noise latent MSE vs the LIVE torch reference across
     all 6 sampler presets (< `--gate`, default 1e-3; the sampler
     semantics of reference inference.py:427-517),
  3. codec legs: encode parity vs the reference AE (inference.py:219-224)
     and a round-trip SNR sanity stat,
  4. an orbax checkpoint save (optional `--save-checkpoint DIR`),

and writes one JSON report.  Exit code 0 iff every gate passed.

The torch reference is imported live from `--reference-dir` (never
vendored, repo rule); heavy/absent deps (torchaudio, torchcodec, runpod)
are stubbed exactly as the parity suite does.  The tool itself is drilled
offline in tests/test_validate_weights.py with structural-config weights
and mocked downloads, so it is known-good before real weights are ever
reachable.

The gate is step/length-agnostic (it pins WEIGHT-VALUE flow through both
stacks, not audio quality), so the defaults use short sequences and few
steps to keep the CPU torch leg tractable; pass --full for each preset's
native step count at full sequence length.

Usage:
    python -m echo_tts_tpu.tools.validate_weights --model-dir $ECHO_MODEL_DIR
    python -m echo_tts_tpu.tools.validate_weights --from-hf --save-checkpoint ckpt/
"""
from __future__ import annotations

import json
import os
import sys
import time
import types
from typing import List, Optional

import numpy as np

import jax.numpy as jnp

from ..config import SAMPLER_DEFAULTS
from ..pipeline.pipeline import EchoModels

DEFAULT_REFERENCE_DIR = "/root/reference"


# ---------------------------------------------------------------- reference

def _import_reference(reference_dir: str):
    """Import the live torch reference (model, autoencoder, inference)
    with absent deps stubbed — same recipe as the parity suite's oracle
    (tests/torch_ref.py)."""
    import importlib.util

    def pkg_absent(base: str) -> bool:
        mod = sys.modules.get(base)
        if mod is not None:
            # an earlier stub (ours or the test oracle's) has no __spec__
            # — and find_spec RAISES on such entries, so answer from the
            # module object instead
            return getattr(mod, "__spec__", None) is None
        try:
            return importlib.util.find_spec(base) is None
        except (ValueError, ModuleNotFoundError):
            return True

    if reference_dir not in sys.path:
        sys.path.insert(0, reference_dir)
    for name in ("torchaudio", "torchcodec", "torchcodec.decoders",
                 "huggingface_hub"):
        # Stub ONLY genuinely-absent packages: an unconditional stub of
        # e.g. huggingface_hub would permanently shadow a real install in
        # sys.modules and poison a later --from-hf download in the same
        # process (hub._download would get the stub's None paths).
        if name not in sys.modules and pkg_absent(name.split(".")[0]):
            mod = types.ModuleType(name)
            if name == "torchcodec.decoders":
                mod.AudioDecoder = object
            if name == "huggingface_hub":
                mod.hf_hub_download = lambda *a, **k: None
            sys.modules[name] = mod
    import autoencoder as ref_ae  # noqa
    import inference as ref_inf  # noqa
    import model as ref_model  # noqa
    return ref_model, ref_ae, ref_inf


def build_reference_dit(ref_model, cfg):
    """Reference EchoDiT at our config's hyperparameters (the published
    checkpoint's, reference inference.py:16-24, when cfg is base)."""
    m = ref_model.EchoDiT(
        latent_size=cfg.latent_size, model_size=cfg.model_size,
        num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size, norm_eps=cfg.norm_eps,
        text_vocab_size=cfg.text_vocab_size,
        text_model_size=cfg.text_model_size,
        text_num_layers=cfg.text_num_layers,
        text_num_heads=cfg.text_num_heads,
        text_intermediate_size=cfg.text_intermediate_size,
        speaker_patch_size=cfg.speaker_patch_size,
        speaker_model_size=cfg.speaker_model_size,
        speaker_num_layers=cfg.speaker_num_layers,
        speaker_num_heads=cfg.speaker_num_heads,
        speaker_intermediate_size=cfg.speaker_intermediate_size,
        timestep_embed_size=cfg.timestep_embed_size,
        adaln_rank=cfg.adaln_rank)
    return m.eval()


def build_reference_dac(ref_ae, cfg):
    """Reference S1-DAC at our DACConfig's hyperparameters (the build_ae
    wiring, reference autoencoder.py:1144-1192)."""
    q_config = ref_ae.ModelArgs(
        block_size=4096, n_layer=cfg.quantizer_transformer_layers,
        n_head=cfg.latent_dim // 64, dim=cfg.latent_dim,
        intermediate_size=cfg.latent_dim * 3, head_dim=64, norm_eps=1e-5,
        dropout_rate=0.1, attn_dropout_rate=0.1, channels_first=True)

    def make_transformer():
        return ref_ae.WindowLimitedTransformer(
            causal=True, window_size=128, input_dim=cfg.latent_dim,
            config=q_config)

    quantizer = ref_ae.DownsampleResidualVectorQuantize(
        input_dim=cfg.latent_dim, n_codebooks=cfg.n_codebooks,
        codebook_size=cfg.codebook_size, codebook_dim=cfg.codebook_dim,
        quantizer_dropout=0.5,
        downsample_factor=tuple(cfg.downsample_factor),
        semantic_codebook_size=cfg.semantic_codebook_size,
        pre_module=make_transformer(), post_module=make_transformer())

    def transformer_general_config(**kw):
        return ref_ae.ModelArgs(
            block_size=kw.get("block_size", 16384),
            n_layer=kw.get("n_layer", 8), n_head=kw.get("n_head", 8),
            dim=kw.get("dim", 512),
            intermediate_size=kw.get("intermediate_size", 1536),
            n_local_heads=kw.get("n_local_heads", -1),
            head_dim=kw.get("head_dim", 64),
            rope_base=kw.get("rope_base", 10000),
            norm_eps=kw.get("norm_eps", 1e-5),
            dropout_rate=kw.get("dropout_rate", 0.1),
            attn_dropout_rate=kw.get("attn_dropout_rate", 0.1),
            channels_first=kw.get("channels_first", True))

    dac = ref_ae.DAC(
        encoder_dim=cfg.encoder_dim,
        encoder_rates=list(cfg.encoder_rates),
        latent_dim=cfg.latent_dim, decoder_dim=cfg.decoder_dim,
        decoder_rates=list(cfg.decoder_rates), quantizer=quantizer,
        sample_rate=cfg.sample_rate, causal=True,
        encoder_transformer_layers=list(cfg.encoder_transformer_layers),
        decoder_transformer_layers=[0] * len(cfg.decoder_rates),
        transformer_general_config=transformer_general_config)
    return dac.eval()


def _load_torch_state(model, path: str):
    """strict=False load (derived buffers like freqs_cis are rebuilt from
    config by both stacks and absent from checkpoints); returns the
    missing/unexpected key lists for the report."""
    from safetensors.torch import load_file

    res = model.load_state_dict(load_file(path), strict=False)
    return list(res.missing_keys), list(res.unexpected_keys)


# ---------------------------------------------------------------- loading

def resolve_weight_paths(model_dir: Optional[str], from_hf: bool,
                         token: Optional[str] = None):
    """(dit, dac, pca) safetensors paths from a model dir or the hub."""
    if from_hf:
        from . import hub
        return (hub._download(hub.DIT_REPO, hub.DIT_FILE, token),
                hub._download(hub.DAC_REPO, hub.DAC_FILE, token),
                hub._download(hub.DIT_REPO, hub.PCA_FILE, token))
    if not model_dir:
        raise ValueError("pass --model-dir or --from-hf")
    from ..serve import models as models_mod
    return (os.path.join(model_dir, models_mod.DIT_WEIGHTS),
            os.path.join(model_dir, models_mod.DAC_WEIGHTS),
            os.path.join(model_dir, models_mod.PCA_WEIGHTS))


def load_bundle_fp32(dit_path: str, dac_path: str, pca_path: str,
                     dit_cfg=None, dac_cfg=None) -> EchoModels:
    """Production converters -> fp32 bundle (value validation runs fp32
    so the MSE reflects the weights, not bf16 rounding)."""
    from safetensors import safe_open

    from ..config import base_dac_config, base_dit_config
    from .convert import load_dit_from_safetensors
    from .convert_dac import convert_pca_state, load_dac_from_safetensors

    dit_cfg = dit_cfg or base_dit_config()
    dac_cfg = dac_cfg or base_dac_config()
    dit_params = load_dit_from_safetensors(dit_path, dit_cfg,
                                           dtype=jnp.float32)
    dac_params = load_dac_from_safetensors(dac_path, dac_cfg)
    with safe_open(pca_path, framework="np") as f:
        pca = convert_pca_state(
            f.get_tensor("pca_components"), f.get_tensor("pca_mean"),
            f.get_tensor("latent_scale"))
    return EchoModels(dit_params=dit_params, dit_cfg=dit_cfg,
                      dac_params=dac_params, dac_cfg=dac_cfg, pca=pca,
                      dtype=jnp.float32)


# ---------------------------------------------------------------- checks

def _sampler_inputs(cfg, sequence_length: int, speaker_len: int, seed: int):
    rng = np.random.default_rng(seed + 100)
    ids = rng.integers(0, cfg.text_vocab_size, size=(1, 24))
    tmask = np.ones((1, 24), bool)
    tmask[:, 20:] = False
    spk = rng.standard_normal((1, speaker_len, cfg.latent_size)) \
        .astype(np.float32)
    smask = np.ones((1, speaker_len), bool)
    return ids, tmask, spk, smask


def check_sampler_presets(models: EchoModels, tdit, ref_inf, *,
                          gate: float, num_steps: Optional[int],
                          sequence_length: int, speaker_len: int,
                          seed: int = 0, presets=None) -> dict:
    """Per-preset latent MSE, JAX fp32 vs torch fp32, identical injected
    noise (torch generator semantics, reference inference.py:427-443)."""
    import torch

    from ..sampler.euler import sample_euler_cfg_independent_guidances
    from ..serve.presets import load_presets

    presets = presets if presets is not None else load_presets()
    ids, tmask, spk, smask = _sampler_inputs(
        models.dit_cfg, sequence_length, speaker_len, seed)
    out = {}
    for name, preset in presets.items():
        p = dict(SAMPLER_DEFAULTS)
        p.update(preset)
        p.pop("sequence_length", None)
        if num_steps is not None:
            p["num_steps"] = num_steps
        t0 = time.time()
        with torch.no_grad():
            ref = ref_inf.sample_euler_cfg_independent_guidances(
                model=tdit,
                speaker_latent=torch.tensor(spk),
                speaker_mask=torch.tensor(smask),
                text_input_ids=torch.tensor(ids),
                text_mask=torch.tensor(tmask),
                rng_seed=seed, sequence_length=sequence_length,
                **p).numpy()
        gen = torch.Generator(device="cpu").manual_seed(seed)
        noise = torch.randn((1, sequence_length, models.dit_cfg.latent_size),
                            dtype=torch.float32, generator=gen).numpy()
        got = np.asarray(sample_euler_cfg_independent_guidances(
            models.dit_params, models.dit_cfg,
            jnp.asarray(spk), jnp.asarray(smask),
            jnp.asarray(ids), jnp.asarray(tmask),
            sequence_length=sequence_length, dtype=jnp.float32,
            initial_noise=jnp.asarray(noise), **p))
        mse = float(np.mean((got - ref) ** 2))
        out[name] = {"latent_mse": mse, "pass": bool(mse < gate),
                     "seconds": round(time.time() - t0, 1)}
    return out


def check_codec(models: EchoModels, tdac, ref_inf, pca_path: str,
                *, gate: float, num_latents: int = 32) -> dict:
    """Encode parity vs the reference AE on synthetic audio + round-trip
    SNR sanity (reference: inference.py:219-235)."""
    import torch

    from ..pipeline.pipeline import ae_decode, ae_encode

    spl = models.dac_cfg.frame_length
    n = num_latents * spl
    t = np.arange(n, dtype=np.float32) / models.dac_cfg.sample_rate
    audio = (0.4 * np.sin(2 * np.pi * 220.0 * t)
             + 0.25 * np.sin(2 * np.pi * 587.0 * t)
             + 0.1 * np.sin(2 * np.pi * 1760.0 * t)).astype(np.float32)
    audio = audio[None, :]

    lat = np.asarray(ae_encode(models, jnp.asarray(audio)))

    from safetensors.torch import load_file
    praw = load_file(pca_path)
    pca_state = ref_inf.PCAState(
        pca_components=praw["pca_components"].float(),
        pca_mean=praw["pca_mean"].float(),
        latent_scale=float(praw["latent_scale"].item()))
    with torch.no_grad():
        ref_lat = ref_inf.ae_encode(
            tdac, pca_state, torch.tensor(audio[:, None, :])).numpy()

    n_cmp = min(lat.shape[1], ref_lat.shape[1])
    enc_mse = float(np.mean((lat[:, :n_cmp] - ref_lat[:, :n_cmp]) ** 2))

    recon = np.asarray(ae_decode(models, jnp.asarray(lat)))
    m = min(recon.shape[-1], audio.shape[-1])
    err = recon[..., :m] - audio[..., :m]
    snr_db = float(10 * np.log10(
        (np.mean(audio[..., :m] ** 2) + 1e-12) /
        (np.mean(err ** 2) + 1e-12)))
    return {"encode_mse_vs_reference": enc_mse,
            "encode_pass": bool(enc_mse < gate),
            "roundtrip_snr_db": round(snr_db, 2),
            "num_latents": int(lat.shape[1])}


def check_int8_mode(models: EchoModels, *, num_steps: Optional[int],
                    sequence_length: int, speaker_len: int,
                    seed: int = 0, presets=None) -> dict:
    """Per-preset latent MSE / relative error of the int8 (W8A8) serving
    mode vs the fp32 JAX path on THESE weights — the acceptance metric
    for ECHO_DIT_QUANT=int8 (a NON-PARITY opt-in; this is informational
    and never gates report['pass']).  Random-weight envelopes are pinned
    in tests/test_quant.py; this puts real numbers on real weights the
    day they are reachable."""
    from ..ops.quant import quantize_dit_params
    from ..sampler.euler import sample_euler_cfg_independent_guidances
    from ..serve.presets import load_presets

    presets = presets if presets is not None else load_presets()
    ids, tmask, spk, smask = _sampler_inputs(
        models.dit_cfg, sequence_length, speaker_len, seed)
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(
        (1, sequence_length, models.dit_cfg.latent_size)).astype(np.float32)
    qparams = quantize_dit_params(models.dit_params)
    out = {}
    for name, preset in presets.items():
        p = dict(SAMPLER_DEFAULTS)
        p.update(preset)
        p.pop("sequence_length", None)
        if num_steps is not None:
            p["num_steps"] = num_steps
        kw = dict(sequence_length=sequence_length, dtype=jnp.float32,
                  initial_noise=jnp.asarray(noise), **p)
        ref = np.asarray(sample_euler_cfg_independent_guidances(
            models.dit_params, models.dit_cfg, jnp.asarray(spk),
            jnp.asarray(smask), jnp.asarray(ids), jnp.asarray(tmask), **kw))
        got = np.asarray(sample_euler_cfg_independent_guidances(
            qparams, models.dit_cfg, jnp.asarray(spk), jnp.asarray(smask),
            jnp.asarray(ids), jnp.asarray(tmask), **kw))
        out[name] = {
            "latent_mse_vs_fp32": float(np.mean((got - ref) ** 2)),
            "rel_err": float(np.linalg.norm(got - ref)
                             / (np.linalg.norm(ref) + 1e-12)),
        }
    return out


def validate(model_dir: Optional[str] = None, *, from_hf: bool = False,
             token: Optional[str] = None,
             reference_dir: str = DEFAULT_REFERENCE_DIR,
             gate: float = 1e-3, num_steps: Optional[int] = 8,
             sequence_length: int = 160, speaker_len: int = 64,
             save_checkpoint_dir: Optional[str] = None,
             dit_cfg=None, dac_cfg=None, presets=None,
             int8_report: bool = False) -> dict:
    """The full gate; returns the report dict (report["pass"] is the
    overall verdict)."""
    t_start = time.time()
    dit_path, dac_path, pca_path = resolve_weight_paths(
        model_dir, from_hf, token)
    bundle = load_bundle_fp32(dit_path, dac_path, pca_path,
                              dit_cfg=dit_cfg, dac_cfg=dac_cfg)

    ref_model, ref_ae, ref_inf = _import_reference(reference_dir)
    tdit = build_reference_dit(ref_model, bundle.dit_cfg)
    dit_missing, dit_unexpected = _load_torch_state(tdit, dit_path)
    tdac = build_reference_dac(ref_ae, bundle.dac_cfg)
    dac_missing, dac_unexpected = _load_torch_state(tdac, dac_path)

    report = {
        "weights": {"dit": dit_path, "dac": dac_path, "pca": pca_path},
        "gate": gate,
        "settings": {"num_steps": num_steps,
                     "sequence_length": sequence_length,
                     "speaker_len": speaker_len},
        "load": {
            "dit_missing_keys": dit_missing,
            "dit_unexpected_keys": dit_unexpected,
            "dac_missing_keys": dac_missing,
            "dac_unexpected_keys": dac_unexpected,
        },
        "presets": check_sampler_presets(
            bundle, tdit, ref_inf, gate=gate, num_steps=num_steps,
            sequence_length=sequence_length, speaker_len=speaker_len,
            presets=presets),
        "codec": check_codec(bundle, tdac, ref_inf, pca_path, gate=gate),
    }
    if int8_report:
        report["int8_mode"] = check_int8_mode(
            bundle, num_steps=num_steps, sequence_length=sequence_length,
            speaker_len=speaker_len, presets=presets)
    if save_checkpoint_dir:
        from .checkpoint import save_checkpoint
        save_checkpoint(save_checkpoint_dir, bundle)
        report["checkpoint"] = {"path": save_checkpoint_dir, "saved": True}

    # Unexpected checkpoint keys mean the converter silently DROPPED
    # weights — fail the gate; missing derived buffers are normal.
    report["pass"] = bool(
        all(v["pass"] for v in report["presets"].values())
        and report["codec"]["encode_pass"]
        and not dit_unexpected and not dac_unexpected)
    report["seconds"] = round(time.time() - t_start, 1)
    return report


def main(argv: Optional[List[str]] = None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model-dir", default=os.environ.get("ECHO_MODEL_DIR"))
    ap.add_argument("--from-hf", action="store_true")
    ap.add_argument("--token", default=os.environ.get("HF_TOKEN"))
    ap.add_argument("--reference-dir", default=DEFAULT_REFERENCE_DIR)
    ap.add_argument("--gate", type=float, default=1e-3)
    ap.add_argument("--num-steps", type=int, default=8,
                    help="steps per preset (gate is step-agnostic; "
                         "0 = each preset's native count)")
    ap.add_argument("--sequence-length", type=int, default=160)
    ap.add_argument("--speaker-len", type=int, default=64)
    ap.add_argument("--full", action="store_true",
                    help="native preset steps at full sequence length "
                         "(slow: the torch leg runs on CPU)")
    ap.add_argument("--save-checkpoint", default=None)
    ap.add_argument("--int8-report", action="store_true",
                    help="also report the int8 (W8A8) mode's latent "
                         "error vs the fp32 path on these weights "
                         "(informational; never gates)")
    ap.add_argument("--out", default=None, help="write the JSON report here")
    args = ap.parse_args(argv)

    num_steps = None if (args.full or args.num_steps == 0) else args.num_steps
    seq_len = 640 if args.full else args.sequence_length
    report = validate(
        args.model_dir, from_hf=args.from_hf, token=args.token,
        reference_dir=args.reference_dir, gate=args.gate,
        num_steps=num_steps, sequence_length=seq_len,
        speaker_len=args.speaker_len,
        save_checkpoint_dir=args.save_checkpoint,
        int8_report=args.int8_report)
    text = json.dumps(report, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
