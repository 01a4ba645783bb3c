"""Live golden oracle: builds the PyTorch reference models (read-only from
/root/reference) with random weights and exposes them plus the converted JAX
params.  This gives module-level parity tests without shipping any reference
code or weights in this repo.
"""
from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_PATH = "/root/reference"


def _ensure_ref_importable():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)


def import_ref_model():
    _ensure_ref_importable()
    import model as ref_model  # noqa
    return ref_model


def import_ref_autoencoder():
    _ensure_ref_importable()
    import autoencoder as ref_ae  # noqa
    return ref_ae


def import_ref_inference():
    """Import reference inference.py with its heavyweight/absent deps stubbed
    (torchaudio, torchcodec, huggingface_hub, safetensors are not needed for
    the sampler math we use as an oracle)."""
    import importlib.util

    def pkg_absent(base):
        mod = sys.modules.get(base)
        if mod is not None:
            # a stub installed earlier has no __spec__ (find_spec RAISES
            # on those); a real import has one
            return getattr(mod, "__spec__", None) is None
        try:
            return importlib.util.find_spec(base) is None
        except (ValueError, ModuleNotFoundError):
            return True

    _ensure_ref_importable()
    for name in ("torchaudio", "torchcodec", "torchcodec.decoders",
                 "huggingface_hub"):
        # stub only genuinely-absent packages — an unconditional stub
        # would shadow a real install for the rest of the process (e.g.
        # huggingface_hub IS installed in this image)
        if name not in sys.modules and pkg_absent(name.split(".")[0]):
            mod = types.ModuleType(name)
            if name == "torchcodec.decoders":
                mod.AudioDecoder = object
            if name == "huggingface_hub":
                mod.hf_hub_download = lambda *a, **k: None
            sys.modules[name] = mod
    if "safetensors.torch" not in sys.modules:
        try:
            # Prefer the REAL package: stubbing it into sys.modules would
            # break later `safetensors.numpy` imports (it is installed in
            # this image; the stub is for truly absent environments only).
            import safetensors.torch  # noqa: F401
        except ImportError:
            st = types.ModuleType("safetensors.torch")
            st.load_file = lambda *a, **k: {}
            pkg = types.ModuleType("safetensors")
            pkg.torch = st
            sys.modules.setdefault("safetensors", pkg)
            sys.modules["safetensors.torch"] = st
    import inference as ref_inference  # noqa
    return ref_inference


def import_ref_handler():
    """Import reference handler.py with runpod/boto3/torchaudio stubbed —
    we only use its pure DSP/chunking functions as oracles."""
    import_ref_inference()  # inference import chain must already be stubbed
    for name in ("runpod", "boto3"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "runpod":
                class _Log:
                    def __getattr__(self, _):
                        return lambda *a, **k: None
                mod.RunPodLogger = _Log
                mod.serverless = types.SimpleNamespace(start=lambda *a, **k: None)
            sys.modules[name] = mod
    import handler as ref_handler  # noqa
    return ref_handler


def build_torch_dit(cfg, seed: int = 0):
    """Instantiate the reference EchoDiT with our config + random weights."""
    import torch

    ref_model = import_ref_model()
    torch.manual_seed(seed)
    model = ref_model.EchoDiT(
        latent_size=cfg.latent_size,
        model_size=cfg.model_size,
        num_layers=cfg.num_layers,
        num_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        norm_eps=cfg.norm_eps,
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
        adaln_rank=cfg.adaln_rank,
    ).eval()
    # Non-degenerate norm weights so parity actually exercises them.
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "norm" in name and p.ndim >= 1 and p.dtype.is_floating_point:
                p.add_(0.05 * torch.randn_like(p))
    return model


def torch_state_to_numpy(model) -> dict:
    return {k: v.detach().cpu().float().numpy()
            for k, v in model.state_dict().items()}


def jax_params_from_torch(model, cfg, dtype=None):
    from echo_tts_tpu.tools.convert import convert_dit_state

    return convert_dit_state(torch_state_to_numpy(model), cfg, dtype=dtype)


def rand(rng: np.random.Generator, *shape, dtype=np.float32):
    return rng.standard_normal(shape).astype(dtype)


def build_torch_dac(cfg, seed: int = 0):
    """Instantiate the reference S1-DAC (build_ae structure,
    autoencoder.py:1144-1192) from our DACConfig, with random weights."""
    import torch

    ref_ae = import_ref_autoencoder()
    torch.manual_seed(seed)

    q_config = ref_ae.ModelArgs(
        block_size=4096,
        n_layer=cfg.quantizer_transformer_layers,
        n_head=cfg.latent_dim // 64,
        dim=cfg.latent_dim,
        intermediate_size=cfg.latent_dim * 3,
        head_dim=64,
        norm_eps=1e-5,
        dropout_rate=0.1,
        attn_dropout_rate=0.1,
        channels_first=True,
    )

    def make_transformer():
        return ref_ae.WindowLimitedTransformer(
            causal=True, window_size=128, input_dim=cfg.latent_dim,
            config=q_config)

    quantizer = ref_ae.DownsampleResidualVectorQuantize(
        input_dim=cfg.latent_dim,
        n_codebooks=cfg.n_codebooks,
        codebook_size=cfg.codebook_size,
        codebook_dim=cfg.codebook_dim,
        quantizer_dropout=0.5,
        downsample_factor=tuple(cfg.downsample_factor),
        semantic_codebook_size=cfg.semantic_codebook_size,
        pre_module=make_transformer(),
        post_module=make_transformer(),
    )

    def transformer_general_config(**kw):
        return ref_ae.ModelArgs(
            block_size=kw.get("block_size", 16384),
            n_layer=kw.get("n_layer", 8),
            n_head=kw.get("n_head", 8),
            dim=kw.get("dim", 512),
            intermediate_size=kw.get("intermediate_size", 1536),
            n_local_heads=kw.get("n_local_heads", -1),
            head_dim=kw.get("head_dim", 64),
            rope_base=kw.get("rope_base", 10000),
            norm_eps=kw.get("norm_eps", 1e-5),
            dropout_rate=kw.get("dropout_rate", 0.1),
            attn_dropout_rate=kw.get("attn_dropout_rate", 0.1),
            channels_first=kw.get("channels_first", True),
        )

    dac = ref_ae.DAC(
        encoder_dim=cfg.encoder_dim,
        encoder_rates=list(cfg.encoder_rates),
        latent_dim=cfg.latent_dim,
        decoder_dim=cfg.decoder_dim,
        decoder_rates=list(cfg.decoder_rates),
        quantizer=quantizer,
        sample_rate=cfg.sample_rate,
        causal=True,
        encoder_transformer_layers=list(cfg.encoder_transformer_layers),
        decoder_transformer_layers=[0] * len(cfg.decoder_rates),
        transformer_general_config=transformer_general_config,
    )
    return dac.eval()


def jax_dac_params_from_torch(dac, cfg):
    from echo_tts_tpu.tools.convert_dac import convert_dac_state

    state = {k: v.detach().cpu().float().numpy()
             for k, v in dac.state_dict().items()}
    return convert_dac_state(state, cfg)
