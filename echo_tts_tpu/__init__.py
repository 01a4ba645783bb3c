"""echo_tts_tpu — a TPU-native Echo-TTS inference & serving framework.

Layer map (see SURVEY.md for the reference analysis this rebuilds):

  models/    EchoDiT + text/speaker/latent encoders (scan-based, Pallas
             fused joint attention), Fish S1-DAC codec (MXU matmul convs)
  sampler/   Euler CFG sampler + blockwise streaming sampler (cached jit)
  pipeline/  host text stack, DSP, audio IO, text->audio orchestration
  serve/     request handler, presets/buckets, micro-batcher, streaming
  parallel/  (data, model) mesh, TP/DP shardings, sharded inference
  train/     rectified-flow training step (sharded)
  tools/     torch->JAX converters, orbax checkpoints, HF-hub loaders
  demo/      interactive demo session (+ optional gradio wrapper)
"""
from . import config
from .config import (DACConfig, EchoDiTConfig, SAMPLER_DEFAULTS,
                     base_dac_config, base_dit_config, tiny_dac_config,
                     tiny_dit_config)
from .ops.quant import quantize_dit_params
from .pipeline.pipeline import (EchoModels, ae_decode, ae_encode,
                                ae_reconstruct, sample_pipeline,
                                sample_pipeline_chunked)
from .sampler.blockwise import (
    iter_blockwise_euler_cfg_independent_guidances,
    sample_blockwise_euler_cfg_independent_guidances)
from .sampler.euler import sample_euler_cfg_independent_guidances

__version__ = "0.1.0"

__all__ = [
    "DACConfig", "EchoDiTConfig", "EchoModels", "SAMPLER_DEFAULTS",
    "ae_decode", "ae_encode", "ae_reconstruct", "base_dac_config",
    "base_dit_config", "config",
    "iter_blockwise_euler_cfg_independent_guidances",
    "sample_blockwise_euler_cfg_independent_guidances",
    "quantize_dit_params",
    "sample_euler_cfg_independent_guidances", "sample_pipeline",
    "sample_pipeline_chunked", "tiny_dac_config", "tiny_dit_config",
]
