"""Interactive demo — the functional core of the reference Gradio app.

Re-implements the full parameter surface of generate_audio
(reference: gradio_app.py:158-319) as a UI-framework-independent session
object: sampler presets (serve/sampler_presets.json), CFG presets,
truncation/rescale presets, force-speaker (speaker-KV) controls, static
shape buckets, AE-reconstruction debug output and session-scoped temp-file
cleanup (gradio_app.py:78-107).  `launch_gradio()` wraps it in a Blocks UI
when gradio is installed (wiring smoke-tested against a stub in
tests/test_demo_gradio.py); examples/generate.py is the CLI entry point.
"""
from __future__ import annotations

import dataclasses
import os
import shutil
import time
import uuid
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import SAMPLER_DEFAULTS
from ..pipeline import audio_io
from ..pipeline.pipeline import (EchoModels, ae_reconstruct,
                                 sample_pipeline)
from ..pipeline.text import find_min_bucket_gte
from ..sampler.euler import sample_euler_cfg_independent_guidances

# reference: gradio_app.py:372-389
CFG_PRESETS: Dict[str, Tuple[float, float, float, float]] = {
    "higher speaker": (3.0, 8.0, 0.5, 1.0),
    "large guidances": (8.0, 8.0, 0.5, 1.0),
}

# reference: gradio_app.py:409-428 (truncation, rescale_k, rescale_sigma)
TRUNCATION_PRESETS: Dict[str, Tuple[float, float, float]] = {
    "flat": (0.8, 1.2, 3.0),
    "sharp": (0.9, 0.96, 3.0),
    "baseline(sharp)": (1.0, 1.0, 3.0),
}

# single source of truth for the static-shape buckets: serve/presets.py
from ..serve.presets import SPEAKER_BUCKETS as DEFAULT_SPEAKER_BUCKETS
from ..serve.presets import TEXT_BUCKETS as DEFAULT_TEXT_BUCKETS

DEFAULT_SAMPLE_LATENT_LENGTH = 640


@dataclasses.dataclass
class GenerationResult:
    audio_path: str
    normalized_text: str
    generation_seconds: float
    reconstruction_path: Optional[str] = None
    original_path: Optional[str] = None


class DemoSession:
    """One user session: models + temp dir + cleanup, mirroring the
    session-scoped behavior of the reference app."""

    def __init__(self, models: EchoModels, temp_dir: str = "/tmp/echo_demo",
                 session_id: Optional[str] = None):
        self.models = models
        self.session_id = session_id or uuid.uuid4().hex[:8]
        self.temp_dir = os.path.join(temp_dir, self.session_id)
        os.makedirs(self.temp_dir, exist_ok=True)

    def cleanup(self) -> None:
        """Session temp cleanup (reference: gradio_app.py:78-96)."""
        shutil.rmtree(self.temp_dir, ignore_errors=True)
        os.makedirs(self.temp_dir, exist_ok=True)

    def _save(self, stem: str, audio: np.ndarray) -> str:
        path = os.path.join(self.temp_dir,
                            f"{stem}_{uuid.uuid4().hex[:6]}.wav")
        audio_io.write_wav(path, audio, 44100)
        return path

    def generate_audio(
        self,
        text_prompt: str,
        speaker_audio_path: Optional[str] = None,
        num_steps: int = 40,
        rng_seed: int = 0,
        cfg_scale_text: float = 3.0,
        cfg_scale_speaker: float = 8.0,
        cfg_min_t: float = 0.5,
        cfg_max_t: float = 1.0,
        truncation_factor: float = 1.0,
        rescale_k: float = 1.0,
        rescale_sigma: float = 3.0,
        force_speaker: bool = False,
        speaker_kv_scale: float = 1.5,
        speaker_kv_min_t: float = 0.9,
        speaker_kv_max_layers: int = 24,
        reconstruct_reference: bool = False,
        use_custom_shapes: bool = True,
        max_text_byte_length: str = DEFAULT_TEXT_BUCKETS,
        max_speaker_latent_length: str = DEFAULT_SPEAKER_BUCKETS,
        sample_latent_length: int = DEFAULT_SAMPLE_LATENT_LENGTH,
        show_original_audio: bool = False,
    ) -> GenerationResult:
        """Mirror of the reference generate_audio parameter coercion
        (gradio_app.py:205-277)."""
        t0 = time.time()
        models = self.models
        spl = models.dac_cfg.frame_length

        num_steps = min(max(int(num_steps), 1), 80)  # gradio_app.py:204
        rescale_k_val = float(rescale_k) if rescale_k != 1.0 else None

        kv_scale = kv_min_t = kv_max_layers = None
        if force_speaker:  # gradio_app.py:215-223
            kv_scale = float(speaker_kv_scale)
            kv_min_t = float(speaker_kv_min_t)
            kv_max_layers = int(speaker_kv_max_layers)

        speaker_audio = None
        if speaker_audio_path:
            speaker_audio = audio_io.load_audio(speaker_audio_path)

        if use_custom_shapes:  # gradio_app.py:229-247
            actual_text = len(text_prompt.encode("utf-8")) + 1  # BOS
            pad_text = find_min_bucket_gte(max_text_byte_length, actual_text)
            if speaker_audio is not None:
                ps = models.dit_cfg.speaker_patch_size
                actual_spk = (speaker_audio.shape[-1] // spl) // ps * ps
            else:
                actual_spk = 0
            pad_spk = find_min_bucket_gte(max_speaker_latent_length,
                                          actual_spk)
        else:
            pad_text = pad_spk = None

        def sample_fn(m, sl, sm, ti, tm, seed):
            import jax
            return sample_euler_cfg_independent_guidances(
                m.dit_params, m.dit_cfg, sl, sm, ti, tm,
                num_steps=num_steps,
                cfg_scale_text=float(cfg_scale_text),
                cfg_scale_speaker=float(cfg_scale_speaker),
                cfg_min_t=float(cfg_min_t), cfg_max_t=float(cfg_max_t),
                truncation_factor=float(truncation_factor),
                rescale_k=rescale_k_val,
                rescale_sigma=float(rescale_sigma),
                speaker_kv_scale=kv_scale, speaker_kv_min_t=kv_min_t,
                speaker_kv_max_layers=kv_max_layers,
                sequence_length=int(sample_latent_length),
                dtype=m.dtype, rng_key=jax.random.PRNGKey(seed))

        audio_out, normalized = sample_pipeline(
            models, sample_fn, text_prompt, speaker_audio,
            rng_seed=int(rng_seed),
            pad_to_max_text_length=pad_text,
            pad_to_max_speaker_latent_length=pad_spk)

        result = GenerationResult(
            audio_path=self._save("generated", audio_out),
            normalized_text=normalized,
            generation_seconds=time.time() - t0)

        if reconstruct_reference and speaker_audio is not None:
            # Debug-by-listening round trip (gradio_app.py:291-302)
            import jax.numpy as jnp
            n = spl * 640
            clip = speaker_audio[..., :n]
            clip = np.pad(clip, ((0, 0), (0, max(0, n - clip.shape[-1]))))
            recon = np.asarray(ae_reconstruct(models, jnp.asarray(clip)))
            recon = recon[..., : speaker_audio.shape[-1]]
            result.reconstruction_path = self._save("speaker_recon", recon)

        if show_original_audio and speaker_audio is not None:
            result.original_path = self._save("original_audio",
                                              speaker_audio)
        return result


def launch_gradio(models: EchoModels, **launch_kwargs):  # pragma: no cover
    """Optional Gradio Blocks wrapper (reference: gradio_app.py:430-994)."""
    import gradio as gr

    session = DemoSession(models)

    def run(text, speaker, steps, seed, cfg_t, cfg_s, min_t, max_t,
            trunc, rk, rs, force, kvs, kvmt, kvml, recon):
        r = session.generate_audio(
            text, speaker, steps, seed, cfg_t, cfg_s, min_t, max_t,
            trunc, rk, rs, force, kvs, kvmt, kvml, recon)
        return (r.audio_path, r.normalized_text,
                f"{r.generation_seconds:.2f}s", r.reconstruction_path)

    with gr.Blocks(title="Echo-TTS (TPU)") as demo:
        text = gr.Textbox(label="Text", lines=4)
        speaker = gr.Audio(label="Speaker reference", type="filepath")
        steps = gr.Slider(1, 80, SAMPLER_DEFAULTS["num_steps"], step=1,
                          label="Steps")
        seed = gr.Number(0, label="Seed", precision=0)
        cfg_t = gr.Slider(0, 12, 3.0, label="CFG text")
        cfg_s = gr.Slider(0, 12, 8.0, label="CFG speaker")
        min_t = gr.Slider(0, 1, 0.5, label="CFG min t")
        max_t = gr.Slider(0, 1, 1.0, label="CFG max t")
        trunc = gr.Slider(0.5, 1.0, 1.0, label="Truncation")
        rk = gr.Slider(0.5, 2.0, 1.0, label="Rescale k")
        rs = gr.Slider(0.5, 6.0, 3.0, label="Rescale sigma")
        force = gr.Checkbox(False, label="Force speaker")
        kvs = gr.Slider(1.0, 3.0, 1.5, label="Speaker KV scale")
        kvmt = gr.Slider(0, 1, 0.9, label="Speaker KV min t")
        kvml = gr.Slider(1, 24, 24, step=1, label="Speaker KV max layers")
        recon = gr.Checkbox(False, label="AE-reconstruct reference")
        btn = gr.Button("Generate")
        audio = gr.Audio(label="Output")
        norm = gr.Markdown()
        took = gr.Markdown()
        recon_audio = gr.Audio(label="Reference reconstruction")
        btn.click(run, [text, speaker, steps, seed, cfg_t, cfg_s, min_t,
                        max_t, trunc, rk, rs, force, kvs, kvmt, kvml,
                        recon],
                  [audio, norm, took, recon_audio])
    return demo.launch(**launch_kwargs)
