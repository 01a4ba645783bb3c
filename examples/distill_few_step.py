"""Few-step distillation, end to end: teacher checkpoint -> latent shards
-> quant-aware distilled student -> orbax checkpoint -> serving smoke.

THE recipe for the ~100x deployment (docs/PERFORMANCE.md closing
section): distill the 40-step dual-CFG teacher into an 8-step CFG-free
student (5x fewer steps x no 3-row CFG batch), trained quant-aware so it
serves under ECHO_DIT_QUANT=int8 with no training/serving mismatch.
NON-PARITY and opt-in throughout: nothing here changes the reference-
parity defaults (train/distill.py docstring).

With real weights (once network egress / a converted checkpoint exists):

    python examples/distill_few_step.py \
        --model-dir /path/to/converted_ckpt \
        --data /path/to/corpus \
        --out distilled/ --steps 4000 --student-steps 8 --batch-size 8

  * --model-dir: converted reference checkpoint (tools/convert.py) or an
    orbax bundle — anything serve/models.py loads.
  * --data: directory of audio files; transcript = sibling .txt with the
    same stem (LJSpeech-style pairs), else the filename stem.
  * The distilled checkpoint lands at <out>/checkpoint; serve it with
    ECHO_MODEL_DIR=<out>/checkpoint and per-request parameters
    few_step_sampler_params(8) (see serve_checkpoint_smoke).

Without real weights this runs the SAME pipeline on a random tiny
teacher + synthetic audio (--tiny, the default when no --model-dir is
given) — which is exactly what tests/test_few_step_e2e.py gates in CI.

The report (<out>/distill_report.json) records the loss curve, the
eval-MSE curve (student N-step sampling vs teacher CFG sampling on
held-out prompts, fixed noise — must descend), and the serving smoke.
"""
from __future__ import annotations

import argparse
import json
import logging
import os


def iter_corpus(data_dir: str, voices_exts=(".wav",)):
    """(waveform, transcript) pairs from a directory of audio (+ optional
    sibling .txt transcripts)."""
    from echo_tts_tpu.pipeline import audio_io

    for name in sorted(os.listdir(data_dir)):
        if not name.lower().endswith(voices_exts):
            continue
        path = os.path.join(data_dir, name)
        stem = os.path.splitext(path)[0]
        txt = stem + ".txt"
        if os.path.isfile(txt):
            with open(txt) as f:
                text = f.read().strip()
        else:
            text = os.path.basename(stem).replace("_", " ")
        yield audio_io.load_audio(path), text


def synthetic_corpus(models, n=16, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    spl = models.dac_cfg.frame_length
    texts = ["A synthetic training utterance.",
             "Distilled students serve fast.",
             "Guidance folds into the weights.",
             "Few steps, same trajectory."]
    for i in range(n):
        n_latents = int(rng.integers(24, 40))
        audio = (rng.standard_normal((1, n_latents * spl))
                 .astype(np.float32) * 0.1)
        yield audio, texts[i % len(texts)]


def main() -> None:
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model-dir", help="teacher checkpoint dir "
                        "(converted safetensors or orbax bundle); omit "
                        "for the tiny synthetic pipeline")
    parser.add_argument("--data", help="corpus dir (audio + .txt pairs)")
    parser.add_argument("--out", default="distilled")
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--student-steps", type=int, default=8)
    parser.add_argument("--substeps", type=int, default=5)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=5e-5)
    parser.add_argument("--no-quant-aware", action="store_true",
                        help="train WITHOUT int8 fake-quant (students "
                        "then serve bf16 only)")
    parser.add_argument("--no-ema", action="store_true")
    parser.add_argument("--seq", type=int, default=640,
                        help="training window in latents")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax.numpy as jnp

    from echo_tts_tpu.train.data import DataConfig
    from echo_tts_tpu.train.recipe import distill_few_step

    if args.model_dir:
        from echo_tts_tpu.serve.models import _load_from_dir
        models = _load_from_dir(args.model_dir, jnp.bfloat16)
        data = iter_corpus(args.data)
        data_cfg = DataConfig(sequence_length=args.seq)
        dtype = jnp.bfloat16
    else:
        print("no --model-dir: running the tiny synthetic pipeline "
              "(same chain as tests/test_few_step_e2e.py)")
        import jax

        from echo_tts_tpu.config import tiny_dac_config, tiny_dit_config
        from echo_tts_tpu.models.dac.init import (init_dac_params,
                                                  init_pca_params)
        from echo_tts_tpu.models.dit import init_dit_params
        from echo_tts_tpu.pipeline.pipeline import EchoModels

        dit_cfg, dac_cfg = tiny_dit_config(), tiny_dac_config()
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        models = EchoModels(
            dit_params=init_dit_params(k1, dit_cfg, dtype=jnp.float32),
            dit_cfg=dit_cfg,
            dac_params=init_dac_params(k2, dac_cfg, dtype=jnp.float32),
            dac_cfg=dac_cfg,
            pca=init_pca_params(k3, dit_cfg.latent_size,
                                dac_cfg.latent_dim),
            dtype=jnp.float32)
        data = synthetic_corpus(models)
        data_cfg = DataConfig(sequence_length=16, text_length=16,
                              speaker_length=8, min_latents=8)
        args.steps = min(args.steps, 48)
        args.student_steps = min(args.student_steps, 4)
        args.substeps = min(args.substeps, 2)
        args.batch_size = min(args.batch_size, 4)
        args.lr = max(args.lr, 1e-3)
        dtype = jnp.float32

    report = distill_few_step(
        models, data, args.out,
        num_steps=args.steps, num_student_steps=args.student_steps,
        substeps=args.substeps, batch_size=args.batch_size,
        data_cfg=data_cfg, lr=args.lr,
        quant_aware=not args.no_quant_aware,
        ema_decay=None if args.no_ema else 0.999,
        dtype=dtype)
    print(json.dumps({k: report[k] for k in
                      ("eval_mse_initial", "eval_mse_final", "improved",
                       "loss_first", "loss_last", "checkpoint",
                       "wall_seconds", "serve_smoke")}, indent=2))


if __name__ == "__main__":
    main()
