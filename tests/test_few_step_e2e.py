"""The WHOLE few-step pipeline at tiny scale (train/recipe.py — VERDICT
r4 item 1): synthetic audio -> latent shards -> quant-aware distillation
-> eval MSE provably descends toward the teacher's CFG sampling ->
orbax checkpoint -> loaded THROUGH serve/models.py -> served with
few_step_sampler_params(N) (bf16 and int8) -> finite audio out.

This is the chain that, run with real teacher weights + data, produces
the ~100x few8+int8 deployment; the test pins that every stage composes
(no training/serving mismatch), not audio quality (random tiny teacher).
"""
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from echo_tts_tpu.parallel import mesh as pmesh
from echo_tts_tpu.train.data import DataConfig
from echo_tts_tpu.train.recipe import distill_few_step, serve_checkpoint_smoke


def _synthetic_corpus(models, n=16, seed=0):
    """Random-audio (waveform, transcript) pairs — enough latents per
    utterance for a disjoint speaker clip + target window."""
    rng = np.random.default_rng(seed)
    spl = models.dac_cfg.frame_length
    texts = [
        "The quick brown fox jumps.", "Over the lazy dog again.",
        "A synthetic training utterance.", "Speech latents from noise.",
        "Every stage must compose.", "Distilled students serve fast.",
        "Guidance folds into weights.", "Few steps, same trajectory.",
    ]
    items = []
    for i in range(n):
        n_latents = int(rng.integers(24, 40))
        audio = rng.standard_normal((1, n_latents * spl)).astype(np.float32)
        audio *= 0.1
        items.append((audio, texts[i % len(texts)]))
    return items


@pytest.fixture(scope="module")
def report_and_dir(tiny_models, tmp_path_factory):
    out = tmp_path_factory.mktemp("few_step")
    data_cfg = DataConfig(sequence_length=16, text_length=16,
                          speaker_length=8, min_latents=8)
    report = distill_few_step(
        tiny_models, _synthetic_corpus(tiny_models), str(out),
        num_steps=24, num_student_steps=4, substeps=2, batch_size=4,
        data_cfg=data_cfg,
        eval_texts=("Held out evaluation prompt.",
                    "Second held out prompt."),
        eval_every=8,
        teacher_sampler_params={"num_steps": 8},
        quant_aware=True, lr=1e-3,
        ema_decay=None,      # short run: serve the live params
        dtype=jnp.float32,   # CPU: measure the gap, not bf16 rounding
        mesh=pmesh.make_mesh(dp=4, tp=2),
        serve_smoke=False,   # smoke runs are separate tests below
        seed=0)
    return report, str(out)


def test_distillation_closes_the_gap(report_and_dir):
    report, _ = report_and_dir
    assert np.isfinite(report["loss_last"])
    assert report["loss_last"] < report["loss_first"]
    # the end-to-end measure: student N-step sampling approaches the
    # teacher's CFG sampling on held-out prompts with fixed noise
    assert report["eval_mse_final"] < report["eval_mse_initial"], report[
        "eval_mse_curve"]
    assert report["improved"]
    # the curve is recorded for the report artifact
    assert report["eval_mse_curve"][0][0] == 0
    assert report["eval_mse_curve"][-1][0] == report["num_steps"]


def test_report_written_to_disk(report_and_dir):
    report, out = report_and_dir
    with open(os.path.join(out, "distill_report.json")) as f:
        on_disk = json.load(f)
    assert on_disk["eval_mse_final"] == report["eval_mse_final"]
    assert os.path.isdir(report["checkpoint"])


def test_student_serves_through_production_path(report_and_dir):
    """orbax checkpoint -> serve/models.py -> handler synthesis with
    few-step params -> finite audio (bf16-parity-mode serving)."""
    report, _ = report_and_dir
    smoke = serve_checkpoint_smoke(
        report["checkpoint"], num_student_steps=4, sequence_length=16,
        dtype=jnp.float32, int8=False)
    assert smoke["ok"], smoke
    assert smoke["quant_reported"] == "none"


def test_student_serves_int8(report_and_dir):
    """The quant-aware student serves under ECHO_DIT_QUANT=int8 — the
    stacked few-step+int8 deployment, end to end."""
    report, _ = report_and_dir
    smoke = serve_checkpoint_smoke(
        report["checkpoint"], num_student_steps=4, sequence_length=16,
        dtype=jnp.float32, int8=True)
    assert smoke["ok"], smoke
    assert smoke["quant_reported"] == "int8"
