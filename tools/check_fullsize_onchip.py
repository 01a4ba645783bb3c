"""Full-DEPTH full-width on-chip forward cross-check (VERDICT r3 item 6).

tests/test_fullsize_confidence.py pins full WIDTH (2048-dim cast points)
at 2 layers, fp32, on CPU; nothing pins 24-layer full-size numerics on the
real chip.  This script closes that depth x hardware corner:

  1. builds the torch reference DiT at the PUBLISHED full config
     (24/14/14 layers, 2048/1280 widths; reference: model.py:563-604,
     inference.py:14-27) with seeded random weights, and computes one
     CFG-batched velocity prediction on CPU at fp32 — the oracle;
  2. converts the SAME weights through the production converter
     (tools/convert.py) to bf16, runs the same prediction on the TPU
     (bf16 compute, fp32 islands + fp32 output, the serving
     configuration), and
  3. asserts the documented bf16 error envelope (see ENVELOPE below).

The envelope was calibrated on-chip (2026-08-17, random weights seed 5,
TPU v5 lite): max abs error 2.67e-2 against outputs with std 0.573,
rel-RMS 1.05e-2 — consistent with bf16's ~4e-3/op resolution accumulated
over 24 residual layers with fp32 norm islands.  The gate leaves ~5x
headroom; a cast-point regression (e.g. a norm computed in bf16) moves
rel-RMS by >10x and trips it immediately.

Run (opt-in; ~9.5 min cold — ~1 min torch fp32 oracle on one core, the
rest tunnel-side XLA compile — cached reruns much faster):
  python tools/check_fullsize_onchip.py
or via pytest:  ECHO_FULLSIZE_ONCHIP=1 pytest tests/test_fullsize_onchip.py
"""
from __future__ import annotations

import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)
sys.path.insert(0, os.path.join(_repo, "tests"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_repo, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

# Documented bf16 envelope (see module docstring).
ENVELOPE_REL_RMS = 0.05
ENVELOPE_MAX_ABS = 0.30


def main():
    import torch

    from echo_tts_tpu.config import base_dit_config
    from echo_tts_tpu.models import dit
    from torch_ref import build_torch_dit, jax_params_from_torch, rand

    cfg = base_dit_config(blockwise=False)
    t0 = time.time()
    print(f"# building torch reference at full size "
          f"({cfg.num_layers}/{cfg.text_num_layers}/"
          f"{cfg.speaker_num_layers} layers) ...", file=sys.stderr)
    tmodel = build_torch_dit(cfg, seed=5)

    rng = np.random.default_rng(23)
    b, g, s, tt, ts = 1, 3, 64, 48, 16
    x = rand(rng, g * b, s, cfg.latent_size)
    t = rng.uniform(0.1, 0.9, size=(g * b,)).astype(np.float32)
    ids = rng.integers(0, 256, size=(b, tt))
    tmask_b = np.ones((b, tt), bool)
    spk = rand(rng, b, ts, cfg.latent_size)
    smask_b = np.ones((b, ts), bool)
    tmask = np.concatenate([tmask_b, ~tmask_b, tmask_b], axis=0)
    smask = np.concatenate([smask_b, smask_b, ~smask_b], axis=0)

    print(f"# torch fp32 oracle forward ({time.time() - t0:.0f}s so far)",
          file=sys.stderr)
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

    print(f"# converting weights to bf16 ({time.time() - t0:.0f}s so far)",
          file=sys.stderr)
    params = jax_params_from_torch(tmodel, cfg, dtype=jnp.bfloat16)
    del tmodel, kv_text, kv_spk, kv_text3, kv_spk3

    dev = jax.devices()[0]
    print(f"# running on {dev.platform}:{dev.device_kind} "
          f"({time.time() - t0:.0f}s so far)", file=sys.stderr)

    @jax.jit
    def forward(params, x, t, ids, tmask_b, spk, tmask, smask):
        kvt = dit.get_kv_cache_text(params, cfg, ids, tmask_b)
        kvs = dit.get_kv_cache_speaker(params, cfg,
                                       spk.astype(jnp.bfloat16))
        return dit.dit_forward(params, cfg, x.astype(jnp.bfloat16),
                               t.astype(jnp.bfloat16), tmask, smask,
                               kvt, kvs)

    got = np.asarray(forward(
        params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ids),
        jnp.asarray(tmask_b), jnp.asarray(spk), jnp.asarray(tmask),
        jnp.asarray(smask)))

    assert got.dtype == np.float32, got.dtype  # model.py:604 semantics
    err = got - ref
    out_std = float(np.std(ref))
    max_abs = float(np.max(np.abs(err)))
    rel_rms = float(np.sqrt(np.mean(err ** 2)) / np.std(ref))

    # int8 (W8A8) mode at full depth/width on the chip — informational
    # (non-parity mode; docs/PERFORMANCE.md §11).  Measured 2026-08-18
    # (seed 5, TPU v5 lite): rel-RMS vs bf16 4.99e-3, and vs the fp32
    # oracle 1.057e-2 — statistically identical to bf16's own 1.050e-2.
    # At the published width the per-channel int8 error (K=2048
    # averaging) sits BELOW bf16 rounding, so at full size the mode's
    # output error is dominated by bf16, not by quantization.
    from echo_tts_tpu.ops.quant import quantize_dit_params
    got_q = np.asarray(forward(
        quantize_dit_params(params), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(ids), jnp.asarray(tmask_b), jnp.asarray(spk),
        jnp.asarray(tmask), jnp.asarray(smask)))
    rel_rms_q_bf16 = float(np.sqrt(np.mean((got_q - got) ** 2))
                           / np.std(got))
    rel_rms_q_ref = float(np.sqrt(np.mean((got_q - ref) ** 2))
                          / np.std(ref))

    report = {"metric": "fullsize_onchip_forward",
              "platform": dev.platform,
              "out_std": round(out_std, 4),
              "max_abs_err": round(max_abs, 5),
              "rel_rms_err": round(rel_rms, 6),
              "envelope_rel_rms": ENVELOPE_REL_RMS,
              "envelope_max_abs": ENVELOPE_MAX_ABS,
              "int8_rel_rms_vs_bf16": round(rel_rms_q_bf16, 6),
              "int8_rel_rms_vs_fp32": round(rel_rms_q_ref, 6),
              "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(report))
    assert rel_rms < ENVELOPE_REL_RMS, report
    assert max_abs < ENVELOPE_MAX_ABS, report
    # int8 is informational but a blow-up means the quantized tree broke
    assert np.isfinite(got_q).all()
    assert rel_rms_q_bf16 < 0.15, report
    print("# PASS: 24-layer full-size bf16 forward on-chip is inside the "
          "documented envelope (int8 mode reported informationally)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
