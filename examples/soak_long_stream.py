"""Long-stream soak gate: the maximum serving schedule, end to end.

Runs ONE stream of 16 x 320-latent blocks = 5120 latents (~3 min 58 s of
audio — the top STREAM_TOTAL_BUCKET, the largest schedule serving
accepts) through the production path (serve/streaming.stream_synthesize:
blockwise sampler with incremental latent-prefix KV engaged past the
measured 2560 crossover, incremental codec decode, pipelined drain), and
GATES on:

  * flat per-block latency: median of the last 4 blocks <= 1.5x the
    median of blocks 2-5 (block 1 excluded: the latent-free first-block
    program is a different, cheaper shape) — a super-linear prefix cost
    (the O(total^2) failure mode the incremental KV exists to prevent)
    fails here;
  * no HBM growth: device bytes_in_use after the stream within 256 MB of
    the post-warmup baseline (a leaking per-block buffer fails here);
  * final audio finite and exactly 5120 * 2048 samples.

Exits nonzero on any gate failure; prints the per-block table as JSON
(recorded in docs/PERFORMANCE.md).  Matches the reference's blockwise
sampler (inference_blockwise.py:67-121) at its scaling limit — the
reference itself re-encodes the full prefix every block and has no gate
like this.

Run on the chip (~several minutes warm):
    python examples/soak_long_stream.py
Smaller smoke (any backend):
    python examples/soak_long_stream.py --blocks 4
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
# The session sitecustomize forces jax_platforms=axon; the env var alone
# is ignored (CLAUDE.md) — mirror it so the tiny smoke can run on CPU.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

BLOCK = 320
TEXT = ("A very long narration that keeps going for minutes on end, "
        "sentence after sentence, so the stream reaches its maximum "
        "accepted schedule without repeating itself too obviously. ") * 6


def _mem_bytes():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("bytes_in_use", 0)) if stats else None
    except Exception:
        return None


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--blocks", type=int, default=16,
                        help="number of 320-latent blocks (16 = the max "
                        "serving schedule, 5120 latents)")
    parser.add_argument("--tiny", action="store_true",
                        help="tiny config smoke (CPU-friendly)")
    args = parser.parse_args()

    import dataclasses

    from echo_tts_tpu.config import SAMPLER_DEFAULTS
    from echo_tts_tpu.pipeline.pipeline import EchoModels
    from echo_tts_tpu.serve.streaming import stream_synthesize

    if args.tiny:
        from echo_tts_tpu.config import tiny_dac_config, tiny_dit_config
        cfg = tiny_dit_config()
        dac_cfg = tiny_dac_config()
        dtype = jnp.float32
        block = 8
    else:
        from echo_tts_tpu.config import base_dac_config, base_dit_config
        cfg = base_dit_config(blockwise=True)
        dac_cfg = dataclasses.replace(base_dac_config(), snake_approx=True)
        dtype = jnp.bfloat16
        block = BLOCK

    from echo_tts_tpu.models.dac.init import init_dac_params, init_pca_params
    from echo_tts_tpu.models.dit import init_dit_params
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    models = EchoModels(
        init_dit_params(k1, cfg, dtype=dtype), cfg,
        init_dac_params(k2, dac_cfg, dtype=dtype), dac_cfg,
        init_pca_params(k3, cfg.latent_size, dac_cfg.latent_dim),
        dtype=dtype)

    schedule = [block] * args.blocks
    total = sum(schedule)
    p = dict(SAMPLER_DEFAULTS)
    p.pop("sequence_length")
    if args.tiny:
        p["num_steps"] = 2

    rng = np.random.default_rng(3)
    spk_len = 640 if not args.tiny else cfg.speaker_patch_size * 2
    spk_lat = (0.1 * rng.standard_normal(
        (1, spk_len, cfg.latent_size))).astype(np.float32)
    spk_mask = np.ones((1, spk_len), bool)

    def run_stream(collect):
        t0 = time.perf_counter()
        last = t0
        pieces = []
        for chunk in stream_synthesize(
                models, TEXT, speaker_latent=spk_lat, speaker_mask=spk_mask,
                chunk_sizes=schedule, seed=0, sampler_params=p):
            now = time.perf_counter()
            if collect is not None:
                collect.append({
                    "block": chunk.index,
                    "latents": int(chunk.latent_end - chunk.latent_start),
                    "block_ms": round(1e3 * (now - last), 1),
                    "elapsed_s": round(now - t0, 2),
                    "hbm_bytes": _mem_bytes(),
                })
            last = now
            pieces.append(chunk.audio)
        return np.concatenate(pieces, axis=-1), time.perf_counter() - t0

    # Warm pass: compiles every program the schedule reaches (first-block
    # core, later-block cores, incremental appends, decode blocks).
    t_warm = time.time()
    audio, _ = run_stream(None)
    warm_s = time.time() - t_warm
    mem_baseline = _mem_bytes()

    table = []
    audio, wall_s = run_stream(table)
    mem_after = _mem_bytes()

    audio_s = total * dac_cfg.frame_length / dac_cfg.sample_rate
    report = {
        "schedule": f"{args.blocks} x {block}",
        "total_latents": total,
        "audio_seconds": round(audio_s, 1),
        "wall_seconds": round(wall_s, 2),
        "streamed_rtf": round(audio_s / wall_s, 2),
        "warm_pass_seconds": round(warm_s, 1),
        "hbm_baseline_mb": (None if mem_baseline is None
                            else round(mem_baseline / 2**20)),
        "hbm_after_mb": (None if mem_after is None
                         else round(mem_after / 2**20)),
        "blocks": table,
    }

    failures = []
    # gate 1: flat per-block latency (exclude block 0: different program)
    if args.blocks >= 8:
        mid = [b["block_ms"] for b in table[1:5]]
        tail = [b["block_ms"] for b in table[-4:]]
        ratio = float(np.median(tail)) / float(np.median(mid))
        report["tail_over_mid_ratio"] = round(ratio, 3)
        if ratio > 1.5:
            failures.append(
                f"per-block latency grows: tail/mid = {ratio:.2f} > 1.5")
    # gate 2: no HBM growth across the stream
    if mem_baseline is not None and mem_after is not None:
        growth = mem_after - mem_baseline
        report["hbm_growth_mb"] = round(growth / 2**20, 1)
        if growth > 256 * 2**20:
            failures.append(
                f"HBM grew {growth / 2**20:.0f} MB across the stream")
    # gate 3: audio sane
    if not np.isfinite(audio).all():
        failures.append("non-finite samples in final audio")
    expect = total * dac_cfg.frame_length
    if audio.shape[-1] != expect:
        failures.append(
            f"audio length {audio.shape[-1]} != {expect}")

    report["failures"] = failures
    report["ok"] = not failures
    print(json.dumps(report, indent=2))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
