"""Opt-in on-chip long-stream soak gate (VERDICT r4 item 7).

Runs examples/soak_long_stream.py — the maximum serving schedule
(16 x 320 latents = 5120, ~4 min of audio) through the production
streaming path — in a subprocess with the conftest's CPU pin stripped,
gating on flat per-block latency, zero HBM growth, and finite audio.

  ECHO_SOAK_ONCHIP=1 python -m pytest tests/test_soak_long_stream.py -s

The tiny-config smoke of the same script runs unconditionally on CPU so
the gate logic itself stays exercised by the suite.
"""
import json
import os
import subprocess
import sys

import pytest

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_script = os.path.join(_repo, "examples", "soak_long_stream.py")


def test_soak_gate_logic_tiny_cpu():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"  # the script mirrors this into jax.config
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(_repo,
                                                    ".jax_cache_cpu")
    proc = subprocess.run(
        [sys.executable, _script, "--tiny", "--blocks", "8"],
        env=env, cwd=_repo, capture_output=True, text=True,
        timeout=900)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout)
    assert report["ok"], report["failures"]
    assert len(report["blocks"]) == 8
    assert "tail_over_mid_ratio" in report


@pytest.mark.skipif(
    os.environ.get("ECHO_SOAK_ONCHIP") != "1",
    reason="opt-in (set ECHO_SOAK_ONCHIP=1): full-size 5120-latent stream "
           "on the real chip, ~10+ min cold")
def test_soak_long_stream_onchip():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(_repo, ".jax_cache")
    proc = subprocess.run(
        [sys.executable, _script], env=env, cwd=_repo,
        capture_output=True, text=True, timeout=3600)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    report = json.loads(proc.stdout)
    assert report["ok"], report["failures"]
    assert report["total_latents"] == 5120
