"""Tracing / profiling hooks.

The reference has wall-clock phase timers only (handler.py:342-409,
gradio_app.py:203,284-285).  The TPU framework adds:

  * StageTimer — nested per-stage wall timing (prefill / denoise / decode /
    host-DSP) with a structured report, the RTF bookkeeping the north-star
    metric needs;
  * trace() — a context manager around jax.profiler for device traces
    viewable in Perfetto/TensorBoard.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StageTimer:
    """Accumulating wall-clock stage timer.

    with timer.stage("denoise"):
        ...
    timer.report() -> {"denoise": {"seconds": ..., "calls": ...}, ...}
    """

    def __init__(self) -> None:
        self._acc: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc.setdefault(name, []).append(
                time.perf_counter() - t0)

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"seconds": round(sum(v), 4), "calls": len(v)}
            for name, v in self._acc.items()
        }

    def total(self) -> float:
        return sum(sum(v) for v in self._acc.values())

    def rtf(self, audio_seconds: float) -> float:
        """Audio-seconds per wall-second over everything timed so far."""
        t = self.total()
        return audio_seconds / t if t > 0 else float("inf")


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/echo_tts_trace"):
    """Capture a device trace (view with TensorBoard or Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
