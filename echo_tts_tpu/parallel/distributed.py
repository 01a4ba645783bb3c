"""Multi-host (DCN) scale-out skeleton.

The reference scales by share-nothing RunPod workers (reference:
README.md:165+, handler.py worker model) — no cross-worker communication.
On TPU pods the equivalent is one jax process per host joined through
`jax.distributed`, with a global mesh whose DATA axis spans hosts (requests
are independent, so cross-host traffic stays on DCN-friendly all-reduce-free
data parallelism) and whose MODEL axis stays inside each host's ICI island
(parallel/mesh.py tensor-parallel specs never cross hosts).

Launch recipe (two hosts shown; same binary everywhere):

  # host 0 (also the coordinator)
  ECHO_COORD=10.0.0.1:8476 ECHO_NUM_PROCS=2 ECHO_PROC_ID=0 \
      python -m echo_tts_tpu.serve.handler --warmup-compile
  # host 1
  ECHO_COORD=10.0.0.1:8476 ECHO_NUM_PROCS=2 ECHO_PROC_ID=1 \
      python -m echo_tts_tpu.serve.handler --warmup-compile

`initialize_from_env()` is a no-op when ECHO_COORD is unset, so single-host
deployments (the default stance, like the reference's) are unaffected.

Tested CPU-simulated (two local processes, virtual devices) in
tests/test_distributed.py.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from . import mesh as pmesh


def initialize_from_env() -> bool:
    """Join the jax.distributed cluster described by ECHO_COORD /
    ECHO_NUM_PROCS / ECHO_PROC_ID.  Returns True if distributed mode was
    initialized, False for single-host (env unset)."""
    coord = os.environ.get("ECHO_COORD")
    if not coord:
        return False
    num = int(os.environ["ECHO_NUM_PROCS"])
    pid = int(os.environ["ECHO_PROC_ID"])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=num, process_id=pid)
    return True


def global_mesh(tp: Optional[int] = None):
    """Global (data, model) mesh over ALL processes' devices.

    The model axis must divide the per-host device count so TP collectives
    ride ICI, never DCN; the data axis spans hosts.  tp defaults to 1
    (pure cross-host data parallelism — the serving shape)."""
    tp = tp or 1
    local = jax.local_device_count()
    if tp > local or local % tp != 0:
        raise ValueError(
            f"tp={tp} must divide the per-host device count {local}: the "
            "model axis must stay inside one host's ICI island")
    n = jax.device_count()
    return pmesh.make_mesh(jax.devices(), dp=n // tp, tp=tp)


def process_local_batch_slice(global_batch: int) -> slice:
    """Which rows of a [global_batch, ...] request batch this process
    feeds: contiguous per-process slices (jax.make_array_from_process_
    local_data convention)."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} must divide across {n} processes")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
