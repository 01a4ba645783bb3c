#!/usr/bin/env bash
# Worker bootstrap (reference: bootstrap.sh:1-43): log tee, warmup, exec.
set -euo pipefail

LOG_DIR="${LOG_DIR:-/tmp/echo_tts_logs}"
mkdir -p "$LOG_DIR"
exec > >(tee -a "$LOG_DIR/bootstrap.log") 2>&1

echo "[bootstrap] $(date -u +%FT%TZ) starting echo-tts-tpu worker"
python - <<'PY'
import jax
print("[bootstrap] devices:", jax.devices())
PY

# Pre-load models + compile every default request shape (batch no-voice,
# speaker-bucket-640, and the default streaming schedule in both speaker
# shapes) before taking traffic; with JAX_COMPILATION_CACHE_DIR on the
# volume only the first-ever boot pays the compiles.
# (reference: handler.py --warmup, :822-849)
python -m echo_tts_tpu.serve.handler --warmup-compile || \
    echo "[bootstrap] warmup failed; starting anyway"

exec python -m echo_tts_tpu.serve.handler
