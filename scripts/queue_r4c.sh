#!/bin/bash
# Round-4 third queue: after the 256px headline rows, (a) the attacked
# kl=64 identification points (resume-safe) and (b) the two unmeasured
# 256px scaling cells from the declared grid (256/256/10k, 256/512/10k).
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

echo "=== identification (attacked kl64 rows)"
timeout 7000 python -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study identification \
  2>&1 | tail -10

echo "=== scaling (256px cells)"
timeout 28000 python -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study scaling \
  --only 256px 2>&1 | tail -10

echo "=== queue_r4c done"
