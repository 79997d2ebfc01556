#!/bin/bash
# Round-4 follow-up queue: wait for the packed A/B benches, then the
# packed-1 roofline, then the 256px headline points (resume-safe: the
# jsonl skips the already-measured 64/128px rows).
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

out="result/bench_r4/gen_roofline_packed1.json"
if [ ! -s "$out" ]; then
  echo "=== bench gen_roofline_packed1"
  for attempt in 1 2 3; do
    timeout 3000 python bench.py --preset gen_roofline --packed_tail 1 \
      > "$out.tmp" 2> "result/bench_r4/gen_roofline_packed1.log" \
      && mv "$out.tmp" "$out" && break
    echo "=== attempt $attempt failed (rc=$?)"
    sleep 10
  done
fi

echo "=== headline (256px rows)"
timeout 14000 python -m attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.cli.study headline \
  2>&1 | tail -20
echo "=== queue_r4b done"
