#!/bin/bash
# Crash-resilient quality-study runner.  The axon TPU worker occasionally
# hard-crashes mid-run ("TPU worker process crashed or restarted"); every
# study point is jsonl-checkpointed, so simply re-running resumes after
# the last finished point.  Retries each stage until it exits 0 or makes
# no forward progress across an attempt.
set -u
cd "$(dirname "$0")/.."

progress() { cat result/study_*.json.jsonl 2>/dev/null | wc -l; }

for stage in "$@"; do
  for attempt in $(seq 1 8); do
    before=$(progress)
    echo "=== stage $stage attempt $attempt (points done: $before)"
    make "$stage" && break
    after=$(progress)
    if [ "$after" -le "$before" ] && [ "$attempt" -ge 2 ]; then
      echo "=== stage $stage: no progress on retry, giving up"
      exit 1
    fi
    sleep 10
  done
done
echo "=== all stages done"
