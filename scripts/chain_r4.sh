#!/bin/bash
# Round-4 follow-up queue (single TPU holder end to end): waits for the
# primary study runner to exit, then
#   1. runs the queued bench presets (gen_roofline @1024, the
#      --polyphase_up 1024px A/B, serve) --- first, because the 1024px
#      optimization work is gated on the roofline decomposition;
#   2. archives the round-3 headline/robustness records and re-runs
#      those baselines on TODAY's retrained generators (the recipe is
#      seed-deterministic but TPU training is not bit-deterministic
#      across sessions --- A/B studies must share the model with their
#      baseline rows);
#   3. runs the round-4 studies (bestrecipe, model_attribution,
#      capacity with the full-budget column).
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

mkdir -p result/bench_r4
for spec in "gen_roofline:--preset gen_roofline" \
            "gen1024_default:--preset generate" \
            "gen1024_polyphase:--preset generate --polyphase_up" \
            "serve:--preset serve"; do
  name="${spec%%:*}"; flags="${spec#*:}"
  out="result/bench_r4/${name}.json"
  if [ ! -s "$out" ]; then
    echo "=== bench $name"
    for attempt in 1 2 3; do
      timeout 3000 python bench.py $flags > "$out.tmp" 2> "result/bench_r4/${name}.log" \
        && mv "$out.tmp" "$out" && break
      echo "=== bench $name attempt $attempt failed (rc=$?)"
      sleep 10
    done
  fi
done

mkdir -p result/archive_r3
for s in headline robustness; do
  if [ -f "result/study_${s}.json.jsonl" ] && \
     [ ! -f "result/archive_r3/study_${s}.json.jsonl" ]; then
    mv "result/study_${s}.json.jsonl" "result/archive_r3/"
    [ -f "result/study_${s}.json" ] && \
      mv "result/study_${s}.json" "result/archive_r3/"
  fi
done

exec bash scripts/run_studies.sh headline robustness bestrecipe \
  model_attribution capacity
