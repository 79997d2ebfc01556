#!/bin/bash
# Packed-tail A/B on the real chip (waits for the study chain to exit):
# generation at 1024px with the last 1 and 2 upsample blocks in the
# phase-packed layout, the per-block roofline under packing, and the
# 1024px attribution preset (solver fwd+bwd through the packed blocks).
set -u
cd "$(dirname "$0")/.."

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

mkdir -p result/bench_r4
for spec in "gen1024_packed1:--preset generate --packed_tail 1" \
            "gen1024_packed2:--preset generate --packed_tail 2" \
            "gen_roofline_packed2:--preset gen_roofline --packed_tail 2" \
            "attr1024_packed2:--preset 1024px --packed_tail 2" ; do
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
echo "=== packed benches done"
