#!/bin/bash
# Round-4 follow-up packed-tail A/Bs: attribution 1024px with 1 packed
# block (packed2 already measured), and 512px generation default vs
# packed (the 512 block runs at MFU 0.20 in the default roofline).
set -u
cd "$(dirname "$0")/.."

mkdir -p result/bench_r4
for spec in "attr1024_packed1:--preset 1024px --packed_tail 1" \
            "gen512_default:--preset generate --gen_size 512" \
            "gen512_packed1:--preset generate --gen_size 512 --packed_tail 1" ; do
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
echo "=== packed2 benches done"
