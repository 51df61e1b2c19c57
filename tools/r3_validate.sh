#!/bin/bash
# Round-3 TPU validation sequence — run serially (ONE TPU job at a time;
# concurrent jobs contend on the single tunneled chip and corrupt timings).
# Logs to /tmp/r3_validate/. Ordered so the decision-critical data (refine
# kernel strategy, packed-vs-perkey) lands first in case the TPU window is
# short.
set -u
mkdir -p /tmp/r3_validate
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2700 "$@" > "/tmp/r3_validate/$name.log" 2>&1
  echo "exit=$? ($name)"
  tail -14 "/tmp/r3_validate/$name.log" | grep -v Warning
}

# 1) decision data: refine strategy (tile / step / region x steps), windows
run refine_bench   python tools/check_tile_refine.py bench 1080 1920 32768 5
run packed         python tools/check_packed.py 4096 5
# 2) correctness gates
run tile_correct   python tools/check_tile_refine.py
run region_correct python tools/check_tile_refine.py region
run walk_correct   python tools/check_tile_refine.py walk
run budget         python tools/check_budget.py
run parity         python tools/parity_pallas.py
# 3) stage ablation + headline sweep (env-selectable modes)
run ablate         python tools/ablate_stages.py
for m in tile step region walk; do
  run "bench_$m" env BENCH_REFINE_MODE=$m BENCH_SKIP_CV2=1 python bench.py
done
run bench_stream   env BENCH_STREAM=1 BENCH_SKIP_CV2=1 python bench.py
run storage_parity python tools/check_modes.py storage_dtype=bfloat16
run bench_storage  env BENCH_STORAGE_BF16=1 BENCH_SKIP_CV2=1 BENCH_PARITY=0 python bench.py
run bench_final    python bench.py
# 4) quality protocols (only reached if the TPU window lasts)
run hpatches       python tools/repeatability.py hpatches
echo "ALL DONE"
