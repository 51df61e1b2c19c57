#!/bin/bash
# Round-3 TPU validation sequence — run serially (ONE TPU job at a time;
# concurrent jobs contend on the single tunneled chip and corrupt timings).
# Logs to /tmp/r3_validate/.
set -u
mkdir -p /tmp/r3_validate
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2700 "$@" > "/tmp/r3_validate/$name.log" 2>&1
  echo "exit=$? ($name)"
  tail -12 "/tmp/r3_validate/$name.log" | grep -v Warning
}

run tile_correct   python tools/check_tile_refine.py
run region_correct python tools/check_tile_refine.py region
run refine_bench   python tools/check_tile_refine.py bench 1080 1920 32768 5
run packed         python tools/check_packed.py 4096 5
run budget         python tools/check_budget.py
run parity         python tools/parity_pallas.py
echo "ALL DONE"
