"""Summarize a tools/r3_validate.sh run into one markdown block.

Reads /tmp/r3_validate/*.log (or a directory given as argv[1]), pulls the
bench JSON lines, the refine/packed micro-bench tables' tails, and the
correctness-gate verdicts, and prints a BENCH.md-ready summary. Purely a
log formatter — no TPU work.

Usage: python tools/r3_summarize.py [/tmp/r3_validate]
"""

import json
import os
import re
import sys


def tail(path, n=20):
    try:
        with open(path, errors="replace") as f:
            return f.readlines()[-n:]
    except OSError:
        return []


def last_json(path):
    """Last parseable {...} JSON line in the log (bench.py prints one)."""
    for line in reversed(tail(path, 50)):
        line = line.strip()
        if line.startswith("{") and line.endswith("}"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r3_validate"
    if not os.path.isdir(d):
        raise SystemExit(f"no log dir: {d}")

    # headline sweep: refine-mode benches + stream/storage/final
    rows = []
    for name in ("bench_tile", "bench_step", "bench_region", "bench_walk",
                 "bench_storage", "bench_stream", "bench_final"):
        rec = last_json(os.path.join(d, f"{name}.log"))
        if rec and "value" in rec:
            extras = {k: v for k, v in rec.items()
                      if k.startswith(("budget_", "stream_"))
                      or k == "pallas_xla_parity"}
            rows.append((name, rec["value"], rec.get("kps_per_frame"),
                         extras))
    if rows:
        print("| run | fps | kps/frame | extras |")
        print("|---|---|---|---|")
        for name, fps, kp, extras in rows:
            print(f"| {name} | {fps} | {kp} | "
                  f"{json.dumps(extras) if extras else ''} |")
        best = max(rows, key=lambda r: r[1])
        print(f"\nfastest headline: **{best[0]}** at {best[1]} fps")

    # correctness gates: look for obvious pass/fail markers
    print("\ncorrectness gates:")
    for name in ("tile_correct", "region_correct", "walk_correct", "budget",
                 "parity", "storage_parity"):
        p = os.path.join(d, f"{name}.log")
        if not os.path.exists(p):
            print(f"  {name}: (missing)")
            continue
        txt = "".join(tail(p, 12))
        bad = re.search(r"Trace|Error|FAIL|AssertionError", txt)
        status = "FAIL?" if bad else "ok"
        last = txt.strip().splitlines()[-1] if txt.strip() else ""
        print(f"  {name}: {status} — {last[:110]}")

    # micro-bench decision data
    for name in ("refine_bench", "packed", "ablate", "hpatches"):
        p = os.path.join(d, f"{name}.log")
        if os.path.exists(p):
            print(f"\n--- {name} (tail) ---")
            print("".join(tail(p, 14)).rstrip())


if __name__ == "__main__":
    main()
