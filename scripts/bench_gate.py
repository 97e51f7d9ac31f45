"""Cross-round steady-state bench regression gate (VERDICT r7 #4).

Runs bench.py once, passes its output through untouched, then
compares the fresh per-query STEADY timings (best-of-3 on a prepared
plan — the stable comparator; e2e carries ±30% environment drift per
SCALE.md's cross-round control) against the most recent committed
BENCH_r{N}.json. Fails when a query's steady time exceeds BOTH a
1.5x relative and a +150 ms absolute margin over the last round —
the absolute floor keeps the measured 10-30 ms environment drift
band (which on a 45 ms query is already >1.5x relative) from tripping
the gate, while a genuine plan regression (steady jumping hundreds of
ms) cannot hide under it.

Usage: python scripts/bench_gate.py   (exit 1 on regression)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REL_TOL = 1.5
ABS_TOL_S = 0.150

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_committed_bench() -> tuple[str, dict] | tuple[None, None]:
    rounds = []
    for path in glob.glob(os.path.join(_HERE, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    for _, path in sorted(rounds, reverse=True):
        with open(path) as f:
            rec = json.load(f)
        parsed = rec.get("parsed") or {}
        if parsed.get("queries"):
            return path, parsed
    return None, None


def main() -> int:
    proc = subprocess.run(
        [sys.executable, os.path.join(_HERE, "bench.py")],
        capture_output=True,
        text=True,
        timeout=900,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode != 0:
        print(f"bench_gate: bench.py exited {proc.returncode}")
        return proc.returncode
    cur = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            cur = json.loads(line)
    if cur is None:
        print("bench_gate: no JSON metric line in bench output")
        return 1

    path, prev = _latest_committed_bench()
    if prev is None:
        print("bench_gate: no committed BENCH_r*.json to compare against — pass")
        return 0

    failures = []
    for q, prev_s in prev["queries"].items():
        cur_s = cur["queries"].get(q)
        if cur_s is None:
            failures.append(f"{q}: present in {os.path.basename(path)} but missing now")
        elif cur_s > prev_s * REL_TOL and cur_s > prev_s + ABS_TOL_S:
            failures.append(
                f"{q}: steady {cur_s:.3f}s vs {prev_s:.3f}s last round "
                f"(>{REL_TOL}x and >+{ABS_TOL_S * 1000:.0f}ms)"
            )
    if failures:
        print(f"bench_gate: STEADY REGRESSION vs {os.path.basename(path)}:")
        for f_ in failures:
            print(f"  {f_}")
        return 1
    print(
        f"bench_gate: steady suite {cur['value']:.3f}s vs "
        f"{prev['value']:.3f}s in {os.path.basename(path)} — within tolerance"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
