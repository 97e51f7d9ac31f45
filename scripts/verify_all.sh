#!/usr/bin/env bash
# One-shot full verification: internal test suite, the driver's t2
# protocol at every fixture scale, and the headline bench. Prints a
# compact summary; exits non-zero on the first red gate.
#
# Usage: bash scripts/verify_all.sh [--quick]
#   --quick: sf0.01 sim + bench only (skips pytest and the other scales)
set -u
cd "$(dirname "$0")/.."

quick=0
[ "${1:-}" = "--quick" ] && quick=1

summary=()
fail=0

run() { # name, cmd...
  local name=$1; shift
  local t0=$SECONDS out rc
  out=$("$@" 2>&1); rc=$?
  local dt=$((SECONDS - t0))
  local tail_line
  tail_line=$(printf '%s\n' "$out" | tail -1)
  if [ $rc -ne 0 ]; then
    fail=1
    summary+=("FAIL  ${name} (${dt}s): ${tail_line}")
    printf '%s\n' "$out" | tail -30
  else
    summary+=("ok    ${name} (${dt}s): ${tail_line}")
  fi
}

if [ $quick -eq 0 ]; then
  run "pytest" python -m pytest tests/ -q -x
fi
run "sim sf0.01" python scripts/driver_sim.py
if [ $quick -eq 0 ]; then
  run "sim sf0.001" python scripts/driver_sim.py --sf-dir /root/testdata/sf0.001
  run "sim sf0.1" python scripts/driver_sim.py --sf-dir /root/testdata/sf0.1
fi
run "bench" python bench.py

echo
echo "== verify_all summary =="
for line in "${summary[@]}"; do echo "$line"; done
exit $fail
