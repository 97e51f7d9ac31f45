"""Driver-evidence freshness report (VERDICT r11 "slate arithmetic"
watch item): for every registered query, when did the driver last
hash-check (or rows-check) it, and what will the next slates re-check?

Reads the committed CORRECTNESS_r*.json ledger through the same
scanner the slot rotation uses (__spark_entry__._scan_evidence), so
the report IS the rotation's view. Prints an age histogram, the
stalest 20 ids, and the projected next-round slate, then one JSON
summary line.

Usage: python scripts/evidence_age.py [--gate]

--gate (VERDICT r12 #2): exit non-zero unless the freshness ledger is
inside its steady-state bounds, so inventory growth can never again
silently outrun driver re-verification. The gate fails when
  * any id has NEVER been driver-checked AND is not in the front of
    the NEXT slate (i.e. it would not land a row next round — a
    registration that outran the rotation), or
  * the stalest driver evidence exceeds the rotation's steady-state
    bound, ceil(#queries / slots) + 1 rounds (the +1 absorbs the
    round in flight).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from sparkml_spark.registry import ORACLES, QUERIES  # noqa: E402


def main() -> int:
    verified, rows_ok, seen, last_seen = entry._scan_evidence()
    n_rounds = entry._n_rounds()

    ages: dict[str, int | None] = {}
    for q in QUERIES:
        ages[q] = (n_rounds - last_seen[q]) if q in last_seen else None

    never = sorted(q for q, a in ages.items() if a is None)
    by_age: dict[int, int] = {}
    for a in ages.values():
        if a is not None:
            by_age[a] = by_age.get(a, 0) + 1

    print(f"# rounds committed: {n_rounds}; queries: {len(QUERIES)} "
          f"({len(ORACLES)} oracle)")
    print(f"# never driver-checked: {len(never)}"
          + (f" -> {' '.join(never[:8])}{' ...' if len(never) > 8 else ''}"
             if never else ""))
    print("# evidence-age histogram (rounds since last driver row):")
    for a in sorted(by_age):
        print(f"#   age {a}: {by_age[a]} ids")
    stale = sorted(
        ((a, q) for q, a in ages.items() if a is not None),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    print("# stalest 20:", ", ".join(f"{q}(r{n_rounds - a})" for a, q in stale))
    nxt = entry._priority_order()[:entry._DRIVER_SLOTS]
    print(f"# next slate ({len(nxt)}): {' '.join(nxt)}")

    max_age = max((a for a in ages.values() if a is not None), default=0)
    print(json.dumps({
        "metric": "evidence_age",
        "rounds": n_rounds,
        "queries": len(QUERIES),
        "never_checked": len(never),
        "hash_verified": len(verified & set(QUERIES)),
        "rows_evidence_only": len((rows_ok - verified) & set(QUERIES)),
        "max_age": max_age,
    }))

    if "--gate" in sys.argv[1:]:
        bound = math.ceil(len(QUERIES) / entry._DRIVER_SLOTS) + 1
        failures = []
        stranded = [q for q in never if q not in nxt]
        if stranded:
            failures.append(
                f"{len(stranded)} never-driver-checked id(s) not in the "
                f"next slate (registration outran the rotation): "
                f"{' '.join(stranded[:8])}"
            )
        if max_age > bound:
            failures.append(
                f"max evidence age {max_age} exceeds the steady-state "
                f"bound {bound} (= ceil({len(QUERIES)}/{entry._DRIVER_SLOTS}) + 1)"
            )
        if failures:
            for msg in failures:
                print(f"GATE FAIL: {msg}")
            return 1
        print(f"GATE PASS: never-stranded=0, max_age={max_age} <= {bound}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
