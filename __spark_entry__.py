"""Driver contract for the spark-graft builder (PySpark target).

Thin wiring layer: every operator lives in `sparkml_spark/` and
registers itself in `sparkml_spark.registry` at import time. The
driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may import this file by path; make the package importable
# regardless of the caller's sys.path.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

import sparkml_spark.operators  # noqa: F401,E402  (registers all queries)
from sparkml_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    return QUERIES["agg_groupby_multi"](spark, "/root/testdata/sf0.001")


def _round_files() -> list:
    """CORRECTNESS_r*.json paths in ascending PARSED round order."""
    rounds = []
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    return [p for _, p in sorted(rounds)]


def _scan_evidence() -> tuple[set, set, set, dict]:
    """(hash-verified ids, rows-verified ids, ids with any prior driver
    row, last-seen round per id) from every CORRECTNESS_r*.json
    committed at the repo root. Drives the slot rotation below;
    self-updating as rounds accumulate.

    `last_seen[qid]` is the ordinal of the LATEST committed round whose
    slate contained qid — the evidence-freshness ledger. Ordering the
    verified tail by this ledger (ADVICE r9) instead of a stride ×
    n_rounds ring offset makes coverage monotone BY CONSTRUCTION: each
    round re-checks the stalest ids, those become the freshest and
    drop to the back, and no front-size history can ever skip a tail
    id (the old formula derived the stride from the CURRENT front but
    multiplied it by ALL past rounds, so a shrinking front jumped the
    offset past unre-checked ids)."""
    verified: set = set()
    rows_ok: set = set()
    seen: set = set()
    last_seen: dict = {}
    # Order by the PARSED round integer, not the raw filename: with
    # lexicographic sort 'CORRECTNESS_r100' would precede '..._r99'
    # and an unpadded round would land arbitrarily, scrambling the
    # last_seen ages and the staleness rotation (ADVICE r9 #3).
    for rnd, path in enumerate(_round_files(), start=1):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for qid, row in data.items():
            if not isinstance(row, dict):
                continue
            seen.add(qid)
            last_seen[qid] = rnd
            if row.get("hash_match") is True:
                verified.add(qid)
            if row.get("rows_match") is True:
                rows_ok.add(qid)
            # ROWS-tier ids are recorded by the driver as err="no_oracle"
            # with rows_match=null but a real spark_rows count — that IS
            # the rows-only evidence the tier contract asks for (VERDICT
            # r4 "What's wrong" #2; without this the same sketch ops eat
            # the first rotation slots every round).
            if row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                rows_ok.add(qid)
    return verified, rows_ok, seen, last_seen


def _prior_evidence() -> tuple[set, set, set]:
    """Evidence sets only — the shape the contract tests consume."""
    verified, rows_ok, seen, _ = _scan_evidence()
    return verified, rows_ok, seen


#: Driver slots hash-checked per round (observed in every
#: CORRECTNESS_r*.json since r1); drives the rotation stride below.
_DRIVER_SLOTS = 50


def _n_rounds() -> int:
    """Completed driver rounds = committed CORRECTNESS files."""
    return len(_round_files())


def _priority_order(n_rounds: int | None = None) -> list:
    """Driver verification checks the FIRST N registered queries per
    round (N=50, registration order — CORRECTNESS_r01.json). Spend
    those slots on queries with no green row yet: ROWS-tier ids whose
    prior rows are all hard errors (crash — needs a retry), then
    ORACLE-tier never-hash-matched, then ROWS-tier never-run (so once
    the ORACLE backlog clears, slots burn down the §2.J/§2.K rows-only
    ledger), then the already-verified tail as a ROTATING regression
    guard.

    The tail rotation (VERDICT r7 #1, reworked per ADVICE r9): once
    every id is verified the three priority buckets are empty and,
    without rotation, the same first-50 verified ids in registration
    order would absorb the driver's slots every round forever while
    the other ~240 never get re-checked against evolving code. The
    tail is ordered by EVIDENCE STALENESS — ids whose latest driver
    check is oldest first (ties broken by the bucket-then-registration
    order, via stable sort) — so each round re-checks the stalest
    ids, which then drop to the back of the queue. Coverage is
    monotone by construction (no ring-offset arithmetic to drift when
    the unverified front shrinks between rounds), and every id's
    evidence age is bounded by ceil(len(tail)/stride) rounds. For
    SIMULATED future rounds (the cycle tests pass n_rounds =
    committed + k), each simulated round is replayed separately
    (ADVICE r9 #4): the round's stride of stalest tail ids is
    re-checked and drops to the back as freshest, and the front ids
    — which the driver checks first — are assumed to verify and
    join the back of the tail, so the NEXT simulated round's front
    is empty and its stride is the full slot count. This matches the
    live rotation (where the front shrinks as ids verify) instead of
    freezing round-one's stride for every simulated round, which
    under-rotated and proved a weaker coverage bound than the live
    behavior provides. Unverified ids still preempt the rotation —
    they sit in front of the tail regardless of staleness."""
    verified, rows_ok, seen, last_seen = _scan_evidence()
    order = list(QUERIES)
    rows_retry = [q for q in order if q not in ORACLES and q in seen and q not in rows_ok]
    oracle_new = [q for q in order if q in ORACLES and q not in verified]
    rows_new = [q for q in order if q not in ORACLES and q not in seen]
    oracle_done = [q for q in order if q in ORACLES and q in verified]
    rows_seen = [q for q in order if q not in ORACLES and q in rows_ok]
    front = rows_retry + oracle_new + rows_new
    tail = oracle_done + rows_seen
    if not tail:
        return front
    tail.sort(key=lambda q: last_seen.get(q, 0))  # stable on ties
    if n_rounds is None:
        n_rounds = _n_rounds()
    for _ in range(max(0, n_rounds - _n_rounds())):
        stride = max(1, _DRIVER_SLOTS - min(len(front), _DRIVER_SLOTS - 1))
        checked, tail = tail[:stride], tail[stride:]
        tail = tail + checked + front
        front = []
    return front + tail


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in driver
    verification-priority order (see _priority_order)."""
    return {name: QUERIES[name] for name in _priority_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every ORACLE-tier query (ROWS-tier ops omitted)."""
    return dict(ORACLES)
