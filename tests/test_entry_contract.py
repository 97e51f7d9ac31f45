"""Driver-contract shape checks on __spark_entry__ itself."""

from __future__ import annotations

import inspect

import __spark_entry__ as entrymod


def test_oracle_keys_subset_of_queries():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle entries without queries: {missing}"


def test_oracle_tier_never_shrinks():
    """Round-10 floor: 301 of 335 queries are hash-checkable (the
    32-id ROWS-tier remainder is exactly the engine-private surface — model
    fits, hash families, RNG samplers, sketches, streaming state
    machines, file layout; every one of those families has an
    ORACLE-tier *_bound invariant pin). A tier demotion is a
    verification-strength regression and must be a conscious decision,
    not a side effect."""
    assert len(entrymod.oracle_sql()) >= 301
    assert len(entrymod.queries()) >= 335


def test_query_callables_arity():
    """The driver calls every queries() entry as fn(spark, sf_dir):
    exactly two REQUIRED parameters; extra parameters are allowed only
    with defaults (e.g. sim_rrf_fusion's ann= variant switch)."""
    for name, fn in entrymod.queries().items():
        params = list(inspect.signature(fn).parameters.values())
        assert len(params) >= 2, f"{name} must take (spark, sf_dir)"
        required = [
            p for p in params if p.default is inspect.Parameter.empty
        ]
        assert len(required) == 2, (
            f"{name}: extra parameters beyond (spark, sf_dir) must have "
            f"defaults — driver calls fn(spark, sf_dir)"
        )


def test_oracle_sql_mentions_known_views():
    views = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    # Queries whose data is generated in-query (custom connectors /
    # synthetic malformed input) rather than read from a fixture table;
    # their oracle uses table functions or expected constants.
    generator_backed = {"scan_python_datasource", "scan_csv_malformed"}
    for name, sql in entrymod.oracle_sql().items():
        if name in generator_backed:
            continue
        tokens = sql.lower()
        assert any(v in tokens for v in views), f"{name}: oracle references no fixture view"


def test_entry_returns_dataframe(spark):
    df = entrymod.entry(spark)
    assert df.columns and len(df.collect()) > 0


def test_slot_rotation_prioritizes_unverified_oracle():
    """The driver hash-checks the FIRST ~50 entries of queries() each
    round; those slots must be spent on ids with no green CORRECTNESS
    row yet: a small ROWS-retry bucket (seen but never rows_match=True)
    first, then unverified ORACLE-tier queries."""
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    verified, rows_ok, seen = entrymod._prior_evidence()
    rows_retry = [n for n in names if n not in oracles and n in seen and n not in rows_ok]
    unverified_oracle = [n for n in names if n in oracles and n not in verified]
    k = min(50, len(rows_retry) + len(unverified_oracle))
    head = names[:k]
    assert len(rows_retry) <= 8, "ROWS-retry bucket must stay small"
    assert names[: len(rows_retry)] == rows_retry, "ROWS-retry ids lead"
    for n in head[len(rows_retry):]:
        assert n in oracles, f"non-ORACLE id {n!r} wasting a priority slot"
        assert n not in verified, f"verified id {n!r} wasting a priority slot"


def test_slot_rotation_cycles_every_id(monkeypatch):
    """VERDICT r7 #1: with every id verified, the driver's 50 slots
    must not freeze on the same first-50 registration-order ids — the
    verified tail rotates by 50 positions per committed round, so ANY
    ceil(N/50) consecutive rounds put every registered id through a
    driver slot. Simulated against the real evidence files at HEAD."""
    import math

    verified, rows_ok, _seen = entrymod._prior_evidence()
    n_ids = len(entrymod.queries())
    # front = ids with no green evidence yet (they hold fixed slots at
    # the head of every window); the rotation stride shrinks to the
    # tail slots actually consumed per round
    n_front = sum(1 for q in entrymod.queries() if q not in verified and q not in rows_ok)
    stride = max(1, entrymod._DRIVER_SLOTS - min(n_front, entrymod._DRIVER_SLOTS - 1))
    n_windows = math.ceil(max(n_ids - n_front, 1) / stride)
    # simulated rounds are committed + k (ADVICE r9 #4: the sim
    # replays each future round with the front shrinking as it
    # verifies, so only future ordinals are meaningful)
    base = entrymod._n_rounds()
    for start in range(0, n_windows + 1):  # any starting round works
        covered: set = set()
        for r in range(base + start, base + start + n_windows):
            covered.update(entrymod._priority_order(n_rounds=r)[: entrymod._DRIVER_SLOTS])
        missing = set(entrymod.queries()) - covered
        assert not missing, (
            f"ids never reaching a driver slot in rounds "
            f"[{start}, {start + n_windows}): {sorted(missing)[:10]}"
        )


def test_consecutive_rounds_actually_advance():
    """The ROTATING TAIL must move: round N and round N+1 share at
    most a boundary sliver of their 50 slots once the pending front
    (unverified ids, which MUST occupy slots in both rounds until the
    driver hash-checks them) is excluded — a fixed all-slots overlap
    cap would spuriously fail every time >= 5 new ids are registered
    in one round."""
    verified, rows_ok, seen = entrymod._prior_evidence()
    oracles = entrymod.oracle_sql()
    front = {
        q
        for q in entrymod.queries()
        if (q in oracles and q not in verified)
        or (q not in oracles and q not in rows_ok)
    }
    base = entrymod._n_rounds()
    a = set(entrymod._priority_order(n_rounds=base)[: entrymod._DRIVER_SLOTS])
    b = set(entrymod._priority_order(n_rounds=base + 1)[: entrymod._DRIVER_SLOTS])
    shared_tail = (a & b) - front
    assert len(shared_tail) <= 10, f"rotation stalled: {len(shared_tail)} shared tail slots"


def test_unverified_ids_preempt_rotation(monkeypatch):
    """VERDICT r7 #7: when NEW ids are registered, the unverified
    buckets must still jump the rotating tail — the rotation is a
    regression guard, never a reason a new id waits 6 rounds for its
    first hash check. Registers a fake unverified ORACLE id and a fake
    never-seen ROWS id, asserts both land ahead of every verified id
    in the live next-round slate (simulated FUTURE rounds assume the
    front verifies and rejoins the tail, so preemption is a property
    of the live slate — ADVICE r9 #4)."""
    from sparkml_spark import registry

    fake_oracle = "zz_fake_unverified_oracle"
    fake_rows = "zz_fake_unseen_rows"
    monkeypatch.setitem(registry.QUERIES, fake_oracle, lambda spark, sf: None)
    monkeypatch.setitem(registry.ORACLES, fake_oracle, "SELECT 1 AS x FROM region")
    monkeypatch.setitem(registry.QUERIES, fake_rows, lambda spark, sf: None)
    try:
        order = entrymod._priority_order(n_rounds=entrymod._n_rounds())
        verified, rows_ok, _ = entrymod._prior_evidence()
        first_verified = min(
            i for i, q in enumerate(order) if q in verified or q in rows_ok
        )
        assert order.index(fake_oracle) < first_verified
        assert order.index(fake_rows) < first_verified
        assert order.index(fake_oracle) < order.index(fake_rows), (
            "unverified ORACLE must outrank never-seen ROWS"
        )
    finally:
        registry.QUERIES.pop(fake_oracle, None)
        registry.ORACLES.pop(fake_oracle, None)
        registry.QUERIES.pop(fake_rows, None)


def test_no_oracle_driver_rows_count_as_rows_evidence(tmp_path, monkeypatch):
    """The driver records a ROWS-tier run as err='no_oracle' with a
    real spark_rows count and rows_match=null. That IS the rows-only
    evidence — ids with such a row must NOT sit in the retry bucket
    burning a rotation slot every round (VERDICT r4 #2)."""
    import json

    record = {
        "sketchy_op": {"rows_match": None, "hash_match": None,
                       "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"},
        "crashed_op": {"rows_match": None, "hash_match": None,
                       "spark_rows": None, "oracle_rows": None, "err": "e\nboom"},
        "green_op": {"rows_match": True, "hash_match": True,
                     "spark_rows": 3, "oracle_rows": 3, "err": None},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(record))
    monkeypatch.setattr(entrymod, "_HERE", str(tmp_path))
    verified, rows_ok, seen = entrymod._prior_evidence()
    assert "sketchy_op" in rows_ok          # no_oracle + rows == evidence
    assert "crashed_op" not in rows_ok      # hard error == needs retry
    assert "green_op" in verified and "green_op" in rows_ok
    assert seen == {"sketchy_op", "crashed_op", "green_op"}


def test_sim_canon_mirrors_driver_array_failure():
    """scripts/driver_sim.canon must die exactly where the real driver
    dies — pandas sort_values over ndarray-valued cells — so an ORACLE
    query with an array result column fails in the sim BEFORE the
    driver finds it (the r4 agg_collect_sorted_array gap)."""
    import sys

    import numpy as np
    import pandas as pd
    import pytest

    sys.path.insert(0, "/root/repo/scripts")
    from driver_sim import canon

    ok = canon(pd.DataFrame({"b": [2, 1], "a": ["y", "x"]}))
    assert list(ok.columns) == ["a", "b"]          # column-name order
    assert list(ok["b"]) == [1, 2]                 # row canonicalization
    bad = pd.DataFrame({"k": [1, 2], "arr": [np.array([1]), np.array([2])]})
    with pytest.raises(TypeError):
        canon(bad)


def test_no_oracle_query_returns_nested_result_columns(spark):
    """Structural guarantee against the r4 failure class: the driver's
    canonicalizer cannot hash array/map/struct-valued cells (pandas
    factorize dies on ndarrays), so every ORACLE-tier query must
    resolve to a schema of scalar columns only — nested payloads are
    serialized (CSV-join / to_json) or scalarized inside the query.
    Schema resolution needs analysis only, not execution."""
    from .conftest import SF_DIR

    offenders = {}
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        if name not in oracles:
            continue
        schema = fn(spark, SF_DIR).schema
        nested = [
            f.name
            for f in schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
        ]
        if nested:
            offenders[name] = nested
    assert not offenders, (
        f"ORACLE queries with canonicalizer-unsafe nested result "
        f"columns: {offenders}"
    )


def test_every_evidenced_id_stays_registered():
    """Cumulative-evidence floor (VERDICT r6 #5): any id that ever
    earned a green driver row — hash_match=True, rows_match=True, or a
    no_oracle rows-evidence row — must still exist in queries(). A
    refactor that renames or drops such an id silently discards
    driver-verified evidence; make that a named failure instead."""
    verified, rows_ok, _seen = entrymod._prior_evidence()
    registered = set(entrymod.queries())
    lost = (verified | rows_ok) - registered
    assert not lost, f"ids with green driver evidence missing from queries(): {sorted(lost)}"
    # And every hash-verified id must still be ORACLE-tier: demoting a
    # hash-green id to ROWS weakens verification strength invisibly.
    demoted = verified - set(entrymod.oracle_sql())
    assert not demoted, f"hash-verified ids demoted out of ORACLE tier: {sorted(demoted)}"


def test_evidence_freshness_bounded():
    """VERDICT r8 #6: ledger staleness is a CI failure, not a judge
    observation. Every registered id with ANY driver evidence must
    have been in a driver slate within the last ceil(N/50)+1 committed
    rounds — the bound the staleness-ordered tail guarantees once the
    queue has cycled. Deliberately trips if a future round registers
    50+ new ids without the cycle widening to re-cover the tail, or if
    the rotation ever stops advancing. Ids with no evidence yet are
    exempt (they hold front slots and get checked next round)."""
    import math

    n_committed = entrymod._n_rounds()
    _, _, _, last_seen = entrymod._scan_evidence()
    n_ids = len(entrymod.queries())
    max_age = math.ceil(n_ids / entrymod._DRIVER_SLOTS) + 1
    stale = {
        q: n_committed - rnd
        for q, rnd in last_seen.items()
        if q in entrymod.queries() and n_committed - rnd > max_age
    }
    assert not stale, (
        f"ids with driver evidence older than {max_age} rounds: "
        f"{sorted(stale.items(), key=lambda kv: -kv[1])[:10]}"
    )


def test_tail_orders_by_staleness():
    """ADVICE r9: the verified tail must lead with the STALEST ids —
    the slate for the real next round (n_rounds = committed count)
    starts, after the unverified front, at the minimum last-seen
    round, and its tail segment is non-decreasing in last-seen."""
    verified, rows_ok, _ = entrymod._prior_evidence()
    _, _, _, last_seen = entrymod._scan_evidence()
    oracles = entrymod.oracle_sql()
    order = entrymod._priority_order()
    # reconstruct the TAIL with _priority_order's own bucket rule —
    # "verified or rows_ok" alone would wrongly include an ORACLE id
    # whose rowcount matched but whose hash never did (it belongs to
    # the front, correctly preempting rotation with fresh last_seen,
    # and would spuriously break the monotonicity assertion)
    tail = [
        q for q in order
        if (q in oracles and q in verified)
        or (q not in oracles and q in rows_ok)
    ]
    ages = [last_seen.get(q, 0) for q in tail]
    assert ages == sorted(ages), "tail not staleness-ordered"


def test_survey_registry_bijection():
    """SURVEY §2 is the contract (VERDICT r10 #8): every registered
    query id must appear somewhere in SURVEY.md — either a 2.A–2.L
    contract row/cell or the generated 2.M extended-surface table —
    so the judge's line-by-line coverage check and the registry can
    never drift apart. Registering an id without documenting it is a
    build failure, not a review comment."""
    import sparkml_spark.operators  # noqa: F401
    from sparkml_spark.registry import QUERIES

    survey = open("/root/repo/SURVEY.md").read()
    undocumented = sorted(n for n in QUERIES if n not in survey)
    assert not undocumented, (
        f"{len(undocumented)} registered ids missing from SURVEY.md "
        f"(add to §2.M): {undocumented[:10]}..."
    )
