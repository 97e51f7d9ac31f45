"""Fixture-drift canary (VERDICT r3 #7) + lazy-loader isolation (#2).

Round 3 lost 30 driver rows because /root/testdata was silently
regenerated (events.ts: Parquet NANOS -> MICROS) and the loader's
unconditional repair died on every query. These tests make the NEXT
silent regeneration fail one named test instead of 30 anonymous
driver rows:

- test_loaded_dtypes_pinned: every fixture column's *loaded* Spark
  dtype is pinned. The loader normalizes events.ts to timestamp_ntz
  whether the file carries NANOS (bigint repair path) or MICROS
  (native), so the pins hold across both fixture generations.
- test_lazy_tables_isolate_bad_table: a corrupt events.parquet must
  not poison a lineitem-only query (LazyTables loads per attribute
  access, not eagerly).
"""

from __future__ import annotations

import os
import shutil

import pytest

from sparkml_spark.sources.loader import (
    LazyTables,
    load_table,
    load_tables,
    register_views,
)

from .conftest import SF_DIR

#: column -> Spark dtype, as loaded through sources/loader.py.
EXPECTED_DTYPES = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint",
        "ts": "timestamp_ntz",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


#: Every scale the driver touches: t1 smoke / t2 verify / bench. A
#: regeneration at ONE scale (r3 regenerated all, but nothing pins that)
#: must fail here, not as 30 red driver rows at the verify scale.
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", sorted(EXPECTED_DTYPES))
def test_loaded_dtypes_pinned(spark, table, sf_dir):
    got = dict(load_table(spark, sf_dir, table).dtypes)
    assert got == EXPECTED_DTYPES[table], (
        f"FIXTURE DRIFT in {table!r} at {sf_dir}: loaded dtypes {got} != pinned "
        f"{EXPECTED_DTYPES[table]} — /root/testdata was likely regenerated; "
        "update sources/loader.py + FIXTURES.md together."
    )


def test_lazy_tables_isolate_bad_table(spark, tmp_path):
    # Valid lineitem, corrupt events: a lineitem-only query must work.
    shutil.copy(os.path.join(SF_DIR, "lineitem.parquet"), tmp_path / "lineitem.parquet")
    (tmp_path / "events.parquet").write_bytes(b"this is not parquet")

    t = load_tables(spark, str(tmp_path))
    assert isinstance(t, LazyTables)
    assert t.lineitem.count() > 0  # untouched by the corrupt events file

    with pytest.raises(Exception):
        t.events.count()  # the bad table still fails loudly when asked for

    with pytest.raises(AttributeError):
        _ = t.not_a_table


def test_register_views_bounds_blast_radius(spark, tmp_path):
    # Valid lineitem, corrupt events: SQL-entry queries that never
    # touch events must keep working; ones that do must fail loudly
    # with a missing-view error, not a poisoned-session error.
    shutil.copy(os.path.join(SF_DIR, "lineitem.parquet"), tmp_path / "lineitem.parquet")
    (tmp_path / "events.parquet").write_bytes(b"this is not parquet")

    # try/finally (ADVICE r5): an assertion mid-phase must not leave
    # corrupt/missing views poisoning later SQL-entry tests.
    try:
        with pytest.warns(UserWarning, match="dropped view 'events'"):
            register_views(spark, str(tmp_path))
        assert spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"] > 0
        with pytest.raises(Exception):
            spark.sql("SELECT COUNT(*) FROM events").collect()

        # A fully-bogus sf_dir must still fail loudly, not register nothing.
        with pytest.raises(Exception):
            register_views(spark, str(tmp_path / "nowhere"))
    finally:
        # Restore real views for any later SQL-entry test in this session.
        register_views(spark, SF_DIR)


def test_fixture_integrity_facts_pinned(spark):
    """Integrity facts several ORACLE queries silently ride on
    (SURVEY 5.3, ADVICE r4): a regeneration that breaks one of these
    flips parity in query-specific ways much harder to diagnose than
    this named test. Facts: events.event_id unique; event_type/user_id
    non-null (fn_json_struct's to_json omits nulls — now coalesced, but
    keep the canary); documents.n_chars == length(text) exactly; no
    exact-duplicate texts (dedup ops manufacture their own dup
    population and assume a clean base); embeddings unit-norm."""
    from pyspark.sql import functions as F

    e = load_table(spark, SF_DIR, "events")
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        F.sum(F.col("event_type").isNull().cast("int")).alias("null_types"),
        F.sum(F.col("user_id").isNull().cast("int")).alias("null_users"),
    ).collect()[0]
    assert row["n"] == row["n_ids"], "event_id no longer unique"
    assert row["null_types"] == 0 and row["null_users"] == 0, (
        "events.event_type/user_id grew nulls — audit to_json/groupBy queries"
    )
    # props is uniformly a one-key integer object — the shape the
    # udtf_analyze_dynamic oracle's regexp extraction rides on.
    bad_props = e.filter(
        ~F.col("props").rlike(r'^\{"k":\s*-?\d+\}$')
    ).count()
    assert bad_props == 0, (
        f"{bad_props} events.props rows no longer match the "
        '{"k": <int>} shape — udtf_analyze_dynamic oracle at risk'
    )

    d = load_table(spark, SF_DIR, "documents")
    drow = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("text").alias("n_texts"),
        F.sum((F.col("n_chars") != F.length("text")).cast("int")).alias("bad_nchars"),
        F.min(F.size(F.split(F.lower(F.trim("text")), r"\s+"))).alias("min_toks"),
    ).collect()[0]
    assert drow["bad_nchars"] == 0, "n_chars != length(text) appeared"
    assert drow["n"] == drow["n_texts"], "exact-duplicate texts appeared in base corpus"
    # Pure printable ASCII: the multimodal byte-level oracles
    # (frame_sample, decode_stub, audio_features_stub) ride on
    # byte k == ascii(char k).
    non_ascii = d.filter(~F.col("text").rlike(r"^[ -~]*$")).count()
    assert non_ascii == 0, (
        f"{non_ascii} documents are no longer printable ASCII — "
        "multimodal byte-level oracles at risk"
    )
    # Gram builders are guarded for short docs, but record the current
    # floor so a regeneration that introduces tiny docs is visible.
    assert drow["min_toks"] >= 1

    emb = load_table(spark, SF_DIR, "embeddings")
    norm_sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    bad = emb.filter((norm_sq < 0.999) | (norm_sq > 1.001)).count()
    assert bad == 0, f"{bad} embeddings no longer unit-norm"
