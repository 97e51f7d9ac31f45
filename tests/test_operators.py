"""Unit tests on literal DataFrames — nulls, ties, empties (SURVEY §5.2).

The parity suite proves fixture agreement; these pin the semantic
edge cases the fixtures don't reach (fixtures have no NULLs and no
duplicate docs)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkml_spark.registry import QUERIES, dsum

from .conftest import SF_DIR


def test_outer_join_null_extension(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k INT, v STRING")
    right = spark.createDataFrame([(2, 20.0), (4, 40.0)], "k INT, w DOUBLE")
    rows = {r["k"]: (r["v"], r["w"]) for r in left.join(right, "k", "full").collect()}
    assert rows[1] == ("a", None)
    assert rows[2] == ("b", 20.0)
    assert rows[4] == (None, 40.0)


def test_dsum_ignores_nulls_and_empty(spark):
    df = spark.createDataFrame(
        [(1, 1.5), (1, None), (2, None)], "g INT, x DOUBLE"
    )
    got = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(dsum("x").alias("s")).collect()
    }
    assert got[1] == 1.5
    assert got[2] is None  # SUM over all-NULL group is NULL, not 0
    empty = df.filter("g = 99").agg(dsum("x").alias("s")).collect()
    assert empty[0]["s"] is None


def test_window_dedup_tie_break(spark):
    # two rows with the SAME timestamp: the tie-break key must decide
    df = spark.createDataFrame(
        [(1, 100, 5), (1, 100, 7), (2, 50, 1)], "user INT, ts INT, ev INT"
    )
    w = Window.partitionBy("user").orderBy(F.col("ts").desc(), F.col("ev").desc())
    kept = {
        r["user"]: r["ev"]
        for r in df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    }
    assert kept == {1: 7, 2: 1}


def test_exceptall_multiplicity(spark):
    a = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k INT")
    b = spark.createDataFrame([(1,), (3,)], "k INT")
    got = sorted(r["k"] for r in a.exceptAll(b).collect())
    assert got == [1, 1, 2]  # one copy of 1 removed, 2 survives


def test_rollup_null_marker_rows(spark):
    df = spark.createDataFrame([("x", "p", 1), ("x", "q", 2), ("y", "p", 4)], "a STRING, b STRING, n INT")
    rows = {
        (r["a"], r["b"]): r["s"]
        for r in df.rollup("a", "b").agg(F.sum("n").alias("s")).collect()
    }
    assert rows[("x", None)] == 3  # subtotal
    assert rows[(None, None)] == 7  # grand total
    assert ("y", "p") in rows and (None, "p") not in rows  # rollup ≠ cube


def test_filter_conjunction_identity(spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(100)], "i INT, m INT")
    a = df.filter((F.col("i") > 10) & (F.col("m") == 3))
    b = df.filter(F.col("i") > 10).filter(F.col("m") == 3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_asof_no_prior_match_is_null(spark):
    # purchase before any click must carry NULL, not a later click
    df = spark.createDataFrame(
        [(1, 10, "purchase", 100), (1, 20, "click", 101), (1, 30, "purchase", 102)],
        "user INT, t INT, typ STRING, ev INT",
    )
    w = (
        Window.partitionBy("user")
        .orderBy("t", "ev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_t = F.when(F.col("typ") == "click", F.col("t"))
    out = {
        r["ev"]: r["asof"]
        for r in df.withColumn("asof", F.last(click_t, ignorenulls=True).over(w))
        .filter("typ = 'purchase'")
        .collect()
    }
    assert out[100] is None
    assert out[102] == 20


def test_approx_percentile_close_to_exact(spark):
    import sparkml_spark.operators  # noqa: F401  (fills the registry)
    from sparkml_spark.registry import QUERIES
    from .conftest import SF_DIR

    exact = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in QUERIES["agg_percentile"](spark, SF_DIR).collect()
    }
    approx = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in QUERIES["agg_approx_percentile"](spark, SF_DIR).collect()
    }
    for flag, ex in exact.items():
        for e, a in zip(ex, approx[flag]):
            assert abs(e - a) / max(abs(e), 1) < 0.02, (flag, e, a)


def test_count_min_overestimates_only(spark):
    # CMS guarantee: est >= exact for every key, and the overestimate
    # is bounded (w=256 buckets over a 5-type corpus: tiny collisions).
    rows = QUERIES["agg_count_min"](spark, SF_DIR).collect()
    assert rows, "no keys"
    for r in rows:
        assert r["est_cnt"] >= r["exact_cnt"], r
        assert r["est_cnt"] <= r["exact_cnt"] * 1.5 + 100, r


def test_hll_union_estimate_close(spark):
    # Union of per-type sketches must estimate the GLOBAL distinct
    # user count (types share users, so it's far below the sum).
    row = QUERIES["agg_hll_sketch"](spark, SF_DIR).collect()[0]
    import duckdb

    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert abs(row["est_total_users"] - exact) / exact < 0.05, (row, exact)
