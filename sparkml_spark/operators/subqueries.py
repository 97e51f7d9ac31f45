"""Subquery operators — scalar, IN, correlated EXISTS, and the
dialect-overlap SQL entry point (SURVEY §3 EP3, §4.1 "subquery
decorrelation").

Catalyst rewrites every form here into joins (RewriteCorrelatedScalarSubquery
/ RewritePredicateSubquery), so the scale story is the join story: the
scalar subquery becomes a broadcast of one row; IN becomes a left-semi
join; correlated EXISTS becomes a semi join on the correlation key.

`sql_text_overlap` runs the IDENTICAL SQL string through `spark.sql`
and the DuckDB oracle — pinning the dialect-overlap subset of EP3.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkml_spark.registry import dsum_sql, query
from sparkml_spark.sources.loader import load_table, register_views


@query(
    "subquery_scalar",
    section="2.C",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
""",
)
def subquery_scalar(spark, sf_dir):
    """Orders above 1.5x the global average price (scalar subquery →
    Catalyst plans a one-row broadcast, not a driver round-trip —
    expressed via spark.sql so the subquery rewrite itself is what
    executes)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@query(
    "subquery_not_in_null",
    section="2.C",
    oracle="""
SELECT
  (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
     (SELECT nullif(n_nationkey, 2) FROM nation WHERE n_regionkey = 2))
    AS not_in_with_null,
  (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
     (SELECT n_nationkey FROM nation WHERE n_regionkey = 2))
    AS not_in_no_null,
  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
     (SELECT 1 FROM nation n
      WHERE n.n_nationkey = c.c_nationkey AND n.n_regionkey = 2))
    AS not_exists_count
""",
)
def subquery_not_in_null(spark, sf_dir):
    """The NOT IN three-valued-logic trap, pinned cross-engine: when
    the subquery list contains a NULL (injected via nullif on a key
    known to be in the set), ANSI semantics make `x NOT IN (...)`
    UNKNOWN for every row — count 0 — while the NULL-free NOT IN and
    the NOT EXISTS anti-join agree with each other. Catalyst plans the
    NULL-risky form as null-aware anti join (the expensive one); NOT
    EXISTS stays a plain left-anti — which is why pipelines should
    write NOT EXISTS at 100 TB."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT
  (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
     (SELECT nullif(n_nationkey, 2) FROM nation WHERE n_regionkey = 2))
    AS not_in_with_null,
  (SELECT COUNT(*) FROM customer WHERE c_nationkey NOT IN
     (SELECT n_nationkey FROM nation WHERE n_regionkey = 2))
    AS not_in_no_null,
  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
     (SELECT 1 FROM nation n
      WHERE n.n_nationkey = c.c_nationkey AND n.n_regionkey = 2))
    AS not_exists_count
        """
    )


@query(
    "subquery_in",
    section="2.C",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
""",
)
def subquery_in(spark, sf_dir):
    """IN-subquery (rewritten to a left-semi join on the key set)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )


@query(
    "subquery_correlated_exists",
    section="2.C",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
)
""",
)
def subquery_correlated_exists(spark, sf_dir):
    """Correlated EXISTS (decorrelated into a semi join on s_suppkey)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49
        )
        """
    )


@query(
    "subquery_correlated_scalar",
    section="2.C",
    oracle="""
SELECT p_partkey, p_retailprice, avg_type_price
FROM (
  SELECT p_partkey, p_retailprice,
         (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(27,6))) AS DOUBLE)
                 / COUNT(p2.p_retailprice)
          FROM part p2 WHERE p2.p_type = p.p_type) AS avg_type_price
  FROM part p
)
WHERE p_retailprice > avg_type_price
""",
)
def subquery_correlated_scalar(spark, sf_dir):
    """Parts priced above their type's average (correlated scalar
    subquery, TPC-H Q17's shape — decorrelated into an agg + join on
    p_type; the exact-decimal average keeps both engines bit-equal)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_retailprice, avg_type_price
        FROM (
          SELECT p_partkey, p_retailprice,
                 (SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(27,6))) AS DOUBLE)
                         / COUNT(p2.p_retailprice)
                  FROM part p2 WHERE p2.p_type = p.p_type) AS avg_type_price
          FROM part p
        )
        WHERE p_retailprice > avg_type_price
        """
    )


_OVERLAP_SQL = f"""
SELECT l_returnflag,
       COUNT(*) AS n_items,
       {dsum_sql('l_extendedprice')} AS sum_price,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 40
GROUP BY l_returnflag
"""


@query("sql_text_overlap", section="3.EP3", oracle=_OVERLAP_SQL)
def sql_text_overlap(spark, sf_dir):
    """EP3 dialect overlap: the very same SQL string executes on Spark
    (over registered temp views) AND as the DuckDB oracle — no
    translation layer at all for the ANSI-overlap subset."""
    register_views(spark, sf_dir)
    return spark.sql(_OVERLAP_SQL)


_DIALECT_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
            AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
            AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE)
         / COUNT(l_quantity) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("sql_dialect_q1", section="3.EP3", oracle=_DIALECT_Q1)
def sql_dialect_q1(spark, sf_dir):
    """EP3 dialect overlap, flagship-sized: the COMPLETE Q1-shape SQL
    text — decimal-exact sums, derived average, timestamp literal,
    multi-key grouping — runs verbatim through `spark.sql` and as the
    DuckDB oracle. Demonstrates that the engine's SQL entry point
    needs no translation layer for the ANSI-overlap subset, including
    the float-parity idioms (the dsum pattern is itself plain ANSI)."""
    register_views(spark, sf_dir)
    return spark.sql(_DIALECT_Q1)


_DIALECT_WINDOW = """
SELECT user_id, event_id, value,
       ROW_NUMBER() OVER w AS seq,
       CAST(SUM(CAST(value AS DECIMAL(27,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_value,
       LAG(event_type) OVER w AS prev_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("sql_dialect_window", section="3.EP3", oracle=_DIALECT_WINDOW)
def sql_dialect_window(spark, sf_dir):
    """EP3 dialect overlap, window edition: named WINDOW clause,
    ROW_NUMBER / framed decimal-exact running SUM / LAG — one SQL
    string, executed verbatim by both engines (no translation layer).
    The running sum is decimal-cast inside the frame: window
    accumulation order differs between engines (segment tree vs
    streaming), so frame sums need the same exactness discipline as
    grouped dsum."""
    register_views(spark, sf_dir)
    return spark.sql(_DIALECT_WINDOW)


_LATERAL_TOPN = """
SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
"""


@query("sql_lateral_topn", section="3.EP3", oracle=_LATERAL_TOPN)
def sql_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery with per-row LIMIT — top-2 orders
    per customer straight from the FROM clause, identical SQL text on
    both engines (EP3 dialect overlap). Spark plans the lateral as a
    rank-filtered join (same physical shape as win_topk_per_group),
    NOT per-customer re-execution — the win_topk window form remains
    the explicit-DataFrame twin."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_TOPN)


_RECURSIVE_MONTH_SPINE = """
WITH RECURSIVE months(m, hi) AS (
  SELECT CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP),
         CAST(date_trunc('month', max(o_orderdate)) AS TIMESTAMP)
  FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
)
SELECT m AS month_start, count(o_orderkey) AS n_orders
FROM months LEFT JOIN orders ON CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) = m
GROUP BY m
"""


@query("sql_recursive_cte", section="3.EP3", oracle=_RECURSIVE_MONTH_SPINE)
def sql_recursive_cte(spark, sf_dir):
    """Recursive CTE (WITH RECURSIVE, new in Spark 4.x) — generates a
    month spine from min to max order date, then left-joins order
    counts per month (gap-free calendar rollup). IDENTICAL SQL text
    runs on both engines (EP3 dialect overlap, verified exact-match).

    Scale: the anchor computes BOTH recursion bounds in one scan of
    the fact table and threads the upper bound through the recursion
    as a carried column, so each of the N spine steps is a one-row
    local computation — no per-iteration rescans (the naive form with
    a scalar subquery in the step's WHERE re-scans orders every
    iteration; measured 19 s vs <2 s at sf0.01). The spine stays tiny
    regardless of fact size; the cost is the single hash aggregation,
    which shuffles on a low-cardinality key and map-side combines.
    The iterative twin for deep/wide recursions is
    `hierarchy_closure` (loop + checkpoint); this form is preferred
    whenever the recursion depth is bounded and the per-step result is
    small, because Catalyst plans each step as a UnionLoop without
    Python round-trips.

    Depth bound (ADVICE r01): the spine depth equals the fixture's
    month span (~80 here) and Spark caps recursion at
    spark.sql.cteRecursionLevelLimit (default 100) — a wider-span
    fixture would die at the cap, not silently truncate. We raise the
    cap to 2400 levels (200 years of months) explicitly so the bound
    is a deliberate constant rather than a data-dependent accident;
    beyond that the right tool is a sequence() spine, not recursion."""
    register_views(spark, sf_dir)
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "2400")
    return spark.sql(_RECURSIVE_MONTH_SPINE)


_DIALECT_GROUP_BY_ALL = """
SELECT lang,
       source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS first_doc
FROM documents
GROUP BY ALL
"""


@query(
    "sql_dialect_group_by_all",
    section="3.EP3",
    oracle=_DIALECT_GROUP_BY_ALL,
)
def sql_dialect_group_by_all(spark, sf_dir):
    """EP3 dialect overlap, modern-extension edition: GROUP BY ALL
    (group on every non-aggregate select item) is a post-ANSI
    convenience both engines accepted independently — the same SQL
    text runs verbatim through spark.sql and as the DuckDB oracle,
    extending the proven overlap beyond the ANSI core. Probed r8:
    QUALIFY and DISTINCT ON remain DuckDB-only (PARSE_SYNTAX_ERROR /
    UNRESOLVED_ROUTINE in Spark 4.1), so those stay OUT of the
    shared-dialect family — the boundary is stated, not guessed."""
    register_views(spark, sf_dir)
    return spark.sql(_DIALECT_GROUP_BY_ALL)


# ---------------------------------------------------------------------------
# subquery_quantified (round 11) — ANY/ALL quantified comparisons via
# the min/max rewrite (Spark has no quantified predicates).
# ---------------------------------------------------------------------------

@query(
    "subquery_quantified",
    section="2.I",
    oracle="""
SELECT p_partkey,
       p_retailprice > ALL (SELECT p_retailprice FROM part
                            WHERE p_brand = 'Brand#9') AS gt_all_brand9,
       p_retailprice < ANY (SELECT p_retailprice FROM part
                            WHERE p_brand = 'Brand#9') AS lt_any_brand9
FROM part
""",
)
def subquery_quantified(spark, sf_dir):
    """Quantified comparison subqueries (> ALL / < ANY) via the
    classic min-max rewrite — Spark SQL has no quantified predicates,
    so `x > ALL(S)` compiles to `n(S) = 0 OR x > max(S)` and
    `x < ANY(S)` to `n(S) > 0 AND x < max(S)` (the fixture column is
    non-null; with nulls the rewrite grows the standard three-valued
    guards, same as subquery_not_in_null documents for NOT IN). The
    subquery collapses to ONE (count, max) scalar row broadcast onto
    the outer scan — the rewrite IS the scale win: a quantified
    predicate never becomes a per-row correlated probe.

    Oracle: DuckDB evaluates the GENUINE > ALL / < ANY predicates, so
    the hash pin proves the rewrite is semantics-preserving, not just
    self-consistent."""
    p = load_table(spark, sf_dir, "part")
    sub = p.filter(F.col("p_brand") == "Brand#9").agg(
        F.count(F.lit(1)).alias("n_sub"), F.max("p_retailprice").alias("mx")
    )
    return p.crossJoin(F.broadcast(sub)).select(
        "p_partkey",
        ((F.col("n_sub") == 0) | (F.col("p_retailprice") > F.col("mx"))).alias(
            "gt_all_brand9"
        ),
        ((F.col("n_sub") > 0) & (F.col("p_retailprice") < F.col("mx"))).alias(
            "lt_any_brand9"
        ),
    )


# ---------------------------------------------------------------------------
# sql_qualify_rewrite (round 11) — QUALIFY via the subquery rewrite
# ---------------------------------------------------------------------------

@query(
    "sql_qualify_rewrite",
    section="2.I",
    oracle="""
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
)
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY n DESC, event_type ASC) <= 2
""",
)
def sql_qualify_rewrite(spark, sf_dir):
    """QUALIFY-clause semantics via the standard rewrite — Spark SQL
    has no QUALIFY (DuckDB/Snowflake/BigQuery do), so the window
    predicate compiles to a derived-table filter over the window
    column. The oracle runs DuckDB's GENUINE QUALIFY, proving the
    rewrite is semantics-preserving (same dialect-parity contract as
    subquery_quantified). Semantics pinned: QUALIFY filters AFTER
    windows evaluate, over the grouped result, with the window's
    deterministic (n desc, type asc) order.

    Scale: the rewrite plans as the standard top-k-per-group
    WindowGroupLimit shape — user-partitioned, rank pruned below the
    sort."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    g = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("user_id", "event_type", "n")
    )


# ---------------------------------------------------------------------------
# sql_distinct_on_rewrite (round 11) — DISTINCT ON via the rank rewrite
# ---------------------------------------------------------------------------

@query(
    "sql_distinct_on_rewrite",
    section="2.I",
    oracle="""
SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
FROM orders
ORDER BY o_custkey, o_totalprice DESC, o_orderkey ASC
""",
)
def sql_distinct_on_rewrite(spark, sf_dir):
    """DISTINCT ON semantics via the rank rewrite — Spark has no
    DISTINCT ON (Postgres/DuckDB do): keep, per customer, the single
    highest-value order (orderkey breaking price ties), compiled to
    the row_number-over-partition filter. The oracle runs DuckDB's
    GENUINE DISTINCT ON with the same ORDER BY, so the pin proves the
    rewrite picks the identical representative row — including the
    tie cases where a naive groupBy(max) would lose the tiebreak.
    Completes the dialect-parity set: QUALIFY, quantified ANY/ALL,
    frame EXCLUDE, and now DISTINCT ON.

    Scale: the standard top-1-per-group WindowGroupLimit shape."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
