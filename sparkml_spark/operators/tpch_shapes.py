"""Composite TPC-H-shaped queries beyond the per-operator inventory —
the shapes a reference user actually runs daily, each combining several
§2 operators (SURVEY §5.1: the de-facto corpus is TPC-H-shaped).

Q13: outer-join + count histogram (customers by order count).
Q18: large-order customers via HAVING-filtered IN.
Q22: anti-join + global scalar average (idle rich customers).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkml_spark.registry import dsum, dsum_sql, query
from sparkml_spark.sources.loader import load_table, load_tables


@query(
    "tpch_q13_shape",
    section="2.C",
    oracle="""
SELECT n_orders, COUNT(*) AS n_customers
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
)
GROUP BY n_orders
""",
)
def tpch_q13_shape(spark, sf_dir):
    """Customer-order-count distribution (Q13): left join with an ON
    residual (orderless customers stay, counted as 0 via
    COUNT(column)'s null-skipping), then a histogram of the counts.
    Two aggs, both with map-side combine."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t.customer.join(
            t.orders,
            (t.customer.c_custkey == t.orders.o_custkey)
            & (t.orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "tpch_q18_shape",
    section="2.C",
    oracle=f"""
SELECT c_custkey, o_orderkey, o_totalprice, {dsum_sql('l_quantity')} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
GROUP BY c_custkey, o_orderkey, o_totalprice
""",
)
def tpch_q18_shape(spark, sf_dir):
    """Large-volume orders (Q18): the IN-set comes from a HAVING-
    filtered aggregation (itself tiny → broadcast semi join), then the
    detail re-aggregates per (customer, order)."""
    t = load_tables(spark, sf_dir)
    big_orders = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("big_okey"))
    )
    return (
        t.lineitem.join(
            F.broadcast(big_orders), t.lineitem.l_orderkey == F.col("big_okey"), "left_semi"
        )
        .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .join(F.broadcast(t.customer), t.orders.o_custkey == t.customer.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity").alias("total_qty"))
    )


@query(
    "tpch_q22_shape",
    section="2.C",
    oracle=f"""
WITH rich AS (
  SELECT * FROM customer
  WHERE c_acctbal > (SELECT {dsum_sql('c_acctbal')} / COUNT(c_acctbal)
                     FROM customer WHERE c_acctbal > 0)
)
SELECT c_mktsegment, COUNT(*) AS n_custs, {dsum_sql('c_acctbal')} AS total_bal
FROM rich r
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = r.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
)
def tpch_q22_shape(spark, sf_dir):
    """Rich customers with no urgent orders (Q22 shape): scalar-average
    threshold (exact decimal, broadcast as a one-row join — never a
    driver-side collect) → anti join against the filtered orders →
    segment rollup. The anti-join side is restricted to URGENT orders
    so the result is non-trivial at every fixture scale (plain
    "no orders at all" is empty — FK coverage is total)."""
    t = load_tables(spark, sf_dir)
    positive = t.customer.filter(F.col("c_acctbal") > 0)
    avg_bal = positive.agg((dsum("c_acctbal") / F.count("c_acctbal")).alias("avg_bal"))
    rich = (
        t.customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
    )
    urgent = t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
    idle = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"), dsum("c_acctbal").alias("total_bal")
    )


@query(
    "tpch_q7_shape",
    section="2.C",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_10')
      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_9'))
)
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_shape(spark, sf_dir):
    """Volume shipping (Q7): bidirectional nation-pair revenue by ship
    year. Both nation legs broadcast; the disjunctive pair predicate
    prunes before the fact join finishes."""
    t = load_tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    df = (
        t.lineitem.join(F.broadcast(t.supplier), t.lineitem.l_suppkey == t.supplier.s_suppkey)
        .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .join(F.broadcast(t.customer), t.orders.o_custkey == t.customer.c_custkey)
        .join(F.broadcast(n1), t.supplier.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), t.customer.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10"))
            | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9"))
        )
    )
    return df.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))


@query(
    "tpch_q21_shape",
    section="2.C",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
""",
)
def tpch_q21_shape(spark, sf_dir):
    """Suppliers who kept orders waiting (Q21): EXISTS + NOT EXISTS
    against the same fact table — the lineitem self-references become
    one semi and one anti join on l_orderkey."""
    t = load_tables(spark, sf_dir)
    l1 = t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    others = t.lineitem.select(
        F.col("l_orderkey").alias("o2_okey"),
        F.col("l_suppkey").alias("o2_skey"),
        F.col("l_shipdate").alias("o2_ship"),
    )
    has_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2_okey")) & (F.col("l_suppkey") != F.col("o2_skey")),
        "left_semi",
    )
    not_latest_elsewhere = has_other.join(
        others,
        (F.col("l_orderkey") == F.col("o2_okey"))
        & (F.col("l_suppkey") != F.col("o2_skey"))
        & (F.col("o2_ship") > F.col("l_shipdate")),
        "left_anti",
    )
    fixed_orders = t.orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return (
        not_latest_elsewhere.join(
            fixed_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
        )
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == t.supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "op_merge_upsert",
    section="2.B",
    oracle="""
WITH updates AS (
  SELECT c_custkey, c_acctbal + 1000 AS new_bal
  FROM customer WHERE c_custkey % 7 = 0
), inserts AS (
  SELECT 9000000 + r_regionkey AS c_custkey, CAST(r_regionkey * 100 AS DOUBLE) AS new_bal
  FROM region
), changes AS (
  SELECT * FROM updates UNION ALL SELECT * FROM inserts
)
SELECT COALESCE(c.c_custkey, ch.c_custkey) AS c_custkey,
       COALESCE(ch.new_bal, c.c_acctbal) AS acctbal,
       CASE WHEN c.c_custkey IS NULL THEN 'inserted'
            WHEN ch.c_custkey IS NULL THEN 'unchanged'
            ELSE 'updated' END AS merge_action
FROM customer c FULL OUTER JOIN changes ch ON c.c_custkey = ch.c_custkey
""",
)
def op_merge_upsert(spark, sf_dir):
    """MERGE/upsert emulation without a table format: full-outer join
    of the base table with a change set, COALESCE picking the new
    value, action column tagging insert/update/unchanged — the CDC
    snapshot shape (with Delta/Iceberg this becomes MERGE INTO; the
    plan — outer join on the key — is identical)."""
    t = load_tables(spark, sf_dir)
    updates = t.customer.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("ch_key"), (F.col("c_acctbal") + 1000).alias("new_bal")
    )
    inserts = t.region.select(
        (F.lit(9000000) + F.col("r_regionkey").cast("bigint")).alias("ch_key"),
        (F.col("r_regionkey") * 100).cast("double").alias("new_bal"),
    )
    changes = updates.unionByName(inserts)
    base = t.customer.select("c_custkey", "c_acctbal")
    merged = base.join(changes, base.c_custkey == changes.ch_key, "full")
    return merged.select(
        F.coalesce(F.col("c_custkey"), F.col("ch_key")).alias("c_custkey"),
        F.coalesce(F.col("new_bal"), F.col("c_acctbal")).alias("acctbal"),
        F.when(F.col("c_custkey").isNull(), "inserted")
        .when(F.col("ch_key").isNull(), "unchanged")
        .otherwise("updated")
        .alias("merge_action"),
    )


@query(
    "supplier_dominant_share",
    section="2.C",
    oracle="""
WITH per AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sup_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS part_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT per.l_partkey AS partkey, per.l_suppkey AS suppkey,
       per.sup_qty, tot.part_qty,
       per.sup_qty / tot.part_qty AS share
FROM per JOIN tot ON per.l_partkey = tot.l_partkey
WHERE per.sup_qty / tot.part_qty > 0.12
""",
)
def supplier_dominant_share(spark, sf_dir):
    """Suppliers shipping >12% of a part's total volume (the Q20
    excess-share flavor adapted to the fixture, which has no partsupp
    table; shares are diluted across ~100 suppliers so the 99th-pct
    share is ~0.12 — threshold chosen to select the dominant tail). Two exact-decimal aggs on shared keys — the second agg
    reuses the first's (partkey) partitioning, so only one wide
    shuffle; the ratio is exact-double/exact-double (deterministic)."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_partkey", "l_suppkey").agg(dsum("l_quantity").alias("sup_qty"))
    tot = li.groupBy("l_partkey").agg(dsum("l_quantity").alias("part_qty"))
    share = F.col("sup_qty") / F.col("part_qty")
    return (
        per.join(tot, "l_partkey")
        .filter(share > 0.12)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            "sup_qty",
            "part_qty",
            share.alias("share"),
        )
    )


@query(
    "profile_table",
    section="2.B",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS d_orderkey,
       COUNT(DISTINCT l_partkey) AS d_partkey,
       COUNT(DISTINCT l_suppkey) AS d_suppkey,
       COUNT(DISTINCT l_returnflag) AS d_returnflag,
       COUNT(DISTINCT l_linestatus) AS d_linestatus,
       COUNT(*) - COUNT(l_quantity) AS nulls_quantity,
       COUNT(*) - COUNT(l_shipdate) AS nulls_shipdate,
       MIN(l_quantity) AS min_quantity,
       MAX(l_quantity) AS max_quantity
FROM lineitem
""",
)
def profile_table(spark, sf_dir):
    """Column-profile of a table in one pass: row count, per-column
    distinct counts, null counts, numeric ranges — the data-quality
    gate every ingestion pipeline runs before training jobs. (At 100 TB
    swap the exact distincts for approx_count_distinct — one scan,
    fixed memory; exact form kept here for the oracle.)"""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("d_orderkey"),
        F.countDistinct("l_partkey").alias("d_partkey"),
        F.countDistinct("l_suppkey").alias("d_suppkey"),
        F.countDistinct("l_returnflag").alias("d_returnflag"),
        F.countDistinct("l_linestatus").alias("d_linestatus"),
        (F.count(F.lit(1)) - F.count("l_quantity")).alias("nulls_quantity"),
        (F.count(F.lit(1)) - F.count("l_shipdate")).alias("nulls_shipdate"),
        F.min("l_quantity").alias("min_quantity"),
        F.max("l_quantity").alias("max_quantity"),
    )
