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
from sparkml_spark.sources.loader import load_tables


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
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = r.c_custkey)
GROUP BY c_mktsegment
""",
)
def tpch_q22_shape(spark, sf_dir):
    """Idle rich customers (Q22): scalar-average threshold (exact
    decimal, one-row broadcast) → anti join against orders → segment
    rollup."""
    t = load_tables(spark, sf_dir)
    positive = t.customer.filter(F.col("c_acctbal") > 0)
    avg_bal = positive.agg(
        (dsum("c_acctbal") / F.count("c_acctbal")).alias("a")
    ).collect()[0]["a"]  # one scalar — the decorrelated subquery value
    rich = t.customer.filter(F.col("c_acctbal") > avg_bal)
    idle = rich.join(t.orders, rich.c_custkey == t.orders.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_custs"), dsum("c_acctbal").alias("total_bal")
    )
