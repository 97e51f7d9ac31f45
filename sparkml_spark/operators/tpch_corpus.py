"""The remaining TPC-H-shaped composites — with `tpch_shapes.py`
(Q13/Q18/Q21/Q22/Q7) and the per-operator inventory (Q1 = flagship
`agg_groupby_multi`, Q3 = `join_inner_equi`, Q5 = `join_multiway_5`)
this completes an adapted 22-query corpus over the driver's TPC-H-ish
fixtures (SURVEY §5.1: the de-facto corpus is TPC-H-shaped).

Adaptations forced by the fixture schema (FIXTURES.md — no partsupp,
no l_shipmode/l_commitdate/l_receiptdate, no p_mfgr/p_container):
part↔supplier relationships ride the lineitem bridge; "supply cost"
becomes observed unit price (l_extendedprice / l_quantity); ship-mode
splits become linestatus splits; commit/receipt lateness becomes
shipdate-vs-orderdate lateness.

Scale notes (per SCALE.md rules): every aggregation is partial→final;
dimension sides (part at 2k-20k rows, supplier, nation, region, and
every HAVING-derived key set) broadcast explicitly; fact⋈fact joins
stay sort-merge under AQE. Scalar subqueries (Q11/Q15/Q17 thresholds)
are single-row broadcasts, not driver round-trips.

Float parity: all money sums go through `dsum` (exact decimal
summation, order-independent — registry docstring); ratios divide two
exact sums as the final operation with identical expression shape on
both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkml_spark.registry import dsum, dsum_sql, query
from sparkml_spark.sources.loader import load_tables

REV = "l_extendedprice * (1 - l_discount)"


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q2_shape",
    section="2.C",
    oracle="""
WITH unit AS (
  SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit_price
  FROM lineitem
), best AS (
  SELECT l_partkey, MIN(unit_price) AS min_unit FROM unit GROUP BY l_partkey
)
SELECT p_partkey, p_brand, min_unit, MIN(l_suppkey) AS suppkey
FROM part
JOIN best ON p_partkey = l_partkey
JOIN unit ON unit.l_partkey = best.l_partkey AND unit_price = min_unit
WHERE p_size <= 5
GROUP BY p_partkey, p_brand, min_unit
""",
)
def tpch_q2_shape(spark, sf_dir):
    """Min-cost supplier per part (Q2 shape, lineitem as the
    part-supplier bridge): correlated MIN subquery decorrelated into
    aggregate + equality join back; deterministic tie-break = MIN
    suppkey among equal-price suppliers. Unit price is a per-row IEEE
    division — bit-identical across engines, so the equality join and
    MIN are exact. Both joins build small (filtered part, per-part
    minima) and broadcast."""
    t = load_tables(spark, sf_dir)
    unit = t.lineitem.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    best = unit.groupBy("l_partkey").agg(F.min("unit_price").alias("min_unit"))
    part = t.part.filter(F.col("p_size") <= 5).select("p_partkey", "p_brand")
    return (
        unit.join(
            F.broadcast(best),
            (unit.l_partkey == best.l_partkey) & (unit.unit_price == best.min_unit),
        )
        .drop(best.l_partkey)
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_brand", "min_unit")
        .agg(F.min("l_suppkey").alias("suppkey"))
    )


@query(
    "tpch_q4_shape",
    section="2.C",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o.o_orderkey
      AND l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
""",
)
def tpch_q4_shape(spark, sf_dir):
    """Priority distribution of slow orders (Q4 shape): EXISTS with a
    correlated non-equi residual → left-semi join (equi key l_orderkey
    carries the hash partitioning; the date comparison rides along as
    a join residual, so no nested-loop). Lateness = shipped >60 days
    after order date (fixture has no commit/receipt dates)."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    return (
        o.join(
            t.lineitem,
            (o.o_orderkey == t.lineitem.l_orderkey)
            & (t.lineitem.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q6_shape",
    section="2.D",
    oracle=f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_shape(spark, sf_dir):
    """Forecast-revenue-change (Q6 shape): pure scan+filter+global agg
    — the canonical pushdown showcase. All four predicates reach the
    parquet scan as PushedFilters and ReadSchema is 4 of 11 columns;
    at 100 TB with date-partitioned layout the two date bounds become
    partition pruning and the scan touches 1/7 of the files."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q8_shape",
    section="2.C",
    oracle=f"""
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       {dsum_sql(f"CASE WHEN sn.n_name = 'FRANCE' THEN {REV} ELSE 0.0 END")}
         / {dsum_sql(REV)} AS mkt_share
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = cn.n_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE r_name = 'EUROPE'
GROUP BY o_year
""",
)
def tpch_q8_shape(spark, sf_dir):
    """National market share (Q8 shape): the share of European-customer
    revenue supplied by one nation, per order year. Conditional
    aggregation — one pass computes both numerator and denominator as
    exact decimal sums; the final double division is the only
    float-order-sensitive op and divides two identical operands on
    both engines. Nation/region/supplier dims broadcast; the
    lineitem⋈orders⋈customer chain is the only shuffle."""
    t = load_tables(spark, sf_dir)
    cn = t.nation.alias("cn")
    sn = (
        t.nation.select(
            F.col("n_nationkey").alias("sn_nationkey"), F.col("n_name").alias("sn_name")
        )
    ).alias("sn")
    df = (
        t.lineitem.join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(t.region), F.col("cn.n_regionkey") == t.region.r_regionkey)
        .join(F.broadcast(t.supplier), t.lineitem.l_suppkey == t.supplier.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_nationkey"))
        .filter(F.col("r_name") == "EUROPE")
    )
    france = F.when(F.col("sn_name") == "FRANCE", _rev()).otherwise(F.lit(0.0))
    return (
        df.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(france) / dsum(_rev())).alias("mkt_share"))
    )


@query(
    "tpch_q9_shape",
    section="2.C",
    oracle=f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       {dsum_sql(f'{REV} - p_retailprice * l_quantity * 0.1')} AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_type = 'PROMO'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
""",
)
def tpch_q9_shape(spark, sf_dir):
    """Product-type profit by supplier nation and year (Q9 shape).
    Supply cost is approximated as 10% of retail price (fixture has no
    partsupp); profit = revenue - cost is per-row IEEE arithmetic with
    identical association order on both engines, then exact-decimal
    summed. part is filtered before the join (pushdown) and broadcast
    with supplier/nation; only lineitem⋈orders shuffles."""
    t = load_tables(spark, sf_dir)
    part = t.part.filter(F.col("p_type") == "PROMO")
    profit = _rev() - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.1)
    return (
        t.lineitem.join(F.broadcast(part), t.lineitem.l_partkey == t.part.p_partkey)
        .join(F.broadcast(t.supplier), t.lineitem.l_suppkey == t.supplier.s_suppkey)
        .join(F.broadcast(t.nation), F.col("s_nationkey") == t.nation.n_nationkey)
        .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(profit).alias("profit"))
    )


@query(
    "tpch_q10_shape",
    section="2.C",
    oracle=f"""
SELECT c_custkey, c_name, n_name, {dsum_sql(REV)} AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def tpch_q10_shape(spark, sf_dir):
    """Returned-item reporting (Q10 shape): top-20 customers by
    returned revenue in a quarter. Revenue is an exact decimal sum, so
    the ORDER BY compares bit-identical doubles on both engines;
    c_custkey tie-break makes the LIMIT cut deterministic. Plans as
    TakeOrderedAndProject over the aggregate — no global sort."""
    t = load_tables(spark, sf_dir)
    o = t.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    return (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(o, t.lineitem.l_orderkey == o.o_orderkey)
        .join(t.customer, o.o_custkey == t.customer.c_custkey)
        .join(F.broadcast(t.nation), F.col("c_nationkey") == t.nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q11_shape",
    section="2.C",
    oracle=f"""
WITH pv AS (
  SELECT l_suppkey, l_partkey,
         {dsum_sql('p_retailprice * l_quantity')} AS value
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY l_suppkey, l_partkey
)
SELECT l_suppkey, l_partkey, value
FROM pv
WHERE value > (SELECT {dsum_sql('value')} * 2.0 / COUNT(*) FROM pv)
""",
)
def tpch_q11_shape(spark, sf_dir):
    """Important inventory positions (Q11 shape): (supplier, part)
    pairs whose shipped value exceeds twice the average position value
    (scale-free — a fixed fraction-of-total cut degenerates as group
    count grows with SF). The scalar threshold is a 1-row aggregate
    cross-joined (broadcast) onto the grouped values — no driver
    round-trip, no collect. Both sides of the comparison derive from
    exact decimal sums, so the cut is engine-stable."""
    t = load_tables(spark, sf_dir)
    val = F.col("p_retailprice") * F.col("l_quantity")
    joined = t.lineitem.join(F.broadcast(t.part), t.lineitem.l_partkey == t.part.p_partkey)
    pv = joined.groupBy("l_suppkey", "l_partkey").agg(dsum(val).alias("value"))
    thresh = pv.agg((dsum("value") * F.lit(2.0) / F.count(F.lit(1))).alias("thresh"))
    return pv.join(F.broadcast(thresh)).filter(F.col("value") > F.col("thresh")).drop("thresh")


@query(
    "tpch_q12_shape",
    section="2.C",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
)
def tpch_q12_shape(spark, sf_dir):
    """Shipping-priority split of late lineitems (Q12 shape;
    linestatus stands in for the fixture's missing shipmode).
    Integer conditional counts — no float concerns. The non-equi
    lateness predicate is a post-join residual on the equi join."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    return (
        li.join(
            t.orders,
            (li.l_orderkey == t.orders.o_orderkey)
            & (li.l_shipdate > t.orders.o_orderdate + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_shape",
    section="2.D",
    oracle=f"""
SELECT {dsum_sql(f"CASE WHEN p_type = 'PROMO' THEN {REV} ELSE 0.0 END")} * 100.0
         / {dsum_sql(REV)} AS promo_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def tpch_q14_shape(spark, sf_dir):
    """Promotion revenue share (Q14 shape): percent of one month's
    revenue from PROMO-type parts. Single conditional aggregation;
    part broadcasts; expression shape (exact_sum * 100.0 / exact_sum)
    is identical on both engines so the one double division agrees."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(t.part), li.l_partkey == t.part.p_partkey).agg(
            (dsum(promo) * F.lit(100.0) / dsum(_rev())).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q15_shape",
    section="2.C",
    oracle=f"""
WITH srev AS (
  SELECT l_suppkey, {dsum_sql(REV)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN srev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM srev)
""",
)
def tpch_q15_shape(spark, sf_dir):
    """Top supplier by quarterly revenue (Q15 shape): revenue view +
    scalar MAX subquery, keeping ALL ties (exact sums make the
    equality engine-stable). The max is a 1-row broadcast onto the
    per-supplier aggregate; supplier dim broadcasts onto the
    winners."""
    t = load_tables(spark, sf_dir)
    srev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(_rev()).alias("total_revenue"))
    )
    mx = srev.agg(F.max("total_revenue").alias("mx"))
    return (
        srev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q16_shape",
    section="2.C",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
""",
)
def tpch_q16_shape(spark, sf_dir):
    """Supplier diversity per brand/size (Q16 shape; lineitem is the
    part-supplier bridge). NOT IN over a null-free key column =
    left-anti join against the (tiny, broadcast) excluded-supplier
    set; COUNT(DISTINCT) expands to Spark's two-phase distinct
    aggregate — partial per partition, exchange on the group keys."""
    t = load_tables(spark, sf_dir)
    part = t.part.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = t.supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t.lineitem.join(F.broadcast(part), t.lineitem.l_partkey == t.part.p_partkey)
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_shape",
    section="2.C",
    oracle=f"""
WITH avgq AS (
  SELECT l_partkey AS ap, {dsum_sql('l_quantity')} / COUNT(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly, COUNT(*) AS n_small
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avgq ON ap = l_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.5 * avg_qty
""",
)
def tpch_q17_shape(spark, sf_dir):
    """Small-lot revenue (Q17 shape): lineitems under half the
    part's average quantity. The correlated AVG decorrelates into a
    per-part aggregate joined back (broadcast — one row per part);
    avg = exact_sum / count so the 0.5× threshold compares the same
    double on both engines."""
    t = load_tables(spark, sf_dir)
    avgq = (
        t.lineitem.groupBy(F.col("l_partkey").alias("ap"))
        .agg((dsum("l_quantity") / F.count("l_quantity")).alias("avg_qty"))
    )
    part = t.part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    return (
        t.lineitem.join(F.broadcast(part), t.lineitem.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(avgq), t.lineitem.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "tpch_q19_shape",
    section="2.C",
    oracle=f"""
SELECT {dsum_sql(REV)} AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 16 AND 30
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 31 AND 50
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_shape(spark, sf_dir):
    """Discounted-revenue over disjunctive criteria (Q19 shape):
    three OR'd conjunction groups spanning both join sides. Catalyst
    pushes the common-column disjunctions to each scan (brand/size
    bounds to part, quantity bounds to lineitem) and keeps the full
    predicate as the join residual — the classic OR-pushdown test."""
    t = load_tables(spark, sf_dir)
    b = lambda br, lo, hi, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == br)
        & F.col("p_size").between(lo, hi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cond = b("Brand#3", 1, 15, 1, 11) | b("Brand#13", 16, 30, 10, 20) | b(
        "Brand#23", 31, 50, 20, 30
    )
    return (
        t.lineitem.join(F.broadcast(t.part), t.lineitem.l_partkey == t.part.p_partkey)
        .filter(cond)
        .agg(dsum(_rev()).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "tpch_q20_shape",
    section="2.C",
    oracle=f"""
WITH shipped AS (
  SELECT l_suppkey, l_partkey, {dsum_sql('l_quantity')} AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey, l_partkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON n_nationkey = s_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM shipped
  JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'ECONOMY' AND qty > 60
)
""",
)
def tpch_q20_shape(spark, sf_dir):
    """High-volume suppliers of a product line (Q20 shape): nested
    semi-join chain — per-(supplier, part) yearly quantity, filtered
    to ECONOMY parts over a volume threshold, then IN → left-semi
    onto the supplier dim. Every derived key set is small and
    broadcast; the only shuffle is the (suppkey, partkey) aggregate.
    Exact decimal quantity sums make the >100 cut engine-stable."""
    t = load_tables(spark, sf_dir)
    shipped = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("qty"))
    )
    econ = t.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    keys = (
        shipped.join(F.broadcast(econ), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
    )
    return (
        t.supplier.join(F.broadcast(keys), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(t.nation), F.col("s_nationkey") == t.nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )
