"""§2.E Window functions (SURVEY.md).

One physical shape for all of these: shuffle on partitionBy keys, sort
within partitions, single streaming pass. Determinism rules (SURVEY
§7.4 #4) applied throughout: every orderBy carries a unique tie-break
key (PK / event_id), and windowed SUMs over doubles go through the
exact decimal pattern (a windowed double sum is order-sensitive AND
engines use different accumulation structures — DuckDB segment trees
vs Spark's streaming frame — so raw double frames can drift).

Scale: window partitions here are per-customer / per-user / per-segment
— thousands of small partitions, embarrassingly parallel. The one to
watch at 100 TB is a window with few giant partitions; for that case
pre-aggregate or split frames (noted on win_sessionize_batch).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkml_spark.registry import query
from sparkml_spark.sources.loader import load_table

_DEC = "decimal(14,2)"

# Elapsed whole seconds between prev_ts and ts. Spark's timestampdiff
# and DuckDB's date_diff disagree on sub-second boundaries (elapsed
# floor vs boundary crossings), so both sides use the same explicit
# epoch-microsecond floor-division formula.
_GAP_S = "(unix_micros(cast(ts as timestamp)) - unix_micros(cast(prev_ts as timestamp))) div 1000000"


@query(
    "win_rank_family",
    section="2.E",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       row_number()   OVER w AS rn,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       percent_rank() OVER w AS prnk,
       ntile(4)       OVER w AS quartile,
       cume_dist()    OVER w AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
)
def win_rank_family(spark, sf_dir):
    """All six ranking functions over one totally-ordered window (the
    c_custkey tie-break makes every rank single-valued)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "win_lag_lead",
    section="2.E",
    oracle="""
SELECT event_id, user_id, ts,
       lag(ts)  OVER w AS prev_ts,
       lead(ts) OVER w AS next_ts,
       (epoch_us(ts) - epoch_us(lag(ts) OVER w)) // 1000000 AS gap_s
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def win_lag_lead(spark, sf_dir):
    """Previous/next event per user + inter-event gap in seconds."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("next_ts", F.lead("ts").over(w))
        .select(
            "event_id",
            "user_id",
            "ts",
            "prev_ts",
            "next_ts",
            F.expr(_GAP_S).alias("gap_s"),
        )
    )


@query(
    "win_first_last_nth",
    section="2.E",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       first_value(c_name)    OVER w AS richest,
       last_value(c_name)     OVER w AS poorest,
       nth_value(c_name, 2)   OVER w AS runner_up
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_first_last_nth(spark, sf_dir):
    """Frame-aware positional values — the explicit unbounded frame is
    the whole point (default frame would make last_value = current row)."""
    c = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.first("c_name").over(w).alias("richest"),
        F.last("c_name").over(w).alias("poorest"),
        F.nth_value("c_name", 2).over(w).alias("runner_up"),
    )


@query(
    "win_running_total",
    section="2.E",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
""",
)
def win_running_total(spark, sf_dir):
    """Cumulative customer spend, exact-decimal so every prefix matches
    bit-for-bit regardless of each engine's accumulation structure."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("running_spend"),
    )


@query(
    "win_moving_avg",
    section="2.E",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def win_moving_avg(spark, sf_dir):
    """4-order sliding average (exact decimal sum / window count — the
    division is then identical double math on both engines)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    msum = F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (msum / F.count(F.lit(1)).over(w)).alias("moving_avg"),
    )


@query(
    "win_range_frame",
    section="2.E",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                      RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k
FROM orders
""",
)
def win_range_frame(spark, sf_dir):
    """Logical (value-based) frame: orders within $1000 below the
    current price. Value frames are set-defined, so ties need no
    tie-break — the frame is identical for equal keys."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
    )


@query(
    "win_topk_per_group",
    section="2.E",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice
FROM (
  SELECT c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM customer JOIN orders ON o_custkey = c_custkey
)
WHERE rn <= 3
""",
)
def win_topk_per_group(spark, sf_dir):
    """Top-3 orders per customer (QUALIFY pattern). BASELINE's
    q_window_rank shape. At scale Spark pushes a per-partition rank
    limit before the final sort when AQE sees the filter."""
    t_c = load_table(spark, sf_dir, "customer")
    t_o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        t_c.join(t_o, t_c.c_custkey == t_o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@query(
    "win_topk_per_group_100",
    section="2.E",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice
FROM (
  SELECT c_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM customer JOIN orders ON o_custkey = c_custkey
)
WHERE rn <= 3
ORDER BY c_custkey, o_orderkey
LIMIT 100
""",
)
def win_topk_per_group_100(spark, sf_dir):
    """BASELINE.md's exact q_window_rank shape: top-3 per customer
    capped to a deterministic global 100 rows (ORDER BY + LIMIT →
    TakeOrderedAndProject on top of the window, never a full sort).
    Registered so BENCH_r{N} measures the same 100-row output the
    baseline published; `win_topk_per_group` keeps the uncapped
    QUALIFY semantics."""
    t_c = load_table(spark, sf_dir, "customer")
    t_o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        t_c.join(t_o, t_c.c_custkey == t_o.o_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy("c_custkey", "o_orderkey")
        .limit(100)
    )


@query(
    "win_dedup_latest",
    section="2.E",
    oracle="""
SELECT user_id, event_id, ts, event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def win_dedup_latest(spark, sf_dir):
    """Latest event per user — the classic CDC/log-compaction dedup."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@query(
    "win_sessionize_batch",
    section="2.E",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(SUM(CASE WHEN prev_ts IS NULL
                  OR (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 > 1800 THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
""",
)
def win_sessionize_batch(spark, sf_dir):
    """Gap-based sessionization (30-min gap): lag → new-session flag →
    cumulative sum. Batch twin of stream_session_window; the two are
    cross-checked in tests. Giant single-user partitions at 100 TB:
    split by (user, day) first, then stitch boundary sessions."""
    e = load_table(spark, sf_dir, "events")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_s = F.expr(_GAP_S)
    new_sess = F.when(F.col("prev_ts").isNull() | (gap_s > 1800), 1).otherwise(0)
    return (
        e.withColumn("prev_ts", F.lag("ts").over(w_order))
        .withColumn("session_id", F.sum(new_sess).over(w_cum))
        .select("event_id", "user_id", "ts", "session_id")
    )


@query(
    "win_zscore_anomaly",
    section="2.E",
    oracle="""
WITH stats AS (
  SELECT event_id, user_id, value,
         CAST(SUM(CAST(value AS DECIMAL(12,2)))
              OVER w AS DOUBLE) AS sx,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
              OVER w AS DOUBLE) AS sxx,
         COUNT(*) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, value, z
FROM (
  SELECT event_id, user_id, value, n,
         round((value - sx / n)
               / sqrt(((sxx - sx * sx / n) / (n - 1))), 6) AS z
  FROM stats WHERE n >= 10
)
WHERE abs(z) > 2.5
""",
)
def win_zscore_anomaly(spark, sf_dir):
    """Streaming-style anomaly flag on the bounded events table: each
    value scored against the trailing-20-row mean/stddev per user;
    |z| > 2.5 flags. The frame sums go through the cents-grid decimal
    pattern (exact, order-independent — registry docstring) so the
    sliding-window recombination is engine-identical; the one
    double/sqrt chain rounds at 6 dp and the flag filter compares the
    ROUNDED score, pinning the boundary on both engines.

    Scale: single hash-partition by user_id, linear frame maintenance
    — the batch twin of a `transformWithState` rolling detector."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    vd = F.col("value").cast("decimal(12,2)")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    sx = F.sum(vd).over(w).cast("double")
    sxx = F.sum(vd * vd).over(w).cast("double")
    n = F.count(F.lit(1)).over(w)
    stats = e.select("event_id", "user_id", "value", sx.alias("sx"), sxx.alias("sxx"), n.alias("n"))
    z = F.round(
        (F.col("value") - F.col("sx") / F.col("n"))
        / F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)),
        6,
    )
    return (
        stats.filter(F.col("n") >= 10)
        .select("event_id", "user_id", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 2.5)
    )


@query(
    "win_gaps_islands",
    section="2.E",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d FROM events
), r AS (
  SELECT user_id, d,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
  FROM days
), isl AS (
  SELECT user_id, d - CAST(rn AS INT) AS grp,
         COUNT(*) AS run_len, MIN(d) AS run_start
  FROM r GROUP BY user_id, d - CAST(rn AS INT)
)
SELECT user_id,
       COUNT(*) AS n_islands,
       MAX(run_len) AS longest_run,
       CAST(SUM(run_len) AS BIGINT) AS n_active_days,
       MIN(run_start) AS first_run_start
FROM isl GROUP BY user_id
""",
)
def win_gaps_islands(spark, sf_dir):
    """Gaps-and-islands: consecutive-day activity runs per user via
    the classic date-minus-row_number grouping trick (consecutive days
    share `d - rn`), then per-user streak stats — retention/engagement
    analysis without any self-join. Two shuffles total (distinct days,
    then the user window); the window state is one row per active day,
    bounded per user."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    r = days.withColumn("rn", F.row_number().over(w))
    isl = (
        r.withColumn("grp", F.date_sub(F.col("d"), F.col("rn")))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"), F.min("d").alias("run_start"))
    )
    return isl.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_len").alias("longest_run"),
        F.sum("run_len").alias("n_active_days"),
        F.min("run_start").alias("first_run_start"),
    )


@query(
    "win_interval_overlap",
    section="2.E",
    oracle="""
WITH pts AS (
  SELECT event_type, ts AS t, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 10 MINUTE AS t, -1 AS delta, event_id
  FROM events
), sweep AS (
  SELECT event_type,
         SUM(delta) OVER (
           PARTITION BY event_type
           ORDER BY t, delta DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS concurrent
  FROM pts
)
SELECT event_type,
       CAST(MAX(concurrent) AS BIGINT) AS max_concurrent,
       COUNT(*) FILTER (WHERE TRUE) / 2 AS n_intervals
FROM sweep GROUP BY event_type
""",
)
def win_interval_overlap(spark, sf_dir):
    """Max-concurrency via sweep line: each event is a 10-minute
    interval; +1/-1 boundary points, running sum per event_type, max =
    peak simultaneous intervals. THE scalable interval-overlap shape —
    O(n log n) sort instead of the O(n^2) interval self-join
    (join_interval exists for the pairwise form). Tie order (t, +1
    before -1, event_id) makes touching intervals count as overlapping
    and the sweep deterministic cross-engine."""
    e = load_table(spark, sf_dir, "events")
    starts = e.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = e.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("t"), F.col("delta").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sweep = starts.unionByName(ends).select(
        "event_type", F.sum("delta").over(w).alias("concurrent")
    )
    return sweep.groupBy("event_type").agg(
        F.max("concurrent").cast("bigint").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).alias("n_intervals"),
    )


# ---------------------------------------------------------------------------
# win_user_streaks (round 11) — calendar gaps-and-islands per user
# ---------------------------------------------------------------------------

@query(
    "win_user_streaks",
    section="2.E",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
), islands AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS island
  FROM days
), runs AS (
  SELECT user_id, island, COUNT(*) AS len,
         MIN(d) AS streak_start
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(MAX(len) AS BIGINT) AS longest_streak_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       MIN(CASE WHEN len = (SELECT MAX(r2.len) FROM runs r2
                            WHERE r2.user_id = runs.user_id)
                THEN streak_start END) AS best_streak_start
FROM runs GROUP BY user_id
""",
)
def win_user_streaks(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands: distinct (user, day) → day minus the per-user
    day ordinal is CONSTANT within a consecutive run (subtracting a
    ramp from a ramp), so the difference IS the island key; one
    group-by per island, one per user. Reports longest streak, total
    streak count, and the (earliest) start date of a longest streak —
    deterministic under ties by MIN.

    Scale: windows are user-partitioned (never corpus-wide), islands
    collapse map-side, and the whole op rides the events table's
    natural user bucketing. Giant single-user partitions: same
    (user, day) pre-split note as win_sessionize_batch."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("streak_start")
    )
    w_best = Window.partitionBy("user_id")
    return (
        runs.withColumn("max_len", F.max("len").over(w_best))
        .groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_streak_days"),
            F.count(F.lit(1)).cast("long").alias("n_streaks"),
            F.min(
                F.when(F.col("len") == F.col("max_len"), F.col("streak_start"))
            ).alias("best_streak_start"),
        )
    )


# ---------------------------------------------------------------------------
# win_running_distinct (round 11) — running distinct count without a
# distinct-over-window (which neither engine has): first-occurrence
# flag + running sum.
# ---------------------------------------------------------------------------

@query(
    "win_running_distinct",
    section="2.E",
    oracle="""
WITH flagged AS (
  SELECT event_id, user_id, ts,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id,
       CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS BIGINT)
         AS n_types_so_far
FROM flagged
""",
)
def win_running_distinct(spark, sf_dir):
    """Running distinct count (how many distinct event types has this
    user produced up to and including each event) — the classic
    construction for a COUNT(DISTINCT) OVER that no engine supports
    directly: flag each (user, type)'s first occurrence with a
    row_number window, then running-sum the flags per user. Both
    windows are keyed and tie-broken (ts, event_id), fully
    deterministic.

    Scale: two windows, both partitioned by user (plus type for the
    flag) — bounded per-user groups, never a corpus-wide window; at
    100 TB this is exactly two hash-partitioned sorts, and the flag
    window's (user, type) partitioning subsumes the second's, so AQE
    reuses the exchange where stats allow."""
    e = load_table(spark, sf_dir, "events")
    wflag = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.row_number().over(wflag) == 1, 1).otherwise(0).alias("first_seen"),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("first_seen").over(wrun).cast("long").alias("n_types_so_far"),
        )
    )


# ---------------------------------------------------------------------------
# win_bollinger_bands (round 11) — rolling mean ± 2σ, exact int algebra
# ---------------------------------------------------------------------------

@query(
    "win_bollinger_bands",
    section="2.E",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
), rolled AS (
  SELECT event_type, d, c,
         CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
         CAST(SUM(c) OVER w AS BIGINT) AS s,
         CAST(SUM(c * c) OVER w AS BIGINT) AS ss
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, d, c, n_win,
       round(CAST(s AS DOUBLE) / n_win, 6) AS ma,
       round(CAST(s AS DOUBLE) / n_win
             + 2 * sqrt(CAST(n_win * ss - s * s AS DOUBLE)
                        / (CAST(n_win AS DOUBLE) * n_win)), 6) AS upper_band,
       round(CAST(s AS DOUBLE) / n_win
             - 2 * sqrt(CAST(n_win * ss - s * s AS DOUBLE)
                        / (CAST(n_win AS DOUBLE) * n_win)), 6) AS lower_band
FROM rolled
""",
)
def win_bollinger_bands(spark, sf_dir):
    """Bollinger bands (rolling mean ± 2 population σ over a 7-row
    window) on the per-type daily series — the volatility-band shape
    every monitoring dashboard draws. Determinism without float
    windows: the rolling SUM and SUM-OF-SQUARES are exact integer
    window aggregates, variance is the cleared form
    (n·Σc² − (Σc)²)/n² evaluated in one double expression, and sqrt
    is IEEE exactly-rounded — so both engines produce bit-identical
    bands with no per-row float accumulation anywhere.

    Scale: the corpus-sized stage is the daily partial aggregation;
    the window runs on (type, day) series rows — bounded partitions,
    rows-frame (no range scan), one shuffle on event_type."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    rolled = daily.select(
        "event_type",
        "d",
        "c",
        F.count(F.lit(1)).over(w).cast("long").alias("n_win"),
        F.sum("c").over(w).cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).cast("long").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_win")
    sd = F.sqrt(
        (F.col("n_win") * F.col("ss") - F.col("s") * F.col("s")).cast("double")
        / (F.col("n_win").cast("double") * F.col("n_win"))
    )
    return rolled.select(
        "event_type",
        "d",
        "c",
        "n_win",
        F.round(mean, 6).alias("ma"),
        F.round(mean + 2 * sd, 6).alias("upper_band"),
        F.round(mean - 2 * sd, 6).alias("lower_band"),
    )


# ---------------------------------------------------------------------------
# win_exponential_decay (round 11) — recency-weighted engagement, exact
# because the decay base is a power of two.
# ---------------------------------------------------------------------------

@query(
    "win_exponential_decay",
    section="2.E",
    oracle="""
WITH aged AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS v_cents,
         date_diff('day', CAST(date_trunc('day', ts) AS DATE), DATE '2024-01-31')
           AS age_days
  FROM events
), weighted AS (
  SELECT user_id,
         CAST(v_cents AS DOUBLE) / power(2.0, age_days // 7) AS wv
  FROM aged
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(CAST(SUM(CAST(round(wv, 9) AS DECIMAL(30,9))) AS DOUBLE), 6)
         AS decay_score
FROM weighted GROUP BY user_id
""",
)
def win_exponential_decay(spark, sf_dir):
    """Recency-decayed engagement score per user: each event
    contributes value · 2^(−⌊age_days/7⌋) — halving per week of age,
    the standard recency weighting behind feed ranking and churn
    scores. The decay base is DELIBERATELY 2: dividing a double by a
    power of two only decrements the exponent (no mantissa rounding),
    so each weighted term is EXACT in both engines — no pow()/exp()
    transcendental anywhere (the pipeline_mix_temperature principle).
    Terms are 9dp-quantized and decimal-summed for order
    independence; ages are integer days against the fixed horizon
    2024-01-31 (the fixture's last day).

    Scale: one scan, one user-keyed partial aggregation — a
    trillion-event decay scoreboard is a map-side-combined GROUP BY."""
    e = load_table(spark, sf_dir, "events")
    aged = e.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("v_cents"),
        F.datediff(
            F.lit("2024-01-31").cast("date"),
            F.date_trunc("day", F.col("ts")).cast("date"),
        ).alias("age_days"),
    )
    wv = F.col("v_cents").cast("double") / F.pow(
        F.lit(2.0), F.expr("age_days DIV 7").cast("double")
    )
    return (
        aged.select("user_id", wv.alias("wv"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("wv"), 9).cast("decimal(30,9)")).cast("double"),
                6,
            ).alias("decay_score"),
        )
    )


# ---------------------------------------------------------------------------
# win_frame_exclude_rewrite (round 11) — EXCLUDE CURRENT ROW via algebra
# ---------------------------------------------------------------------------

@query(
    "win_frame_exclude_rewrite",
    section="2.E",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
)
SELECT event_type, d, c,
       CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                         EXCLUDE CURRENT ROW) AS BIGINT) AS neighbor_sum,
       CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY d
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
                           EXCLUDE CURRENT ROW) AS BIGINT) AS n_neighbors
FROM daily
""",
)
def win_frame_exclude_rewrite(spark, sf_dir):
    """Window-frame EXCLUDE CURRENT ROW via the subtraction rewrite —
    Spark has no frame-exclusion clause (DuckDB/Postgres do), so
    neighbor aggregates (the leave-one-out frame behind smoothing and
    peer-comparison features) compile to full-frame aggregate MINUS
    the current row's contribution: SUM−c and COUNT−1. The oracle
    runs DuckDB's GENUINE EXCLUDE CURRENT ROW, proving the rewrite
    semantics-preserving over ±3-row frames including the truncated
    edges (the sql_qualify_rewrite / subquery_quantified dialect-pin
    contract). Integer window sums, exact by construction.

    Scale: one daily partial agg, then per-type series windows —
    bounded partitions."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    return daily.select(
        "event_type",
        "d",
        "c",
        (F.sum("c").over(w) - F.col("c")).cast("long").alias("neighbor_sum"),
        (F.count(F.lit(1)).over(w) - 1).cast("long").alias("n_neighbors"),
    )


# ---------------------------------------------------------------------------
# win_moving_median (round 11) — order-statistic smoothing via the
# collect-sort rewrite, pinned against the engine's windowed quantile.
# ---------------------------------------------------------------------------

@query(
    "win_moving_median",
    section="2.E",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
)
SELECT event_type, d, c,
       CAST(quantile_disc(c, 0.5) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS moving_median
FROM daily
""",
)
def win_moving_median(spark, sf_dir):
    """Trailing 7-row moving MEDIAN of the per-type daily series —
    the robust smoother a spike-ridden metric needs where the moving
    mean (win_moving_avg) chases outliers. Spark has no order-statistic
    window aggregate, so the median is the collect-sort rewrite:
    sort_array(collect_list(c) OVER frame)[(n+1) DIV 2] — the lower
    median, matching DuckDB's GENUINE windowed quantile_disc(0.5)
    exactly on both odd and even warm-up frames (the dialect-pin
    contract: engine primitive vs rewrite). Integer series ⇒ exact.

    Scale: per-type series partitions; the collected frame is ≤7
    elements by construction, so the rewrite's memory is bounded by
    the frame, not the partition — the one shape where collect_list
    inside a window is legitimate."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("d")
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(-6, Window.currentRow)
    frame = F.sort_array(F.collect_list("c").over(w))
    return daily.select(
        "event_type",
        "d",
        "c",
        F.element_at(frame, ((F.size(frame) + 1) / 2).cast("int"))
        .cast("long")
        .alias("moving_median"),
    )
