"""Event-sequence analytics over the stream table: ordered funnels and
cohort retention — the product-analytics workloads that sit beside the
LLM pipeline in a real deployment (§2.I/§2.K adjunct; all ORACLE).

Scale shape: every op here is per-user aggregation (conditional mins /
first-seen) followed by tiny-dimension joins — one shuffle on user_id,
then broadcast-size results. No self-join over raw events is ever
needed for ordered-sequence matching: conditional aggregation carries
the ordering.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparkml_spark.registry import dsum, dsum_sql, query
from sparkml_spark.sources.loader import load_table


@query(
    "funnel_ordered_steps",
    section="2.I",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t_view
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
  GROUP BY e.user_id
)
SELECT s1.user_id AS user_id, s1.t_view, s2.t_click, s3.t_purchase,
       s2.user_id IS NOT NULL AS reached_click,
       s3.user_id IS NOT NULL AS reached_purchase
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
""",
)
def funnel_ordered_steps(spark, sf_dir):
    """Ordered 3-step funnel (view → click → purchase): each stage is
    the earliest qualifying event strictly after the previous stage's
    timestamp — conditional-min chaining, no event self-join."""
    e = load_table(spark, sf_dir, "events")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        e.join(s1, "user_id")
        .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        e.join(s2, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.col("t_click").isNotNull().alias("reached_click"),
            F.col("t_purchase").isNotNull().alias("reached_purchase"),
        )
    )


@query(
    "cohort_retention",
    section="2.I",
    oracle="""
WITH firsts AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         date_diff('day', f.cohort_day, CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset
  FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT cohort_day, day_offset, COUNT(*) AS n_active_users
FROM activity
WHERE day_offset <= 7
GROUP BY cohort_day, day_offset
""",
)
def cohort_retention(spark, sf_dir):
    """Daily cohort retention (first 7 offsets): users grouped by
    first-seen day, counted per subsequent active day. The classic
    retention triangle as two aggs and one join (the `firsts` side is
    user-cardinality — at 100 TB it's the smaller side and can be
    bucketed by user_id alongside the events table)."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("cohort_day")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(
                F.date_trunc("day", F.col("ts")).cast("date"), F.col("cohort_day")
            ).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@query(
    "win_running_extremes",
    section="2.E",
    oracle="""
SELECT o_custkey, o_orderkey,
       MAX(o_totalprice) OVER w AS running_max,
       MIN(o_totalprice) OVER w AS running_min,
       o_totalprice >= MAX(o_totalprice) OVER w AS is_new_high
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def win_running_extremes(spark, sf_dir):
    """Running max/min spend per customer + new-high flag (monotone
    frame aggregates — order-insensitive within the frame, so exact
    cross-engine without decimal tricks)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rmax = F.max("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        rmax.alias("running_max"),
        F.min("o_totalprice").over(w).alias("running_min"),
        (F.col("o_totalprice") >= rmax).alias("is_new_high"),
    )


@query(
    "events_markov_transitions",
    section="2.I",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS cur,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
), pairs AS (
  SELECT cur, nxt, COUNT(*) AS n FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
), tot AS (
  SELECT cur, SUM(n) AS n_out FROM pairs GROUP BY cur
)
SELECT p.cur, p.nxt, p.n,
       round(CAST(p.n AS DOUBLE) / CAST(t.n_out AS DOUBLE), 6) AS p_next
FROM pairs p JOIN tot t ON p.cur = t.cur
""",
)
def events_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of user event sequences:
    P(next event type | current) from per-user chronological lead
    pairs (ties broken by event_id). The behavioral-model input next
    to funnels/retention. One window shuffle on user_id (state = one
    row lookahead), then counts over a 25-cell key space — partials
    collapse everything map-side; the totals join is broadcast-sized."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("n_out"))
    return pairs.join(F.broadcast(tot), "cur").select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n").cast("double") / F.col("n_out").cast("double"), 6).alias(
            "p_next"
        ),
    )


@query(
    "events_rfm_segmentation",
    section="2.I",
    oracle="""
WITH rfm AS (
  SELECT user_id,
         MAX(ts) AS last_purchase,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS monetary
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
), scored AS (
  SELECT user_id, last_purchase, frequency, monetary,
         NTILE(4) OVER (ORDER BY last_purchase, user_id) AS r_q,
         NTILE(4) OVER (ORDER BY frequency, user_id) AS f_q,
         NTILE(4) OVER (ORDER BY monetary, user_id) AS m_q
  FROM rfm
)
SELECT user_id, last_purchase, frequency, monetary,
       r_q, f_q, m_q,
       CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR) || CAST(m_q AS VARCHAR)
         AS rfm_segment
FROM scored
""",
)
def events_rfm_segmentation(spark, sf_dir):
    """RFM segmentation: per-user recency/frequency/monetary over
    purchases, each quartiled with NTILE (ties broken by user_id so
    the bucketing is deterministic cross-engine), concatenated into
    the classic '444'-style segment label. One shuffle to aggregate
    per user; the three quartile assignments use ntile_two_phase
    (registry.py) rather than engine NTILE — a global NTILE over the
    user rollup is a single-partition sort of user-cardinality rows
    (billions at 100 TB; the smell the r11 ×100 stress caught on
    ml_lift_gain_table), while the decomposition's only global window
    runs on bounded bucket grids (day / raw count / dollar band) with
    per-bucket refinement. Hash-matched against the oracle's GENUINE
    NTILEs, so the decomposition is proven bit-equal."""
    from sparkml_spark.registry import ntile_grid_prefix, ntile_rank_expr

    e = load_table(spark, sf_dir, "events")
    rfm = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_purchase"),
            F.count(F.lit(1)).alias("frequency"),
            dsum("value").alias("monetary"),
        )
    )
    # r13 restructure (guide §2.4): the three quartile metrics used to
    # CHAIN ntile_two_phase calls, so phase k's bucket grid aggregated
    # over phase k-1's full join+window output — the per-user rollup
    # was re-evaluated multiplicatively down the chain. Now all three
    # bucket columns are stamped on ONE shared frame and each metric's
    # grid aggregates that same subtree (the physical planner reuses
    # the rollup's exchange across the three grid scans); only the
    # three per-metric row_number windows — the irreducible part of an
    # exact three-axis NTILE — reshuffle the user-level rows. The tile
    # arithmetic is the registry decomposition verbatim, so the result
    # stays bit-identical to the oracle's genuine NTILEs.
    specs = [
        ("r_q", F.date_trunc("day", F.col("last_purchase")),
         [F.col("last_purchase").asc(), F.col("user_id").asc()]),
        ("f_q", F.col("frequency"),
         [F.col("frequency").asc(), F.col("user_id").asc()]),
        ("m_q", F.floor(F.col("monetary") / 100),
         [F.col("monetary").asc(), F.col("user_id").asc()]),
    ]
    base = rfm
    for out, bucket, _ in specs:
        base = base.withColumn(f"__b_{out}", bucket)
    scored = base
    for out, _, order_cols in specs:
        b = f"__b_{out}"
        pre = ntile_grid_prefix(base, b)
        win = Window.partitionBy(b).orderBy(*order_cols)
        scored = (
            scored.join(pre, b)
            .withColumn(
                "__r",
                (F.col("__before") + F.row_number().over(win)).cast("long"),
            )
            .withColumn(out, ntile_rank_expr(4).cast("int"))
            .drop(b, "__before", "__n_all", "__r")
        )
    return scored.select(
        "user_id",
        "last_purchase",
        "frequency",
        "monetary",
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("rfm_segment"),
    )


@query(
    "events_top_paths",
    section="2.I",
    oracle="""
WITH seq AS (
  SELECT event_type AS e1,
         LEAD(event_type, 1) OVER w AS e2,
         LEAD(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), paths AS (
  SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n
  FROM seq WHERE e3 IS NOT NULL
  GROUP BY e1 || '>' || e2 || '>' || e3
)
SELECT path, n FROM paths ORDER BY n DESC, path LIMIT 10
""",
)
def events_top_paths(spark, sf_dir):
    """Top-10 three-step user journeys ('view>click>purchase'-style
    path strings): double-lead over each user's timeline, path counts,
    deterministic top-k (count desc, path asc). The path-analysis
    staple next to the Markov matrix (bigram -> trigram). One window
    shuffle; the 125-cell path space collapses map-side; top-k is
    TakeOrderedAndProject, never a global sort."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    paths = (
        seq.select(F.concat_ws(">", "e1", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return paths.orderBy(F.col("n").desc(), F.col("path").asc()).limit(10)


@query(
    "orders_pareto_share",
    section="2.I",
    oracle="""
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS spent
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT o_custkey, spent,
         ROW_NUMBER() OVER (ORDER BY spent DESC, o_custkey) AS rnk,
         CAST(SUM(CAST(spent AS DECIMAL(27,6))) OVER (
           ORDER BY spent DESC, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS DOUBLE) AS cum_spent,
         CAST(SUM(CAST(spent AS DECIMAL(27,6))) OVER () AS DOUBLE) AS total_spent
  FROM spend
)
SELECT rnk, o_custkey, spent,
       round(cum_spent / total_spent, 9) AS cum_share,
       cum_spent / total_spent <= 0.8 AS in_top80
FROM ranked
""",
)
def orders_pareto_share(spark, sf_dir):
    """Pareto / ABC analysis: customers ranked by total spend, exact
    decimal cumulative share, and the 80%-revenue frontier flag. The
    revenue-concentration question every commercial dashboard asks.
    Window sums are decimal-exact (frame accumulation order differs
    between engines); the ranked window runs over the CUSTOMER rollup
    (not the fact table) — a single-partition window, fine to ~10^8
    keys; beyond that use the two-phase prefix-sum pattern
    (multimodal_shard_manifest)."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("spent"))
    wr = Window.orderBy(F.col("spent").desc(), F.col("o_custkey"))
    wcum = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy()
    ranked = spend.select(
        F.row_number().over(wr).alias("rnk"),
        "o_custkey",
        "spent",
        F.sum(F.col("spent").cast("decimal(27,6)"))
        .over(wcum)
        .cast("double")
        .alias("cum_spent"),
        F.sum(F.col("spent").cast("decimal(27,6)"))
        .over(wall)
        .cast("double")
        .alias("total_spent"),
    )
    share = F.col("cum_spent") / F.col("total_spent")
    return ranked.select(
        "rnk",
        "o_custkey",
        "spent",
        F.round(share, 9).alias("cum_share"),
        (share <= 0.8).alias("in_top80"),
    )


@query(
    "events_dau_rolling_wau",
    section="2.I",
    oracle="""
WITH days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id FROM events
), spine AS (
  SELECT DISTINCT d FROM days
)
SELECT s.d AS day,
       (SELECT COUNT(DISTINCT a.user_id) FROM days a WHERE a.d = s.d) AS dau,
       (SELECT COUNT(DISTINCT a.user_id) FROM days a
        WHERE a.d BETWEEN s.d - 6 AND s.d) AS wau
FROM spine s
""",
)
def events_dau_rolling_wau(spark, sf_dir):
    """DAU + trailing-7-day WAU per day. Sliding DISTINCT is the
    operator windows can't express (no count-distinct range frames):
    the scalable form is a day-spine x active-days range join on the
    (day, user) DISTINCT table — user-day cardinality, re-counted per
    window position only for the 7 days that overlap. At extreme
    scale the approximate path is per-day HLL sketches unioned over
    the trailing window (hll_union_agg — constant work per day);
    this op is the exact twin."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("d"), "user_id"
    ).distinct()
    spine = days.select("d").distinct().select(F.col("d").alias("day"))
    dau = days.groupBy(F.col("d").alias("day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = (
        spine.join(
            days,
            (F.col("d") >= F.date_sub(F.col("day"), 6)) & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return spine.join(dau, "day").join(wau, "day")


# ---------------------------------------------------------------------------
# events_attribution_multitouch (round 11) — first/last/linear credit
# ---------------------------------------------------------------------------

@query(
    "events_attribution_multitouch",
    section="2.I",
    oracle="""
WITH conv AS (
  SELECT user_id, ts AS cts, event_id AS cid FROM events
  WHERE event_type = 'purchase'
), tch AS (
  SELECT user_id, ts AS tts, event_id AS tid, event_type AS ttype FROM events
  WHERE event_type IN ('view', 'click')
), pairs AS (
  SELECT c.cid, t.tid, t.ttype, t.tts
  FROM conv c JOIN tch t
    ON t.user_id = c.user_id
   AND t.tts < c.cts AND t.tts >= c.cts - INTERVAL 7 DAY
), rk AS (
  SELECT cid, tid, ttype,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY tts ASC, tid ASC) AS rfirst,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY tts DESC, tid DESC) AS rlast,
         COUNT(*) OVER (PARTITION BY cid) AS k
  FROM pairs
), credits AS (
  SELECT 'first_touch' AS model, ttype,
         CASE WHEN rfirst = 1 THEN 1000000 ELSE 0 END AS cr FROM rk
  UNION ALL
  SELECT 'last_touch', ttype,
         CASE WHEN rlast = 1 THEN 1000000 ELSE 0 END FROM rk
  UNION ALL
  SELECT 'linear', ttype,
         1000000 // k + CASE WHEN rfirst = 1 THEN 1000000 % k ELSE 0 END FROM rk
)
SELECT model, ttype AS event_type,
       CAST(SUM(cr) AS BIGINT) AS credit_micro,
       CAST(COUNT(*) AS BIGINT) AS n_touch_rows
FROM credits GROUP BY model, ttype
""",
)
def events_attribution_multitouch(spark, sf_dir):
    """Multi-touch conversion attribution under three industry models
    in one pass: each purchase credits the view/click touches of the
    same user in its trailing 7 days — ALL of the credit to the first
    touch, to the last touch, or spread linearly. Credits live in
    integer micro-units (1e6 per conversion per model, EXACTLY):
    linear gives each touch floor(1e6/k) and parks the division
    remainder on the first touch, so conservation is an integer
    identity, not a float approximation — and the oracle hash pins it.
    First/last are deterministic under timestamp ties via the
    (ts, event_id) lexicographic tie-break on both rank directions.

    Scale: the touch-to-conversion join is user-keyed (one shuffle on
    user_id; per-user groups are bounded), the attribution windows are
    conversion-sized partitions, and the three models reuse ONE ranked
    intermediate — never three scans."""
    e = load_table(spark, sf_dir, "events")
    conv = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid")
    )
    tch = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("ttype"),
    )
    pairs = conv.join(tch, "user_id").filter(
        (F.col("tts") < F.col("cts"))
        & (F.col("tts") >= F.col("cts") - F.expr("INTERVAL 7 DAYS"))
    )
    wf = Window.partitionBy("cid").orderBy(F.col("tts").asc(), F.col("tid").asc())
    wl = Window.partitionBy("cid").orderBy(F.col("tts").desc(), F.col("tid").desc())
    wk = Window.partitionBy("cid")
    rk = pairs.select(
        "cid",
        "tid",
        "ttype",
        F.row_number().over(wf).alias("rfirst"),
        F.row_number().over(wl).alias("rlast"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )
    first_cr = rk.select(
        F.lit("first_touch").alias("model"),
        "ttype",
        F.when(F.col("rfirst") == 1, F.lit(1000000)).otherwise(0).alias("cr"),
    )
    last_cr = rk.select(
        F.lit("last_touch").alias("model"),
        "ttype",
        F.when(F.col("rlast") == 1, F.lit(1000000)).otherwise(0).alias("cr"),
    )
    lin_cr = rk.select(
        F.lit("linear").alias("model"),
        "ttype",
        (
            F.expr("1000000 DIV k")
            + F.when(F.col("rfirst") == 1, F.expr("1000000 % k")).otherwise(0)
        ).alias("cr"),
    )
    credits = first_cr.unionByName(last_cr).unionByName(lin_cr)
    return credits.groupBy("model", F.col("ttype").alias("event_type")).agg(
        F.sum("cr").cast("long").alias("credit_micro"),
        F.count(F.lit(1)).cast("long").alias("n_touch_rows"),
    )


# ---------------------------------------------------------------------------
# events_funnel_latency (round 11) — time-to-convert distribution
# ---------------------------------------------------------------------------

@query(
    "events_funnel_latency",
    section="2.I",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t0 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t1
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.t0
  GROUP BY e.user_id
), lat AS (
  SELECT p.user_id, (p.t1 - s.t0) // 1000000 AS sec
  FROM p JOIN s ON s.user_id = p.user_id
), grid AS (
  SELECT sec, CAST(COUNT(*) AS BIGINT) AS w FROM lat GROUP BY sec
), cum AS (
  SELECT sec, w, SUM(w) OVER (ORDER BY sec) AS running,
         SUM(w) OVER () AS tot
  FROM grid
)
SELECT CAST(MAX(tot) AS BIGINT) AS n_converted,
       CAST(MIN(sec) AS BIGINT) AS min_sec,
       CAST(MIN(CASE WHEN 4 * running >= tot THEN sec END) AS BIGINT) AS p25_sec,
       CAST(MIN(CASE WHEN 2 * running >= tot THEN sec END) AS BIGINT) AS median_sec,
       CAST(MIN(CASE WHEN 4 * running >= 3 * tot THEN sec END) AS BIGINT) AS p75_sec,
       CAST(MAX(sec) AS BIGINT) AS max_sec,
       round(CAST(SUM(sec * w) AS DOUBLE) / MAX(tot), 6) AS mean_sec
FROM cum
""",
)
def events_funnel_latency(spark, sf_dir):
    """Time-to-convert distribution: for every user, latency from
    FIRST signup to the first subsequent purchase, summarized as
    min/p25/median/p75/max/mean seconds. Latencies are exact integer
    seconds (microsecond epochs floor-divided — no float timestamps),
    the quartiles use the cumulative-weight-crossing construction on
    the latency grid (agg_weighted_percentile's algebra with w =
    converter count), and the mean is one exact division.

    Scale: two user-keyed partial aggregations (first signup, first
    qualifying purchase) and a user-keyed join — one shuffle key
    throughout; the percentile window runs on the collapsed latency
    GRID, never on raw converters."""
    e = load_table(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; unix_micros wants TIMESTAMP. Sessions are
    # pinned UTC (loader contract), so the cast is value-preserving
    # and matches DuckDB's epoch_us exactly.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(us).alias("t0"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("t"))
        .join(s, "user_id")
        .filter(F.col("t") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
    )
    lat = p.join(s, "user_id").select(
        F.expr("(t1 - t0) DIV 1000000").alias("sec")
    )
    grid = lat.groupBy("sec").agg(F.count(F.lit(1)).cast("long").alias("w"))
    wcum = Window.orderBy("sec").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy()
    cum = grid.select(
        "sec",
        "w",
        F.sum("w").over(wcum).alias("running"),
        F.sum("w").over(wtot).alias("tot"),
    )
    return cum.agg(
        F.max("tot").cast("long").alias("n_converted"),
        F.min("sec").cast("long").alias("min_sec"),
        F.min(F.when(4 * F.col("running") >= F.col("tot"), F.col("sec")))
        .cast("long")
        .alias("p25_sec"),
        F.min(F.when(2 * F.col("running") >= F.col("tot"), F.col("sec")))
        .cast("long")
        .alias("median_sec"),
        F.min(F.when(4 * F.col("running") >= 3 * F.col("tot"), F.col("sec")))
        .cast("long")
        .alias("p75_sec"),
        F.max("sec").cast("long").alias("max_sec"),
        F.round(
            F.sum(F.col("sec") * F.col("w")).cast("double") / F.max("tot"), 6
        ).alias("mean_sec"),
    )


# ---------------------------------------------------------------------------
# events_cohort_ltv (round 11) — the LTV triangle
# ---------------------------------------------------------------------------

@query(
    "events_cohort_ltv",
    section="2.I",
    oracle=f"""
WITH first_seen AS (
  SELECT user_id,
         CAST(date_trunc('month', MIN(ts)) AS DATE) AS cohort
  FROM events GROUP BY user_id
), rev AS (
  SELECT f.cohort,
         (year(CAST(date_trunc('month', e.ts) AS DATE)) - year(f.cohort)) * 12
           + (month(CAST(date_trunc('month', e.ts) AS DATE)) - month(f.cohort))
           AS age_months,
         e.value, e.user_id
  FROM events e JOIN first_seen f ON f.user_id = e.user_id
  WHERE e.event_type = 'purchase'
), cell AS (
  SELECT cohort, age_months,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
         {dsum_sql('value')} AS revenue
  FROM rev GROUP BY cohort, age_months
)
SELECT cohort, CAST(age_months AS BIGINT) AS age_months, n_buyers,
       round(revenue, 2) AS revenue,
       round(SUM(round(revenue, 2)) OVER (PARTITION BY cohort
                                          ORDER BY age_months), 2) AS cum_revenue
FROM cell
""",
)
def events_cohort_ltv(spark, sf_dir):
    """The LTV triangle: purchase revenue by signup cohort (month of
    first activity) × account age in months, with the running
    cumulative revenue per cohort — the table behind every
    payback-period chart. Cohort age is explicit year/month integer
    arithmetic (never months_between, whose fractional semantics
    differ across engines); per-cell revenue is a dsum (exact decimal
    grid), rounded to cents BEFORE the cumulative window so the
    running sum adds already-quantized values identically on both
    sides.

    Scale: first-activity is a user-keyed partial min; the cohort
    join is user-keyed; cells collapse to (cohort × age) — a few
    hundred rows at any corpus size — before the window."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).cast("date").alias("cohort")
    )
    em = F.date_trunc("month", F.col("ts")).cast("date")
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort",
            (
                (F.year(em) - F.year("cohort")) * 12
                + (F.month(em) - F.month("cohort"))
            ).alias("age_months"),
            "value",
            "user_id",
        )
    )
    cell = rev.groupBy("cohort", "age_months").agg(
        F.countDistinct("user_id").cast("long").alias("n_buyers"),
        dsum("value").alias("revenue"),
    )
    wc = (
        Window.partitionBy("cohort")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return cell.select(
        "cohort",
        F.col("age_months").cast("long").alias("age_months"),
        "n_buyers",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.sum(F.round("revenue", 2)).over(wc), 2).alias("cum_revenue"),
    )


# ---------------------------------------------------------------------------
# events_hour_of_week_profile (round 11) — the 168-cell seasonality map
# ---------------------------------------------------------------------------

@query(
    "events_hour_of_week_profile",
    section="2.I",
    oracle="""
WITH cells AS (
  SELECT isodow(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY isodow(ts), CAST(hour(ts) AS BIGINT)
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(MAX(n) AS BIGINT) AS nmax FROM cells
)
SELECT CAST(c.dow AS BIGINT) AS dow, c.hod, c.n,
       round(CAST(c.n AS DOUBLE) / t.nt, 6) AS share,
       c.n = t.nmax AS is_peak
FROM cells c CROSS JOIN t
""",
)
def events_hour_of_week_profile(spark, sf_dir):
    """Hour-of-week seasonality profile — the 168-cell heatmap behind
    capacity planning and anomaly baselines: event share per (ISO
    day-of-week, hour-of-day) with the peak cell(s) flagged. Day
    numbering is pinned ISO (Monday=1, matching fn_date_interval_clamp's
    convention — Spark's weekday+1, never the Sunday-first dayofweek);
    shares are single exact divisions; peak equality is an integer
    compare, so ties flag every peak cell identically on both
    engines.

    Scale: one scan to a ≤168-row histogram (map-side combine) with a
    1-row totals broadcast — at any corpus size the profile is one
    pass."""
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.select(
            (F.weekday(F.col("ts")) + 1).alias("dow"),
            F.hour(F.col("ts")).cast("long").alias("hod"),
        )
        .groupBy("dow", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    t = cells.agg(
        F.sum("n").cast("long").alias("nt"), F.max("n").cast("long").alias("nmax")
    )
    return cells.crossJoin(F.broadcast(t)).select(
        F.col("dow").cast("long").alias("dow"),
        "hod",
        "n",
        F.round(F.col("n").cast("double") / F.col("nt"), 6).alias("share"),
        (F.col("n") == F.col("nmax")).alias("is_peak"),
    )


# ---------------------------------------------------------------------------
# events_ab_test_ztest (round 11) — the experimentation primitive
# ---------------------------------------------------------------------------

@query(
    "events_ab_test_ztest",
    section="2.I",
    oracle="""
WITH assigned AS (
  SELECT user_id, CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         MAX(CASE WHEN event_type = 'purchase' AND day(ts) = 1
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), arms AS (
  SELECT CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT) AS c2
  FROM assigned
)
SELECT n1, c1, n2, c2,
       round(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
       round(CAST(c2 AS DOUBLE) / n2, 6) AS p2,
       CASE WHEN c1 + c2 > 0 AND c1 + c2 < n1 + n2 THEN
         round((CAST(c1 AS DOUBLE) / n1 - CAST(c2 AS DOUBLE) / n2)
               / sqrt((CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                      * (1 - CAST(c1 + c2 AS DOUBLE) / (n1 + n2))
                      * (1.0 / n1 + 1.0 / n2)), 6)
       ELSE CAST(0.0 AS DOUBLE) END AS z_score
FROM arms
""",
)
def events_ab_test_ztest(spark, sf_dir):
    """Two-proportion z-test on a hash-split experiment — THE
    experimentation primitive: users split by parity into arms A/B,
    converted = any purchase, z = (p₁ − p₂)/√(p̂(1−p̂)(1/n₁+1/n₂))
    with the pooled proportion. Every input to the float expression
    is an exact integer; the divisions and sqrt are IEEE
    exactly-rounded single ops composed identically on both engines,
    so the statistic itself hash-pins. (The parity split is the
    deterministic stand-in for a salted-hash assignment —
    sample_hash_deterministic is the production splitter.)

    Scale: one user-keyed partial aggregation then a 2-row fold —
    a trillion-event experiment readout is one scan."""
    return ab_ztest_readout(load_table(spark, sf_dir, "events"))


def ab_user_converted(e):
    """Per-user conversion partial over any events-shaped frame:
    (user_id, converted∈{0,1}). The MERGEABLE half of the readout —
    max() over per-batch partials equals the one-shot value, which is
    what lets streaming/ops.stream_ab_monitor carry this as state
    across micro-batches that each see only part of a user's events."""
    return e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.dayofmonth("ts") == 1), 1
            ).otherwise(0)
        ).alias("converted")
    )


def ab_ztest_finalize(user_conv):
    """Arm assignment + two-proportion z readout from a per-user
    (user_id, converted) frame — the non-mergeable tail of the chain,
    run once over the final state."""
    assigned = user_conv.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
        "converted",
    )
    arms = assigned.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).cast("long").alias("n2"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    p1 = F.col("c1").cast("double") / F.col("n1")
    p2 = F.col("c2").cast("double") / F.col("n2")
    pp = (F.col("c1") + F.col("c2")).cast("double") / (F.col("n1") + F.col("n2"))
    return arms.select(
        "n1",
        "c1",
        "n2",
        "c2",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2"),
        # degenerate guard (all or none converted => pooled variance 0):
        # identical CASE on both engines; the fixture sits well inside
        F.when(
            (F.col("c1") + F.col("c2") > 0)
            & (F.col("c1") + F.col("c2") < F.col("n1") + F.col("n2")),
            F.round(
                (p1 - p2)
                / F.sqrt(pp * (1 - pp) * (1.0 / F.col("n1") + 1.0 / F.col("n2"))),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("z_score"),
    )


def ab_ztest_readout(e):
    """Shared A/B readout chain over any events-shaped DataFrame —
    consumed by the batch query above; the streaming twin
    (streaming/ops.stream_ab_monitor) runs the same two halves with
    the per-user partial carried as cross-batch state."""
    return ab_ztest_finalize(ab_user_converted(e))


# ---------------------------------------------------------------------------
# events_user_lifecycle (round 11) — growth accounting states
# ---------------------------------------------------------------------------

@query(
    "events_user_lifecycle",
    section="2.I",
    oracle="""
WITH weekly AS (
  SELECT DISTINCT user_id,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) // 7 AS BIGINT) AS wk
  FROM events
), states AS (
  SELECT user_id, wk,
         LAG(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
         MIN(wk) OVER (PARTITION BY user_id) AS first_wk
  FROM weekly
), labeled AS (
  SELECT wk,
         CASE WHEN wk = first_wk THEN 'new'
              WHEN prev_wk = wk - 1 THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM states
)
SELECT wk, state, CAST(COUNT(*) AS BIGINT) AS n_users
FROM labeled GROUP BY wk, state
""",
)
def events_user_lifecycle(spark, sf_dir):
    """Growth-accounting lifecycle states by ISO-epoch week: each
    active (user, week) is 'new' (first week ever), 'retained'
    (also active the immediately preceding week) or 'resurrected'
    (returning after a gap) — the decomposition behind every
    growth-accounting chart (churn is the complement: retained_{w-1}
    minus retained_w minus resurrected-eligible, derivable from this
    table). Weeks are integer day-offsets from the fixture epoch
    floor-divided by 7 (no engine week-numbering dependence —
    fn_date_interval_clamp pins those separately).

    Scale: one distinct to (user, week) memberships, then two
    user-partitioned windows (lag + min) on bounded per-user rows —
    one shuffle key end to end."""
    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.select(
            "user_id",
            F.expr(
                "CAST(datediff(CAST(date_trunc('day', ts) AS DATE), "
                "DATE '2024-01-01') DIV 7 AS BIGINT)"
            ).alias("wk"),
        )
        .distinct()
    )
    wlag = Window.partitionBy("user_id").orderBy("wk")
    wmin = Window.partitionBy("user_id")
    states = weekly.select(
        "wk",
        F.lag("wk").over(wlag).alias("prev_wk"),
        F.min("wk").over(wmin).alias("first_wk"),
    )
    labeled = states.select(
        "wk",
        F.when(F.col("wk") == F.col("first_wk"), "new")
        .when(F.col("prev_wk") == F.col("wk") - 1, "retained")
        .otherwise("resurrected")
        .alias("state"),
    )
    return labeled.groupBy("wk", "state").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )


# ---------------------------------------------------------------------------
# events_power_law_fit (round 11) — Zipf exponent of user activity
# ---------------------------------------------------------------------------

@query(
    "events_power_law_fit",
    section="2.I",
    oracle="""
WITH act AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
), ranked AS (
  SELECT cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id ASC) AS rnk
  FROM act
), ll AS (
  SELECT round(ln(rnk), 9) AS x, round(ln(cnt), 9) AS y FROM ranked
), s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(30,9))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(30,9))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(round(x * y, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(round(x * x, 9) AS DECIMAL(30,9))) AS DOUBLE) AS sxx
  FROM ll
)
SELECT CAST(n AS BIGINT) AS n_users,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept
FROM s
""",
)
def events_power_law_fit(spark, sf_dir):
    """Zipf/power-law exponent of the user-activity distribution: OLS
    slope of ln(count) on ln(rank) over the frequency-ranked users —
    the heavy-tail diagnostic that decides skew remedies (a slope
    near −1 says hot-key mitigation is mandatory; near 0 says hashing
    suffices). Ranks come from rank_two_phase (activity-count bucket
    + user_id refinement — no corpus-wide window), each ln is rounded
    at 9dp, the products re-rounded, and all sums are decimal
    (order-independent); slope/intercept are one fixed double tree
    (the agg_linear_regression composition).

    Scale: one user-keyed partial agg, the two-phase rank on the
    count grid, a 4-sum fold."""
    from sparkml_spark.registry import rank_two_phase

    e = load_table(spark, sf_dir, "events")
    act = e.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    ranked = rank_two_phase(
        act,
        bucket=F.col("cnt"),
        order_cols=[F.col("cnt").desc(), F.col("user_id").asc()],
        bucket_ascending=False,
        out="rnk",
    )
    ll = ranked.select(
        F.round(F.log("rnk"), 9).alias("x"), F.round(F.log("cnt"), 9).alias("y")
    )
    s = ll.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(30,9)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(30,9)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 9).cast("decimal(30,9)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 9).cast("decimal(30,9)"))
        .cast("double")
        .alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("n").cast("long").alias("n_users"),
        F.round(num / den, 6).alias("zipf_slope"),
        F.round((F.col("sy") - num / den * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


# ---------------------------------------------------------------------------
# orders_duplicate_payments (round 11) — forensic double-charge screen
# ---------------------------------------------------------------------------

@query(
    "orders_duplicate_payments",
    section="2.I",
    oracle="""
WITH corpus AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
  UNION ALL
  -- injected double-charges: every 50th order replayed 2 days later
  -- under a new key (same customer, same amount) — the dedup-family
  -- convention; the screen must find exactly these plus any natural
  -- repeats
  SELECT o_orderkey + 10000000, o_custkey, o_totalprice,
         o_orderdate + INTERVAL 2 DAY
  FROM orders WHERE o_orderkey % 50 = 0
), keyed AS (
  SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS d
  FROM corpus
)
SELECT a.o_custkey,
       a.o_orderkey AS orderkey_a, b.o_orderkey AS orderkey_b,
       round(a.cents / 100.0, 2) AS amount,
       CAST(date_diff('day', a.d, b.d) AS BIGINT) AS day_gap
FROM keyed a JOIN keyed b
  ON b.o_custkey = a.o_custkey AND b.cents = a.cents
 AND b.o_orderkey > a.o_orderkey
 AND abs(date_diff('day', a.d, b.d)) <= 7
""",
)
def orders_duplicate_payments(spark, sf_dir):
    """Duplicate-payment screen — the audit classic next to
    stat_benford_digits: pairs of orders by the SAME customer for the
    EXACT same amount (cents grid, never float equality) within 7
    days. The self-join key is (custkey, amount-cents) — an equi join
    whose fan-out is bounded by same-amount repeat counts per
    customer (tiny), with the date window as a residual filter; never
    a date-range theta join.

    Scale: one shuffle on the composite key; group sizes are
    per-customer-per-amount — the celebrity-cap argument does not
    even arise."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    corpus = o.unionByName(
        o.filter(F.col("o_orderkey") % 50 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
            "o_custkey",
            "o_totalprice",
            (F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS")).alias("o_orderdate"),
        )
    )
    keyed = corpus.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.col("o_orderdate").cast("date").alias("d"),
    )
    a = keyed.select(
        "o_custkey",
        F.col("o_orderkey").alias("orderkey_a"),
        "cents",
        F.col("d").alias("da"),
    )
    b = keyed.select(
        "o_custkey",
        F.col("o_orderkey").alias("orderkey_b"),
        "cents",
        F.col("d").alias("db"),
    )
    return (
        a.join(b, ["o_custkey", "cents"])
        .filter(
            (F.col("orderkey_b") > F.col("orderkey_a"))
            & (F.abs(F.datediff(F.col("db"), F.col("da"))) <= 7)
        )
        .select(
            "o_custkey",
            "orderkey_a",
            "orderkey_b",
            F.round(F.col("cents") / 100.0, 2).alias("amount"),
            F.datediff(F.col("db"), F.col("da")).cast("long").alias("day_gap"),
        )
    )


# ---------------------------------------------------------------------------
# events_diff_in_diff (round 11) — the quasi-experimental estimator
# ---------------------------------------------------------------------------

@query(
    "events_diff_in_diff",
    section="2.I",
    oracle="""
WITH cells AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'treat' ELSE 'control' END AS arm,
         CASE WHEN day(ts) <= 15 THEN 'pre' ELSE 'post' END AS period,
         CAST(COUNT(*) AS BIGINT) AS n,
         round(CAST(SUM(CAST(round(value, 9) AS DECIMAL(30,9))) AS DOUBLE)
               / COUNT(*), 6) AS mean_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY CASE WHEN user_id % 2 = 0 THEN 'treat' ELSE 'control' END,
           CASE WHEN day(ts) <= 15 THEN 'pre' ELSE 'post' END
), w AS (
  SELECT
    MAX(CASE WHEN arm = 'treat' AND period = 'post' THEN mean_value END) AS tp,
    MAX(CASE WHEN arm = 'treat' AND period = 'pre' THEN mean_value END) AS tr,
    MAX(CASE WHEN arm = 'control' AND period = 'post' THEN mean_value END) AS cp,
    MAX(CASE WHEN arm = 'control' AND period = 'pre' THEN mean_value END) AS cr,
    CAST(SUM(n) AS BIGINT) AS n_total
  FROM cells
)
SELECT n_total, tp AS treat_post, tr AS treat_pre,
       cp AS control_post, cr AS control_pre,
       round((tp - tr) - (cp - cr), 6) AS did_estimate
FROM w
""",
)
def events_diff_in_diff(spark, sf_dir):
    """Difference-in-differences — the quasi-experimental estimator
    when randomization isn't available: mean purchase value per
    (arm × period) cell around the mid-month cutoff, DiD =
    (treatᵖᵒˢᵗ − treatᵖʳᵉ) − (controlᵖᵒˢᵗ − controlᵖʳᵉ). Cell means
    use the 9dp-quantize + decimal-sum pattern (one exact division
    each, rounded at 6dp BEFORE the DiD arithmetic so both engines
    compose the same already-rounded values). Completes the causal
    toolkit next to events_ab_test_ztest (randomized) and
    events_attribution_multitouch (observational credit).

    Scale: one scan to a 4-cell histogram — map-side combine, then a
    1-row pivot fold."""
    e = load_table(spark, sf_dir, "events")
    cells = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            F.when(F.col("user_id") % 2 == 0, "treat").otherwise("control").alias("arm"),
            F.when(F.dayofmonth("ts") <= 15, "pre").otherwise("post").alias("period"),
            "value",
        )
        .groupBy("arm", "period")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(
                F.sum(F.round(F.col("value"), 9).cast("decimal(30,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_value"),
        )
    )
    w = cells.agg(
        F.max(
            F.when((F.col("arm") == "treat") & (F.col("period") == "post"), F.col("mean_value"))
        ).alias("tp"),
        F.max(
            F.when((F.col("arm") == "treat") & (F.col("period") == "pre"), F.col("mean_value"))
        ).alias("tr"),
        F.max(
            F.when((F.col("arm") == "control") & (F.col("period") == "post"), F.col("mean_value"))
        ).alias("cp"),
        F.max(
            F.when((F.col("arm") == "control") & (F.col("period") == "pre"), F.col("mean_value"))
        ).alias("cr"),
        F.sum("n").cast("long").alias("n_total"),
    )
    return w.select(
        "n_total",
        F.col("tp").alias("treat_post"),
        F.col("tr").alias("treat_pre"),
        F.col("cp").alias("control_post"),
        F.col("cr").alias("control_pre"),
        F.round(
            (F.col("tp") - F.col("tr")) - (F.col("cp") - F.col("cr")), 6
        ).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# events_analytics_full (round 11) — the composed analytics pipeline,
# ONE Catalyst plan (the training_corpus_full of the events side).
# ---------------------------------------------------------------------------

@query(
    "events_analytics_full",
    section="2.I",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_type, value, epoch_us(ts) AS us,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                OR LAG(epoch_us(ts)) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT user_id, ts, event_type, value, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, us
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM ordered
), sess_stats AS (
  SELECT user_id, sess,
         CAST(date_trunc('day', MIN(ts)) AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted,
         (MAX(us) - MIN(us)) // 1000000 AS dur_sec,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM sessioned GROUP BY user_id, sess
)
SELECT day,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       round(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conv_rate,
       round(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 6) AS mean_events,
       round(CAST(SUM(dur_sec) AS DOUBLE) / COUNT(*), 6) AS mean_dur_sec,
       round(CAST(SUM(value_cents) AS DOUBLE) / 100.0 / COUNT(*), 6)
         AS mean_session_value
FROM sess_stats GROUP BY day
""",
)
def events_analytics_full(spark, sf_dir):
    """The COMPOSED product-analytics pipeline in ONE Catalyst plan —
    the events-side sibling of pipeline_training_corpus_full:
    30-minute-gap sessionization (lag + flag + running sum, the
    win_sessionize_batch construction) → per-session statistics
    (events, distinct types, conversion, integer-second duration,
    cents-grid value) → daily rollup (sessions, conversion rate, mean
    size/duration/value — every mean an exact-integer-sum division
    rounded at 6dp). One declarative chain: Catalyst fuses it into
    user-keyed windows + two aggregations with NO intermediate
    materialization, which is the point — the dashboard pipeline a
    warehouse team schedules as five jobs runs here as one plan.

    Scale: the windows are user-partitioned; the session and day
    aggregations partial-combine; one shuffle on user_id plus one on
    the (tiny) day grid — asserted by the wave-22 plan gate."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    worder = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        us.alias("us"),
        F.when(
            (us - F.lag(us).over(worder) > 1800000000)
            | F.lag(us).over(worder).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    wsess = W.partitionBy("user_id").orderBy("ts", "us").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sessioned = ordered.select(
        "user_id",
        "ts",
        "event_type",
        "value",
        "us",
        F.sum("new_sess").over(wsess).alias("sess"),
    )
    sess_stats = sessioned.groupBy("user_id", "sess").agg(
        F.date_trunc("day", F.min("ts")).cast("date").alias("day"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("converted"),
        F.expr("(max(us) - min(us)) DIV 1000000").alias("dur_sec"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    return sess_stats.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(F.sum("converted").cast("double") / F.count(F.lit(1)), 6).alias(
            "conv_rate"
        ),
        F.round(F.sum("n_events").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_events"
        ),
        F.round(F.sum("dur_sec").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_dur_sec"
        ),
        F.round(
            F.sum("value_cents").cast("double") / 100.0 / F.count(F.lit(1)), 6
        ).alias("mean_session_value"),
    )


# ---------------------------------------------------------------------------
# events_markov_entropy_rate (round 11) — behavioral predictability
# ---------------------------------------------------------------------------

@query(
    "events_markov_entropy_rate",
    section="2.I",
    oracle="""
WITH seq AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
), pairs AS (
  SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS n FROM seq
  WHERE nxt IS NOT NULL GROUP BY cur, nxt
), tot AS (
  SELECT cur, CAST(SUM(n) AS BIGINT) AS n_out FROM pairs GROUP BY cur
), alltot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS grand FROM pairs
), terms AS (
  -- pi(s) * p(t|s) * ln p(t|s) = (n_pair/grand) * ln(n_pair/n_out):
  -- each term's rationals are exact divisions, ln quantized at 9dp
  SELECT round(CAST(p.n AS DOUBLE) / a.grand
               * round(ln(CAST(p.n AS DOUBLE) / t.n_out), 9), 9) AS term
  FROM pairs p JOIN tot t ON t.cur = p.cur CROSS JOIN alltot a
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs) AS n_transitions_kinds,
       round(-CAST(SUM(CAST(term AS DECIMAL(30,9))) AS DOUBLE), 6)
         AS entropy_rate_nats
FROM terms
""",
)
def events_markov_entropy_rate(spark, sf_dir):
    """Entropy rate of the first-order behavioral Markov chain —
    HOW PREDICTABLE the user base is, in one number: H = −Σ_s π(s)
    Σ_t p(t|s)·ln p(t|s), with π the empirical transition-source
    share (the stationary weighting the observed chain itself
    induces). Low H ⇒ next actions are guessable (prefetch,
    precompute); H near ln(5) ⇒ behavior is noise. Builds on
    events_markov_transitions' lead-pair construction; each term is
    exact rationals into a 9dp-quantized ln, decimal-summed.

    Scale: one user-keyed window for the lead pairs, then 25-cell
    algebra — the transition matrix posture."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = pairs.groupBy("cur").agg(F.sum("n").cast("long").alias("n_out"))
    alltot = pairs.agg(F.sum("n").cast("long").alias("grand"))
    terms = (
        pairs.join(F.broadcast(tot), "cur")
        .crossJoin(F.broadcast(alltot))
        .select(
            F.round(
                F.col("n").cast("double")
                / F.col("grand")
                * F.round(
                    F.log(F.col("n").cast("double") / F.col("n_out")), 9
                ),
                9,
            ).alias("term")
        )
    )
    nk = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_transitions_kinds"))
    hsum = terms.agg(
        F.round(
            -F.sum(F.col("term").cast("decimal(30,9)")).cast("double"), 6
        ).alias("entropy_rate_nats")
    )
    return nk.crossJoin(hsum)


# ---------------------------------------------------------------------------
# events_ab_sample_size (round 11) — experiment power planning
# ---------------------------------------------------------------------------

@query(
    "events_ab_sample_size",
    section="2.I",
    oracle="""
WITH assigned AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' AND day(ts) = 1
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_conv,
         CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS p
  FROM assigned
), mde AS (SELECT unnest([CAST(0.01 AS DOUBLE), CAST(0.02 AS DOUBLE),
                          CAST(0.05 AS DOUBLE)]) AS delta)
SELECT base.n_users, base.n_conv, mde.delta,
       CAST(ceil(
         (CAST(1.96 AS DOUBLE) + CAST(0.84 AS DOUBLE))
         * (CAST(1.96 AS DOUBLE) + CAST(0.84 AS DOUBLE))
         * (base.p * (1 - base.p) + (base.p + mde.delta) * (1 - base.p - mde.delta))
         / (mde.delta * mde.delta)) AS BIGINT) AS n_per_arm
FROM base CROSS JOIN mde
""",
)
def events_ab_sample_size(spark, sf_dir):
    """Experiment power planning — the question asked BEFORE
    events_ab_test_ztest runs: per-arm sample size to detect a
    minimum effect δ at α=0.05 (two-sided) with 80% power, n =
    (z_{α/2}+z_β)²·(p₁q₁+p₂q₂)/δ², evaluated at the corpus's OWN
    baseline conversion rate for δ ∈ {1, 2, 5} points. The normal
    quantiles are FIXED literals CAST to double on both engines (the
    Benford lesson — bare literals type as DECIMAL in DuckDB); the
    baseline rate is one exact division; ceil is exact.

    Scale: one user fold to the baseline + a 3-row broadcast grid —
    the planning table is free at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    assigned = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.dayofmonth("ts") == 1), 1
            ).otherwise(0)
        ).alias("converted")
    )
    base = assigned.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_conv"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias("p"),
    )
    mde = spark.createDataFrame([(0.01,), (0.02,), (0.05,)], "delta DOUBLE")
    z = F.lit(1.96) + F.lit(0.84)
    p = F.col("p")
    q = 1 - p
    p2 = p + F.col("delta")
    return base.crossJoin(F.broadcast(mde)).select(
        "n_users",
        "n_conv",
        "delta",
        F.ceil(
            z * z * (p * q + p2 * (1 - p2)) / (F.col("delta") * F.col("delta"))
        )
        .cast("long")
        .alias("n_per_arm"),
    )
