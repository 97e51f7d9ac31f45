"""Reshaping & time-series completion operators (§2.B/§2.H adjuncts):
positional explode, unpivot/melt, and gap-filled resampling — the
data-preparation shapes between relational ops and the LLM pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkml_spark.registry import dsum, dsum_sql, query
from sparkml_spark.sources.loader import load_table


@query(
    "fn_explode_pos",
    section="2.H",
    oracle="""
SELECT vec_id, CAST(i - 1 AS INT) AS pos, embedding[CAST(i AS INT)] AS val
FROM embeddings, unnest(range(1, 5)) AS t(i)
""",
)
def fn_explode_pos(spark, sf_dir):
    """posexplode of the first 4 embedding cells: one row per (vector,
    position, value) — Spark's 0-based pos vs DuckDB's 1-based
    ordinality reconciled explicitly."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "val")
    )


@query(
    "op_unpivot",
    section="2.B",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, value
FROM lineitem
UNPIVOT (value FOR metric IN (l_quantity, l_discount, l_tax))
""",
)
def op_unpivot(spark, sf_dir):
    """Wide→long melt: three measure columns become (metric, value)
    rows (Spark `unpivot` ≡ DuckDB UNPIVOT; a narrow 1→3 flatMap, no
    shuffle)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "metric",
        "value",
    )


@query(
    "ts_gap_fill",
    section="2.K",
    oracle=f"""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour_start FROM bounds
), hourly AS (
  SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n,
         {dsum_sql('value')} AS sum_value
  FROM events GROUP BY date_trunc('hour', ts)
)
SELECT s.hour_start AS hour_start,
       COALESCE(h.n, 0) AS n_events,
       COALESCE(h.sum_value, 0.0) AS sum_value
FROM spine s LEFT JOIN hourly h ON s.hour_start = h.hour_start
""",
)
def ts_gap_fill(spark, sf_dir):
    """Resample-with-gap-fill: a generated hour spine (sequence between
    min and max hour) left-joined to the hourly rollup, empty hours
    filled with zeros — the time-series completion every monitoring /
    feature pipeline needs. The spine is generated relationally
    (sequence + explode), not on the driver; the rollup side is the
    pre-aggregated (small) side of the join."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_start"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value"))
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("hour", F.max("ts")).cast("timestamp_ntz").alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour_start")
    )
    return spine.join(hourly, "hour_start", "left").select(
        "hour_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("sum_value"), F.lit(0.0)).alias("sum_value"),
    )


@query(
    "ts_interpolate_linear",
    section="2.K",
    oracle=f"""
WITH bounds AS (
  SELECT date_trunc('minute', MIN(ts)) AS lo, date_trunc('minute', MAX(ts)) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS minute_start FROM bounds
), grid AS (
  SELECT minute_start, ROW_NUMBER() OVER (ORDER BY minute_start) AS rn,
         v
  FROM spine LEFT JOIN (
    SELECT date_trunc('minute', ts) AS m, {dsum_sql('value')} / COUNT(*) AS v
    FROM events GROUP BY date_trunc('minute', ts)
  ) obs ON obs.m = minute_start
), ctx AS (
  SELECT minute_start, rn, v,
         LAST_VALUE(v IGNORE NULLS) OVER (ORDER BY rn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         LAST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
             OVER (ORDER BY rn
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prn,
         FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY rn
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS)
             OVER (ORDER BY rn
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nrn
  FROM grid
)
SELECT minute_start,
       CASE WHEN v IS NOT NULL THEN v
            ELSE (pv * (nrn - rn) + nv * (rn - prn)) / (nrn - prn) END AS value_interp,
       (v IS NULL) AS was_gap
FROM ctx
WHERE pv IS NOT NULL AND nv IS NOT NULL
""",
)
def ts_interpolate_linear(spark, sf_dir):
    """Resample to a 1-minute grid with LINEAR interpolation across
    gaps (`ts_gap_fill` is the zero-fill sibling): the per-minute mean
    where observed, otherwise the value interpolated between nearest
    observed neighbors, weighted by grid distance.

    Float parity without rounding: the interpolation is written as
    (pv*(nrn-rn) + nv*(rn-prn)) / (nrn-prn) — pv/nv carry <=6 decimal
    places (exact-decimal means) and the grid offsets are small ints,
    so both products and their sum are EXACTLY representable doubles;
    the single final division is one deterministic IEEE op. The naive
    pv + (nv-pv)*frac form drifts: frac is inexact and a+b*c invites
    FMA contraction on the C++ engine (observed on agg_stats' corr).

    Perf: both directional walks use running frames ending at CURRENT
    ROW (the forward walk runs over rn DESC) — Spark's
    UnboundedFollowing frame recomputes per row (O(n^2): measured 44 s
    on a 43k spine vs <1 s this way). Single range partition; for
    per-key series, partition both windows by the key."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        F.date_trunc("minute", F.col("ts")).cast("timestamp_ntz").alias("m")
    ).agg((dsum("value") / F.count(F.lit(1))).alias("v"))
    bounds = e.agg(
        F.date_trunc("minute", F.min("ts")).cast("timestamp_ntz").alias("lo"),
        F.date_trunc("minute", F.max("ts")).cast("timestamp_ntz").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MINUTE"))).alias("minute_start")
    )
    grid = (
        spine.join(obs, spine.minute_start == obs.m, "left")
        .select("minute_start", "v")
        .withColumn("rn", F.row_number().over(Window.orderBy("minute_start")))
    )
    w_back = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_rev = Window.orderBy(F.col("rn").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marked = F.when(F.col("v").isNotNull(), F.col("rn"))
    ctx = grid.select(
        "minute_start",
        "rn",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(marked, ignorenulls=True).over(w_back).alias("prn"),
        F.last("v", ignorenulls=True).over(w_rev).alias("nv"),
        F.last(marked, ignorenulls=True).over(w_rev).alias("nrn"),
    )
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        (
            F.col("pv") * (F.col("nrn") - F.col("rn"))
            + F.col("nv") * (F.col("rn") - F.col("prn"))
        )
        / (F.col("nrn") - F.col("prn"))
    )
    return (
        ctx.filter(F.col("pv").isNotNull() & F.col("nv").isNotNull())
        .select(
            "minute_start",
            interp.alias("value_interp"),
            F.col("v").isNull().alias("was_gap"),
        )
    )


@query(
    "op_transpose",
    section="2.B",
    oracle="""
SELECT 'n_orders' AS key,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
FROM orders
""",
)
def op_transpose(spark, sf_dir):
    """DataFrame.transpose (new in Spark 4.0) — rows become columns:
    order counts per status flipped into one wide row keyed by the
    original measure name. Transpose COLLECTS the first column to the
    driver to derive the output schema, so it is only safe when the
    input is already a small aggregate (here: 3 rows); at 100 TB the
    input must be the result of an aggregation, never a fact table —
    the wide twin for large category sets is agg_pivot (explicit
    value list, no driver round-trip). Deterministic: the column set
    is pinned by left-joining the counts onto a literal 3-row status
    spine with coalesce(n,0) (ADVICE r01: without the spine, a fixture
    missing one status would drop that column while the oracle's
    FILTER form still emits it as 0 — schema mismatch)."""
    o = load_table(spark, sf_dir, "orders")
    spine = o.sparkSession.createDataFrame(
        [("F",), ("O",), ("P",)], "o_orderstatus string"
    )
    counts = (
        o.filter(F.col("o_orderstatus").isin("F", "O", "P"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pinned = (
        spine.join(counts, "o_orderstatus", "left")
        .select(
            "o_orderstatus",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )
    return pinned.transpose()


# ---------------------------------------------------------------------------
# op_cdc_apply_ordered (round 11) — ordered change-stream application
# ---------------------------------------------------------------------------

@query(
    "op_cdc_apply_ordered",
    section="2.I",
    oracle="""
WITH snapshot AS (
  SELECT doc_id AS key, CAST(n_chars AS BIGINT) AS val FROM documents
), changes AS (
  SELECT (user_id * 7) % 600 AS key,
         event_id AS seq,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op,
         CAST(round(value * 100) AS BIGINT) AS payload
  FROM events
), last AS (
  SELECT key, op, payload FROM (
    SELECT key, op, payload,
           ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM changes
  ) WHERE rn = 1
), merged AS (
  SELECT COALESCE(s.key, l.key) AS key,
         s.val AS sval, l.op, l.payload,
         s.key IS NOT NULL AS in_snap, l.key IS NOT NULL AS in_chg
  FROM snapshot s FULL OUTER JOIN last l ON l.key = s.key
)
SELECT key,
       CASE WHEN in_chg AND op = 'upsert' THEN payload ELSE sval END AS val,
       CASE WHEN NOT in_chg THEN 'unchanged'
            WHEN op = 'delete' THEN NULL
            WHEN in_snap THEN 'updated'
            ELSE 'inserted' END AS action
FROM merged
WHERE NOT (in_chg AND op = 'delete')
""",
)
def op_cdc_apply_ordered(spark, sf_dir):
    """Ordered CDC application — the lakehouse change-data-capture
    core: given a snapshot and a SEQUENCED change stream (multiple
    changes per key; the event log provides inserts, updates and
    deletes keyed by (user_id·7) mod 600 with event_id as the
    sequence), reduce each key to its LAST change (last-writer-wins,
    the Debezium/Delta CDF contract) and merge: delete removes the
    row (even a freshly inserted one), upsert overwrites-or-inserts,
    untouched snapshot rows ride through. Distinct from
    merge_upsert_batch, which applies ONE pre-deduplicated batch —
    the sequencing reduction IS this operator's semantics.

    Scale: the reduction is a key-partitioned rank window on the
    change stream (bounded per-key groups), then ONE full-outer
    equi join against the snapshot — the standard CDC-compaction
    plan; nothing is ordered globally."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "events")
    return cdc_apply_chain(d, e)


def cdc_state_init(d):
    """Initial CDC merge-table state from a documents-shaped snapshot:
    the live rows plus the standard CDC metadata columns — last
    applied sequence (null = untouched), origin-in-snapshot flag, and
    tombstone marker. Shared by streaming/ops.stream_cdc_apply (which
    carries it across micro-batches) and the any-split property test."""
    return d.select(
        F.col("doc_id").alias("key"),
        F.col("n_chars").cast("long").alias("val"),
        F.lit(None).cast("long").alias("last_seq"),
        F.lit(True).alias("in_snap0"),
        F.lit(False).alias("deleted"),
    )


def cdc_merge_step(state, e_batch):
    """One CDC poll applied to the evolving merge table: reduce the
    ARRIVING events-shaped changes to per-key max-seq, then merge
    last-writer-wins BY SEQ — a stale change (lower seq than the
    state's last applied) never clobbers a newer applied one, and a
    tombstoned key re-inserted by a newer change resurrects. Because
    each step keeps the per-key max seq, folding any partition of the
    change stream through this step — in any batch order — reaches
    the same final state as the one-shot application
    (tests/test_properties.py pins this over random splits)."""
    from pyspark.sql import Window

    changes = e_batch.select(
        ((F.col("user_id") * 7) % 600).alias("key"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
        F.round(F.col("value") * 100).cast("long").alias("payload"),
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    last_b = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "seq", "op", "payload")
    )
    merged = state.join(last_b, "key", "full_outer")
    take = F.col("seq").isNotNull() & (
        F.col("last_seq").isNull() | (F.col("seq") > F.col("last_seq"))
    )
    return merged.select(
        "key",
        F.when(take & (F.col("op") == "upsert"), F.col("payload"))
        .when(take, F.lit(None).cast("long"))
        .otherwise(F.col("val"))
        .alias("val"),
        F.when(take, F.col("seq")).otherwise(F.col("last_seq")).alias("last_seq"),
        F.coalesce(F.col("in_snap0"), F.lit(False)).alias("in_snap0"),
        F.when(take, F.col("op") == "delete")
        .otherwise(F.coalesce(F.col("deleted"), F.lit(False)))
        .alias("deleted"),
    )


def cdc_finalize(state):
    """Merge-table state -> the op_cdc_apply_ordered output contract:
    tombstones dropped; action derived from (touched, origin)."""
    return state.filter(~F.col("deleted")).select(
        "key",
        "val",
        F.when(F.col("last_seq").isNull(), F.lit("unchanged"))
        .when(F.col("in_snap0"), F.lit("updated"))
        .otherwise(F.lit("inserted"))
        .alias("action"),
    )


def cdc_apply_chain(d, e):
    """Shared ordered-CDC application over (documents-shaped snapshot,
    events-shaped changes) — consumed by the batch query above and
    replayed per micro-batch by streaming/ops.stream_cdc_apply under
    the single-batch batch-twin contract."""
    from pyspark.sql import Window

    snapshot = d.select(
        F.col("doc_id").alias("key"), F.col("n_chars").cast("long").alias("sval")
    )
    changes = e.select(
        ((F.col("user_id") * 7) % 600).alias("key"),
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "error", "delete")
        .otherwise("upsert")
        .alias("op"),
        F.round(F.col("value") * 100).cast("long").alias("payload"),
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    last = (
        changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "op", "payload", F.lit(True).alias("in_chg"))
    )
    merged = snapshot.withColumn("in_snap", F.lit(True)).join(
        last, "key", "full_outer"
    )
    in_chg = F.coalesce(F.col("in_chg"), F.lit(False))
    in_snap = F.coalesce(F.col("in_snap"), F.lit(False))
    return (
        merged.filter(~(in_chg & (F.col("op") == "delete")))
        .select(
            "key",
            F.when(in_chg & (F.col("op") == "upsert"), F.col("payload"))
            .otherwise(F.col("sval"))
            .alias("val"),
            F.when(~in_chg, F.lit("unchanged"))
            .when(F.col("op") == "delete", F.lit(None).cast("string"))
            .when(in_snap, F.lit("updated"))
            .otherwise(F.lit("inserted"))
            .alias("action"),
        )
    )
