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
