"""Fixture loader — the ONLY place schema repair lives (SURVEY.md §3).

Scale design: `spark.read.parquet` is a lazy columnar scan; Catalyst
pushes predicates and prunes columns into it (verified in plans —
`PushedFilters` / `ReadSchema`). At 100 TB the same call points at a
partitioned directory tree and partition pruning kicks in for free; the
loader deliberately adds no materialization, caching of data, or
driver-side row handling.

The one repair: `events.ts` is Parquet TIMESTAMP(NANOS), which the
vectorized reader rejects by default. Under
`spark.sql.legacy.parquet.nanosAsLong=true` it loads as bigint
nanoseconds; we repair with *integer* division (`DIV 1000` — exact, no
double round-trip) to microseconds and cast to `timestamp_ntz`, which
is what DuckDB reads natively for the same file. Verified equal against
the oracle (FIXTURES.md "Loader recipe").
"""

from __future__ import annotations

import os
from types import SimpleNamespace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkml_spark.session import ensure_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Logical-plan cache: keyed by (app id, sf_dir, table). DataFrames are
# lazy plans, so this only saves repeated parquet-footer reads when the
# driver runs ~70 queries against the same sf_dir — no data is pinned.
_cache: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with schema repair applied."""
    ensure_confs(spark)  # driver-provided sessions lack nanosAsLong
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _cache.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            # bigint nanos -> exact integer µs -> NTZ timestamp (UTC session).
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000")).cast("timestamp_ntz")
            )
        _cache[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> SimpleNamespace:
    """All fixture tables as attributes: `t.lineitem`, `t.orders`, ..."""
    return SimpleNamespace(**{n: load_table(spark, sf_dir, n) for n in TABLES})


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for `spark.sql(...)` entry."""
    for n in TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
