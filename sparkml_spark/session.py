"""SparkSession construction + the engine's required SQL confs.

Two paths:
- `get_spark()` — build our own session (tests, bench.py).
- `ensure_confs(spark)` — the driver hands us ITS session for
  `entry()`/`queries()`; all confs the engine depends on are
  runtime-settable SQL confs, so we (re)apply them on every loader
  call instead of trusting the builder.

Scale note: these confs are the local[32] test profile. On a real
cluster the same code runs unchanged; only `shuffle.partitions` (or
better, AQE's coalesce with a high initial partition number) and
executor sizing move. Nothing here hard-codes a single-node assumption.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL confs the engine REQUIRES for correctness (SURVEY.md §7.4).
REQUIRED_SQL_CONFS: dict[str, str] = {
    # events.ts is Parquet TIMESTAMP(NANOS); without this flag the scan
    # throws [PARQUET_TYPE_ILLEGAL]. Column then loads as bigint nanos
    # and the loader repairs it (sources/loader.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Pin the session TZ so timestamp repair / date_trunc hash-match the
    # DuckDB oracle regardless of runner TZ.
    "spark.sql.session.timeZone": "UTC",
}

#: Performance confs (safe defaults at any scale; SURVEY.md §7.5).
PERF_SQL_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # 200 default wastes ~1 s/query at local bench scale; AQE coalesces
    # down from this anyway. On a 1000-executor cluster raise it (AQE's
    # initialPartitionNum is the better knob there).
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    # Arrow for the pandas-UDF escape hatches and toPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


_confs_applied: set[str] = set()


def ensure_confs(spark: SparkSession) -> SparkSession:
    """Apply required (and best-effort perf) confs to a live session.

    All keys above are runtime-settable SQL confs, so this works on a
    driver-provided session too. Applied once per SparkContext — the
    loader calls this on every table load, and each conf.set is a Py4J
    round trip we don't want 1000s of.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _confs_applied:
        return spark
    for k, v in REQUIRED_SQL_CONFS.items():
        spark.conf.set(k, v)
    for k, v in PERF_SQL_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # perf conf locked by the host — correctness unaffected
    _confs_applied.add(app_id)
    return spark


def get_spark(app_name: str = "sparkml_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's confs."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return ensure_confs(active)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**REQUIRED_SQL_CONFS, **PERF_SQL_CONFS}.items():
        builder = builder.config(k, v)
    # Builder-time-only knob (JVM heap can't change after start): the
    # 10x/30x scale-up stress harness needs more than the 1g default.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    # Quieter driver logs; harmless if log4j overrides.
    builder = builder.config("spark.ui.enabled", "false")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_confs(spark)


class CheckpointChain:
    """Checkpoint hygiene for iterative DataFrame algorithms.

    localCheckpoint storage lives in the RDD registry, NOT the cache
    manager, so `DataFrame.unpersist()` on a superseded iteration is a
    silent no-op and every iteration pins one state-sized RDD forever
    (measured round 12: the BPE trainer held 13 RDDs after 12 merges;
    the CC loop pins one NODE-sized set per round). The fix is the
    ALS/GraphX pattern: materialize the new checkpoint, then free the
    superseded blocks through `SparkContext.getPersistentRDDs`.

    Usage:
        chain = CheckpointChain(spark)
        state = chain.step(initial_state_df)      # checkpoint + record
        for ...:
            new = chain.step(f(state))            # checkpoint + record
            ... last read of `state` ...          # e.g. convergence diff
            chain.reap()                          # free all but `new`
            state = new
        chain.close()     # free everything — ONLY if `state` is done;
                          # skip when the caller consumes the result.

    reap() is separate from step() because freeing is only safe after
    the LAST read of the superseded frame: checkpointing truncates
    lineage, so an unpersisted checkpoint cannot be recomputed — a
    read-after-free is a job failure, not a slowdown.
    """

    def __init__(self, spark: SparkSession) -> None:
        self._sc = spark.sparkContext
        self._generations: list[set] = []

    def _ids(self) -> set:
        return {
            int(i)
            for i in self._sc._jsc.getPersistentRDDs().keySet().toArray()
        }

    def _free(self, pids: set) -> None:
        jmap = self._sc._jsc.getPersistentRDDs()
        for pid in pids:
            jrdd = jmap.get(pid)
            if jrdd is not None:
                jrdd.unpersist(False)

    def step(self, df):
        """Eagerly localCheckpoint `df`, recording its blocks as the
        newest generation. Does NOT free anything — call reap().

        Ownership is exact, not inferred (ADVICE r12): the checkpointed
        DataFrame's analyzed plan IS the `LogicalRDD` wrapping the one
        persistent RDD the checkpoint created, so that id — and only
        that id — is recorded. A before/after diff of ALL persistent
        RDDs would also capture any cache materialized by the step's
        job or a checkpoint taken concurrently on the shared context
        (e.g. a streaming handler on another thread), and reap() would
        free blocks it does not own — a read-after-free for a foreign
        localCheckpoint, whose lineage is truncated. The diff remains
        only as a fallback for an unexpected plan shape."""
        before = self._ids()
        out = df.localCheckpoint(eager=True)
        try:
            plan = out._jdf.queryExecution().analyzed()
            self._generations.append({int(plan.rdd().id())})
        except Exception:
            self._generations.append(self._ids() - before)
        return out

    def reap(self, keep: int = 1) -> None:
        """Free every recorded generation except the newest `keep`."""
        while len(self._generations) > keep:
            self._free(self._generations.pop(0))

    def close(self) -> None:
        """Free ALL recorded generations (the final state included)."""
        self.reap(keep=0)
