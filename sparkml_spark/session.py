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


# ---------------------------------------------------------------------------
# Session-scoped artifact sharing (r14, guide §1.2 "don't compute things
# you throw away"): sibling queries refit byte-identical DETERMINISTIC
# artifacts — seeded MLlib models, the IVF coarse quantizer, persisted
# index paths — once per query instead of once per SparkSession. The
# bound twins (ml_mlp_linear_fit_bound etc.) audit the SAME fitted
# models their base queries produce, so evaluating the fit once per
# session is the evaluate-once pattern, not caching:
#
# - Keyed by the LIVE applicationId: a fresh process/session always
#   rebuilds from the parquet inputs. Nothing survives the process and
#   nothing on disk is keyed by input path across runs — every bench
#   and oracle invocation recomputes from source.
# - Only DETERMINISTIC artifacts belong here (seeded fits on a fixed
#   key-split, pure-function index paths): the memoized object is
#   bit-identical to the refit it replaces within the session, so no
#   declared query output changes. Within one session the fit really
#   is deterministic (same partitioning, same seeded init, same
#   reduction tree); across sessions behaviour is exactly what it was
#   before — one fit from parquet.
# ---------------------------------------------------------------------------

_ARTIFACTS: dict[tuple, object] = {}


def session_artifact(spark: SparkSession, key: tuple, build):
    """Return the memoized artifact for (applicationId, *key), building
    it with `build()` on first use in this session. Entries from
    stopped sessions are evicted on the next miss (their JVM side is
    gone; the py4j refs are dead weight)."""
    k = (spark.sparkContext.applicationId, *key)
    if k not in _ARTIFACTS:
        for stale in [x for x in _ARTIFACTS if x[0] != k[0]]:
            del _ARTIFACTS[stale]
        _ARTIFACTS[k] = build()
    return _ARTIFACTS[k]


# ---------------------------------------------------------------------------
# Deterministic reaping of lazy-checkpoint blocks (r14, VERDICT r13 #2).
#
# The dedup family's `_ckpt` (lazy DISK_ONLY localCheckpoint of a
# multi-consumer intermediate) pins its blocks until the ContextCleaner
# GC's the DataFrame — DataFrame.unpersist() is a silent no-op for
# checkpoint blocks (see CheckpointChain below). A 441-query sweep in
# one session therefore accumulates standing DISK_ONLY blocks between
# GC cycles. Every `_ckpt` call registers its block-owning RDD id
# here; sweep harnesses that control execution order (driver_sim,
# op_timing_census, verify_all) call `reap_registered` AFTER fully
# consuming each query's result, holding the standing count at O(1).
#
# Safety: reaping is only sound once the owning query's result will
# never be re-executed (localCheckpoint truncates lineage, so a reaped
# frame cannot recompute). That is why the reap lives at the SWEEP
# boundary, not inside `_ckpt`: a foreign driver that interleaves
# builds and executions keeps the existing (correct) GC/ContextCleaner
# backstop unchanged, and production 100 TB runs should use reliable
# checkpoints per `_ckpt`'s own docstring.
# ---------------------------------------------------------------------------

_REAPABLE: list[tuple[str, int]] = []  # (applicationId, persistent RDD id)
_REAPABLE_DFS: list = []  # cache-manager persists: unpersist() works


def register_reapable_cache(df) -> None:
    """Record a cache-manager-persisted DataFrame (`.cache()`/
    `.persist()`) for sweep-boundary unpersist. Unlike checkpoint
    blocks these can always recompute, so freeing them is safe at any
    query boundary; the registry just makes it deterministic instead
    of GC-timed."""
    _REAPABLE_DFS.append(df)


def register_reapable(df) -> None:
    """Record a checkpointed/persisted DataFrame's block-owning RDD id
    for sweep-boundary reaping. Best-effort: an unexpected plan shape
    just leaves the block to the GC backstop (the pre-r14 behaviour)."""
    try:
        sc = df.sparkSession.sparkContext
        plan = df._jdf.queryExecution().analyzed()
        _REAPABLE.append((sc.applicationId, int(plan.rdd().id())))
    except Exception:
        pass


def reap_registered(spark: SparkSession) -> int:
    """Unpersist every registered block for the live session and clear
    the registry. Returns the number of RDDs actually freed. ONLY call
    between queries, after the previous query's result is fully
    consumed (see module comment above)."""
    sc = spark.sparkContext
    app = sc.applicationId
    jmap = sc._jsc.getPersistentRDDs()
    n = 0
    for a, rid in _REAPABLE:
        if a != app:
            continue
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
            n += 1
    _REAPABLE.clear()
    for df in _REAPABLE_DFS:
        try:
            if df.sparkSession.sparkContext.applicationId == app:
                df.unpersist(False)
                n += 1
        except Exception:
            pass  # session gone — nothing to free
    _REAPABLE_DFS.clear()
    return n


def persistent_rdd_count(spark: SparkSession) -> int:
    """Current number of persistent RDDs in the live context — the
    standing-block metric VERIFY_r14 records around sweeps."""
    return int(spark.sparkContext._jsc.getPersistentRDDs().size())


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

    def release_to_registry(self) -> None:
        """Hand the remaining generations to the sweep-boundary reaper
        (r14): an iterative query's FINAL checkpoint must outlive the
        query function (the returned DataFrame reads it), so it cannot
        be close()d here — registering it lets `reap_registered` free
        it once the sweep has consumed the query, instead of waiting
        on the GC backstop."""
        app = self._sc.applicationId
        for gen in self._generations:
            for rid in gen:
                _REAPABLE.append((app, rid))
        self._generations.clear()
