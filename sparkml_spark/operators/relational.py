"""§2.B row ops, §2.F sort/limit/top-k, §2.G set operations (SURVEY.md).

Everything here is a narrow transformation or a Catalyst-planned
shuffle op. Scale notes per operator in docstrings; the common thread:
filters/projections compile into the parquet scan (pushdown + pruning),
distinct/set-ops shuffle on the full row (fine — their inputs here are
key projections), and top-k uses TakeOrderedAndProject (per-partition
heap + driver merge of k, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkml_spark.registry import ZERO_VIOLATIONS, query
from sparkml_spark.sources.loader import load_table, load_tables

# ---------------------------------------------------------------------------
# §2.A scan — trivial but contractual: the columnar scan itself.
# ---------------------------------------------------------------------------


@query("scan_parquet", section="2.A", oracle="SELECT * FROM nation")
def scan_parquet(spark, sf_dir):
    """Full columnar scan of a fixture table."""
    return load_table(spark, sf_dir, "nation")


# ---------------------------------------------------------------------------
# §2.B projection / selection
# ---------------------------------------------------------------------------


@query(
    "project_rename",
    section="2.B",
    oracle="""
SELECT c_custkey AS custkey,
       c_name AS name,
       c_acctbal AS acctbal,
       c_acctbal * 1.05 AS acctbal_adj,
       upper(c_mktsegment) AS segment
FROM customer
""",
)
def project_rename(spark, sf_dir):
    """Column subset + renames + computed column (per-row double math is
    IEEE-identical across engines, so no rounding needed)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        (F.col("c_acctbal") * 1.05).alias("acctbal_adj"),
        F.upper("c_mktsegment").alias("segment"),
    )


@query(
    "filter_compare",
    section="2.B",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity > 45.0 AND l_extendedprice >= 1000.0
""",
)
def filter_compare(spark, sf_dir):
    """Numeric comparisons — both predicates reach the parquet scan as
    PushedFilters (verified in plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") > 45.0) & (F.col("l_extendedprice") >= 1000.0)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "filter_in",
    section="2.B",
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
""",
)
def filter_in(spark, sf_dir):
    """IN-list membership (compiles to an In pushed filter)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY")).select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "filter_between",
    section="2.B",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice BETWEEN 50000 AND 100000
""",
)
def filter_between(spark, sf_dir):
    """Range predicate."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice").between(50000, 100000)).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "filter_like",
    section="2.B",
    oracle="""
SELECT p_partkey, p_name, p_type FROM part
WHERE p_name LIKE '%gold%' OR p_type LIKE 'SMALL%'
""",
)
def filter_like(spark, sf_dir):
    """LIKE patterns (leading-wildcard and prefix forms; the prefix form
    pushes down as StringStartsWith)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%gold%") | F.col("p_type").like("SMALL%")).select(
        "p_partkey", "p_name", "p_type"
    )


@query(
    "filter_null",
    section="2.B",
    oracle="""
SELECT c_custkey,
       c_acctbal IS NULL AS bal_is_null,
       c_acctbal IS NOT NULL AS bal_is_not_null
FROM customer
WHERE c_acctbal IS NOT NULL
""",
)
def filter_null(spark, sf_dir):
    """NULL tests (fixtures have no NULL keys — the IS NOT NULL branch is
    the total set, and the projected flags prove the semantics)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal").isNotNull()).select(
        "c_custkey",
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.col("c_acctbal").isNotNull().alias("bal_is_not_null"),
    )


@query(
    "filter_boolean",
    section="2.B",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE (o_orderstatus = 'F' OR o_orderpriority = '1-URGENT')
  AND NOT (o_totalprice < 10000)
""",
)
def filter_boolean(spark, sf_dir):
    """Compound AND / OR / NOT predicate."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_orderpriority") == "1-URGENT"))
        & ~(F.col("o_totalprice") < 10000)
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "case_when",
    section="2.B",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 150000 THEN 'large'
            WHEN o_totalprice >= 50000 THEN 'medium'
            ELSE 'small' END AS size_bucket
FROM orders
""",
)
def case_when(spark, sf_dir):
    """Conditional projection."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 150000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_bucket"),
    )


@query(
    "cast_types",
    section="2.B",
    oracle="""
SELECT l_orderkey,
       CAST(l_linenumber AS BIGINT) AS line_big,
       CAST(l_orderkey AS VARCHAR) AS okey_str,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       CAST(l_quantity AS DOUBLE) AS qty_dbl,
       CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
""",
)
def cast_types(spark, sf_dir):
    """Explicit casts. Note: double→int truncates in Spark but ROUNDS in
    DuckDB, so portable integerization goes through an explicit FLOOR."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("bigint").alias("line_big"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.floor("l_quantity").alias("qty_floor"),
        F.col("l_quantity").cast("double").alias("qty_dbl"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )


@query(
    "distinct_rows",
    section="2.B",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_rows(spark, sf_dir):
    """Duplicate elimination — planned as a hash aggregate on all
    columns; at scale project FIRST so the shuffle carries only the
    distinct key columns (done here)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query("sample_deterministic", section="2.B")
def sample_deterministic(spark, sf_dir):
    """Seeded Bernoulli sample (ROWS tier — Spark's XORShift RNG stream
    intentionally differs from DuckDB's; same seed ⇒ same Spark rows)."""
    o = load_table(spark, sf_dir, "orders")
    return o.sample(fraction=0.1, seed=42).select("o_orderkey", "o_totalprice")


@query("sample_deterministic_bound", section="2.B", oracle=ZERO_VIOLATIONS)
def sample_deterministic_bound(spark, sf_dir):
    """ORACLE pin for sample_deterministic (VERDICT r6 #3): the RNG
    stream is engine-private, but seed-stability is not — two
    independent scans sampled with the SAME seed over the same
    partition layout must select the IDENTICAL row multiset (that is
    the op's entire contract), and the sample must be proper (neither
    empty nor the whole table at fraction 0.1). Violations = rows in
    the symmetric difference + 1 per broken properness side; oracle
    pins 0."""
    s1 = (
        load_table(spark, sf_dir, "orders")
        .sample(fraction=0.1, seed=42)
        .select("o_orderkey")
    )
    s2 = (
        load_table(spark, sf_dir, "orders")
        .sample(fraction=0.1, seed=42)
        .select("o_orderkey")
    )
    sym = s1.exceptAll(s2).unionAll(s2.exceptAll(s1)).agg(
        F.count(F.lit(1)).alias("n_diff")
    )
    counts = s1.agg(F.count(F.lit(1)).alias("n_sample")).crossJoin(
        load_table(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("n_total"))
    )
    viol = (
        F.col("n_diff")
        + (F.col("n_sample") == 0).cast("bigint")
        + (F.col("n_sample") >= F.col("n_total")).cast("bigint")
    )
    return sym.crossJoin(counts).select(viol.alias("n_violations"))


# ---------------------------------------------------------------------------
# §2.F sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "sort_multi",
    section="2.F",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC
""",
)
def sort_multi(spark, sf_dir):
    """Multi-column global sort (range-partitioned exchange + per-part
    sort at scale). Hash check is order-insensitive, so parity here
    verifies the row SET is stable under sort."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_mktsegment", "c_acctbal").orderBy(
        F.col("c_mktsegment").asc_nulls_first(),
        F.col("c_acctbal").desc(),
        F.col("c_custkey").asc(),
    )


@query(
    "limit_offset",
    section="2.F",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_orderkey
LIMIT 100 OFFSET 50
""",
)
def limit_offset(spark, sf_dir):
    """Deterministic pagination: total order on the unique PK, then
    offset+limit."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(50).limit(100)
    )


@query(
    "topk_global",
    section="2.F",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def topk_global(spark, sf_dir):
    """Global top-10 — Spark plans TakeOrderedAndProject (per-partition
    heap of k, merged on the driver; no full sort, no wide shuffle —
    exactly the 100 TB-safe shape). Tie-broken on the unique PK."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.G set operations — inputs are single-column key projections, so
# the dedup shuffles are as narrow as possible.
# ---------------------------------------------------------------------------


@query(
    "union_all",
    section="2.G",
    oracle="""
SELECT c_custkey AS custkey FROM customer
UNION ALL
SELECT o_custkey AS custkey FROM orders
""",
)
def union_all(spark, sf_dir):
    """Bag union (no dedup — pure concatenation of partitions, no
    shuffle at all)."""
    t = load_tables(spark, sf_dir)
    return t.customer.select(F.col("c_custkey").alias("custkey")).unionByName(
        t.orders.select(F.col("o_custkey").alias("custkey"))
    )


@query(
    "union_distinct",
    section="2.G",
    oracle="""
SELECT c_custkey AS custkey FROM customer
UNION
SELECT o_custkey AS custkey FROM orders
""",
)
def union_distinct(spark, sf_dir):
    """Set union (concat + hash-distinct)."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_custkey").alias("custkey"))
        .unionByName(t.orders.select(F.col("o_custkey").alias("custkey")))
        .distinct()
    )


@query(
    "intersect_distinct",
    section="2.G",
    oracle="""
SELECT c_custkey AS custkey FROM customer
INTERSECT
SELECT o_custkey AS custkey FROM orders
""",
)
def intersect_distinct(spark, sf_dir):
    """Customers that placed at least one order (set intersect)."""
    t = load_tables(spark, sf_dir)
    return t.customer.select(F.col("c_custkey").alias("custkey")).intersect(
        t.orders.select(F.col("o_custkey").alias("custkey"))
    )


@query(
    "intersect_all",
    section="2.G",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def intersect_all(spark, sf_dir):
    """Bag intersect (multiplicity = min of the two sides)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersectAll(op)


@query(
    "except_distinct",
    section="2.G",
    oracle="""
SELECT c_custkey AS custkey FROM customer
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
""",
)
def except_distinct(spark, sf_dir):
    """Customers with no in-progress ('P') order (set difference;
    `subtract` is Spark's EXCEPT DISTINCT)."""
    t = load_tables(spark, sf_dir)
    in_progress = t.orders.filter(F.col("o_orderstatus") == "P")
    return t.customer.select(F.col("c_custkey").alias("custkey")).subtract(
        in_progress.select(F.col("o_custkey").alias("custkey"))
    )


@query(
    "except_all",
    section="2.G",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
""",
)
def except_all(spark, sf_dir):
    """Bag difference (multiplicity-aware)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.exceptAll(op)


@query(
    "sample_hash_deterministic",
    section="2.B",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS h2
FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
""",
)
def sample_hash_deterministic(spark, sf_dir):
    """Reproducible ~10% sample via a content hash instead of an RNG:
    keep rows whose md5(key) 2-hex prefix < '1a' (26/256 ~ 10.2%).
    Unlike `sample_deterministic` (seeded RNG, engine-specific stream)
    this is engine-independent and STABLE under repartitioning, retry,
    and incremental reprocessing — the property a 100 TB pipeline
    actually needs from a sample (the same rows are sampled tomorrow).
    Embarrassingly parallel: a per-row filter, fully pushed past the
    scan, no shuffle. md5 parity Spark<->DuckDB verified on fixtures."""
    o = load_table(spark, sf_dir, "orders")
    h2 = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
    return (
        o.withColumn("h2", h2)
        .filter(F.col("h2") < "1a")
        .select("o_orderkey", "o_custkey", "o_totalprice", "h2")
    )


@query(
    "sample_stratified_hash",
    section="2.B",
    oracle="""
SELECT event_id, event_type, user_id, value
FROM events
WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <
      CASE event_type
        WHEN 'view' THEN '0d'
        WHEN 'click' THEN '1a'
        WHEN 'purchase' THEN '80'
        ELSE 'g'
      END
""",
)
def sample_stratified_hash(spark, sf_dir):
    """Deterministic stratified sampling (`sampleBy` twin): per-stratum
    keep-rates via hash thresholds — views ~5% ('0d'=13/256), clicks
    ~10% ('1a'), purchases 50% ('80'), everything else kept ('g' sorts
    above any hex prefix). The downsample-the-majority-class shape of
    training-set construction, reproducible across engines and runs.
    Single scan, no shuffle, no RNG state."""
    e = load_table(spark, sf_dir, "events")
    thr = (
        F.when(F.col("event_type") == "view", "0d")
        .when(F.col("event_type") == "click", "1a")
        .when(F.col("event_type") == "purchase", "80")
        .otherwise("g")
    )
    h2 = F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
    return e.filter(h2 < thr).select("event_id", "event_type", "user_id", "value")


@query(
    "stat_crosstab",
    section="2.D",
    oracle="""
SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders
GROUP BY o_orderpriority
""",
)
def stat_crosstab(spark, sf_dir):
    """`df.stat.crosstab` — the contingency-table one-liner (pairwise
    frequency of two categoricals). Exact counts, so ORACLE-tier: the
    oracle reproduces Spark's column naming contract (first column
    `{col1}_{col2}`, one column per distinct col2 value). Same
    physical shape as a pivot: single hash agg over the pair key."""
    o = load_table(spark, sf_dir, "orders")
    ct = o.stat.crosstab("o_orderpriority", "o_orderstatus")
    return ct.select(
        "o_orderpriority_o_orderstatus",
        F.col("F").cast("bigint").alias("F"),
        F.col("O").cast("bigint").alias("O"),
        F.col("P").cast("bigint").alias("P"),
    )


@query("stat_freq_items", section="2.B")
def stat_freq_items(spark, sf_dir):
    """`df.stat.freqItems` — single-pass approximate heavy hitters
    (Karp-Shenker-Papadimitriou counters). ROWS tier: the sketch may
    include false positives by contract, so the pinned guarantee is
    CONTAINMENT — every event_type with support > 15% must appear —
    asserted in tests/test_operators.py against the exact counts.
    Scale: one narrow pass, per-partition counter maps merged on the
    driver; no shuffle of the data itself."""
    e = load_table(spark, sf_dir, "events")
    fi = e.stat.freqItems(["event_type"], support=0.15)
    # CSV-serialized: flat scalar output by contract (driver
    # canonicalizer cannot hash array cells, VERDICT r5 #1).
    return fi.select(
        F.array_join(
            F.sort_array(F.col("event_type_freqItems")), ","
        ).alias("frequent_event_types_csv")
    )


@query("stat_freq_items_bound", section="2.B", oracle=ZERO_VIOLATIONS)
def stat_freq_items_bound(spark, sf_dir):
    """ORACLE pin for stat_freq_items (VERDICT r6 #3): the KSP sketch's
    exact output is engine-private (false positives allowed by
    contract), but its CONTAINMENT guarantee is not — every event_type
    whose exact support exceeds 15% MUST appear in the returned set.
    Violations = truly-frequent types missing from the sketch output;
    oracle pins 0. (This lifts the tests/test_operators.py assertion
    into driver-hash evidence.)"""
    e = load_table(spark, sf_dir, "events")
    fi = e.stat.freqItems(["event_type"], support=0.15).select(
        F.col("event_type_freqItems").alias("found")
    )
    exact = (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(e.agg(F.count(F.lit(1)).alias("total")))
        .filter(F.col("n") > 0.15 * F.col("total"))
    )
    missing = ~F.array_contains(F.col("found"), F.col("event_type"))
    return exact.crossJoin(F.broadcast(fi)).agg(
        F.count_if(missing).alias("n_violations")
    )


@query("stat_sampleby_seeded", section="2.B")
def stat_sampleby_seeded(spark, sf_dir):
    """`df.stat.sampleBy` — per-stratum seeded Bernoulli sampling (the
    RNG twin of sample_stratified_hash; same fractions). ROWS tier:
    Spark's stratified RNG stream is engine-specific but seed-stable.
    Prefer the hash variant for anything that must be reproducible
    across engines or incremental runs."""
    e = load_table(spark, sf_dir, "events")
    return e.stat.sampleBy(
        "event_type",
        {"view": 0.05, "click": 0.10, "purchase": 0.5, "signup": 1.0, "error": 1.0},
        seed=42,
    ).select("event_id", "event_type", "user_id", "value")


@query("stat_sampleby_bound", section="2.B", oracle=ZERO_VIOLATIONS)
def stat_sampleby_bound(spark, sf_dir):
    """ORACLE pin for stat_sampleby_seeded (VERDICT r6 #3): per-stratum
    RNG draws are engine-private, but (a) same seed twice must select
    the identical event_id set, and (b) fraction-1.0 strata ('signup',
    'error') must be sampled COMPLETELY — an exact invariant, no RNG
    involved. Violations = symmetric-difference rows + per-stratum
    completeness breaks; oracle pins 0."""
    fr = {"view": 0.05, "click": 0.10, "purchase": 0.5, "signup": 1.0, "error": 1.0}

    def draw():
        return (
            load_table(spark, sf_dir, "events")
            .stat.sampleBy("event_type", fr, seed=42)
            .select("event_id", "event_type")
        )

    s1, s2 = draw(), draw()
    sym = (
        s1.select("event_id")
        .exceptAll(s2.select("event_id"))
        .unionAll(s2.select("event_id").exceptAll(s1.select("event_id")))
        .agg(F.count(F.lit(1)).alias("n_diff"))
    )
    full = F.col("event_type").isin("signup", "error")
    n_full_src = (
        load_table(spark, sf_dir, "events")
        .agg(F.count_if(full).alias("n_src"))
    )
    n_full_smp = s1.agg(F.count_if(full).alias("n_smp"))
    viol = F.col("n_diff") + (F.col("n_smp") != F.col("n_src")).cast("bigint")
    return sym.crossJoin(n_full_src).crossJoin(n_full_smp).select(
        viol.alias("n_violations")
    )


@query(
    "union_by_name_missing",
    section="2.G",
    oracle="""
SELECT doc_id, lang, n_chars, 'full' AS src FROM documents WHERE lang = 'en'
UNION ALL
SELECT doc_id, lang, NULL AS n_chars, 'slim' AS src
FROM documents WHERE lang = 'fr'
""",
)
def union_by_name_missing(spark, sf_dir):
    """unionByName(allowMissingColumns=True): schema-drifted branches
    united by COLUMN NAME (positional union silently mis-aligns after
    drift — the classic multi-source ingestion bug), missing columns
    null-filled. The scan-level twin of scan_schema_evolution."""
    d = load_table(spark, sf_dir, "documents")
    full = d.filter(F.col("lang") == "en").select(
        "doc_id", "lang", "n_chars", F.lit("full").alias("src")
    )
    slim = d.filter(F.col("lang") == "fr").select(
        "doc_id", F.lit("slim").alias("src"), "lang"  # different order + missing col
    )
    return full.unionByName(slim, allowMissingColumns=True)


@query(
    "merge_upsert_batch",
    section="2.B",
    oracle="""
WITH batch AS (
  SELECT doc_id, 'upsert' AS op, n_chars + 1000 AS n_chars
  FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id, 'delete' AS op, n_chars
  FROM documents WHERE doc_id % 13 = 0 AND doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, 'upsert' AS op, n_chars
  FROM documents WHERE doc_id % 11 = 0
)
SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
       COALESCE(b.n_chars, c.n_chars) AS n_chars,
       CASE WHEN b.doc_id IS NULL THEN 'kept'
            WHEN c.doc_id IS NULL THEN 'inserted'
            ELSE 'updated' END AS action
FROM documents c FULL OUTER JOIN batch b ON c.doc_id = b.doc_id
WHERE b.op IS NULL OR b.op <> 'delete'
""",
)
def merge_upsert_batch(spark, sf_dir):
    """MERGE INTO semantics (the lakehouse upsert: WHEN MATCHED AND
    op='delete' THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT
    MATCHED AND op<>'delete' THEN INSERT) emulated relationally over a
    deterministic arriving batch — updates for doc_id%7, deletes for
    doc_id%13 (non-overlapping), inserts at doc_id+2M for doc_id%11.
    Spark 4's SQL MERGE needs a v2 table provider (Delta/Iceberg);
    this is the identical row algebra as ONE full-outer equi join, so
    the semantics are portable to any sink and hash-checkable here.

    Scale: a single key-partitioned full-outer join (both sides
    shuffle once on doc_id) + a narrow action projection — the same
    shape Delta's MERGE executes after file pruning; deletes drop
    map-side, never materializing a tombstone table."""
    c = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    d = load_table(spark, sf_dir, "documents")
    batch = (
        d.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id", F.lit("upsert").alias("op"),
                (F.col("n_chars") + 1000).alias("b_chars"))
        .unionByName(
            d.filter((F.col("doc_id") % 13 == 0) & (F.col("doc_id") % 7 != 0))
            .select("doc_id", F.lit("delete").alias("op"),
                    F.col("n_chars").alias("b_chars"))
        )
        .unionByName(
            d.filter(F.col("doc_id") % 11 == 0)
            .select((F.col("doc_id") + 2000000).alias("doc_id"),
                    F.lit("upsert").alias("op"),
                    F.col("n_chars").alias("b_chars"))
        )
        .select(F.col("doc_id").alias("b_id"), "op", "b_chars")
    )
    joined = c.join(batch, c.doc_id == batch.b_id, "full_outer")
    action = (
        F.when(F.col("b_id").isNull(), "kept")
        .when(F.col("doc_id").isNull(), "inserted")
        .otherwise("updated")
    )
    return (
        joined.filter(F.col("op").isNull() | (F.col("op") != "delete"))
        .select(
            F.coalesce(F.col("doc_id"), F.col("b_id")).alias("doc_id"),
            F.coalesce(F.col("b_chars"), F.col("n_chars")).alias("n_chars"),
            action.alias("action"),
        )
    )
