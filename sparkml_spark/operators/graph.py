"""Graph / iterative-algorithm operators (§2.I adjuncts): transitive
closure by iterative self-extension and weighted PageRank over an
aggregated trade graph. Together with dedup_cc_clusters (connected
components, llm_dedup.py) these cover the iterative-DataFrame pattern
the reference's MLlib side implies (ALS & co are iterative too).

Scale story (the honest one): the EDGE EXTRACTION is the 100 TB part —
big fact joins that Catalyst plans with broadcast dims and one fact
shuffle. The iteration then runs on the aggregated graph, which is
orders of magnitude smaller (nations: 25 nodes; user hierarchy: one
row per user). Iterating DataFrames over the raw fact table would be
the anti-pattern; aggregate first, iterate small.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkml_spark.registry import query
from sparkml_spark.sources.loader import load_table


@query(
    "hierarchy_closure",
    section="2.I",
    oracle="""
WITH RECURSIVE nodes AS (
  SELECT DISTINCT user_id + 1 AS node FROM events
), anc AS (
  SELECT node, node AS ancestor, 0 AS depth FROM nodes
  UNION ALL
  SELECT node, ancestor // 2 AS ancestor, depth + 1 AS depth
  FROM anc WHERE ancestor > 1
)
SELECT node, ancestor, depth FROM anc
""",
)
def hierarchy_closure(spark, sf_dir):
    """Transitive closure of a hierarchy (ancestor list per node) by
    iterative frontier extension — Spark has no recursive CTE, so the
    recursion is an explicit loop: frontier' = step(frontier), closure
    = union of all frontiers. The hierarchy is the binary tree
    parent(n) = n DIV 2 over node = user_id + 1 (root 1), so depth is
    bounded by log2(max_id) — ~40 iterations even at 100 TB id ranges.

    One driver-side action total (the max-node scalar that bounds the
    loop); each iteration is a narrow projection+filter, no shuffle,
    and the final union is flattened by Catalyst into one scan tree.
    Oracle: the same recursion as a DuckDB WITH RECURSIVE."""
    e = load_table(spark, sf_dir, "events")
    nodes = e.select((F.col("user_id") + 1).alias("node")).distinct()
    max_node = nodes.agg(F.max("node")).collect()[0][0]  # scalar loop bound
    levels = [
        nodes.select("node", F.col("node").alias("ancestor"), F.lit(0).alias("depth"))
    ]
    frontier = levels[0]
    depth = 0
    while (1 << depth) <= max_node:
        depth += 1
        frontier = frontier.filter(F.col("ancestor") > 1).select(
            "node",
            F.expr("ancestor DIV 2").alias("ancestor"),
            F.lit(depth).alias("depth"),
        )
        levels.append(frontier)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def _pagerank_oracle(iters: int = 20) -> str:
    """Unrolled fixed-iteration PageRank as DuckDB SQL: 20 chained
    CTEs pr0..pr20, each mirroring the Spark iteration exactly —
    per-term ROUND(rank*p, 12) quantized onto DECIMAL(27,12) before
    the (order-independent, exact) decimal sum, then
    0.15/n + 0.85*double(sum). All float literals are CAST to DOUBLE
    so DuckDB doesn't run them through its DECIMAL literal type
    (decimal 0.15/25 and IEEE 0.15/25 can differ in the last ulp).
    Every CTE is MATERIALIZED: DuckDB otherwise inlines the chain, so
    each pr_i re-expands norm/nodes (each a 6-table join) and the
    20-deep plan explodes combinatorially (observed: >120 s vs ~1 s
    materialized)."""
    head = """
WITH edges AS MATERIALIZED (
  SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  GROUP BY cn.n_name, sn.n_name
),
out_w AS MATERIALIZED (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
norm AS MATERIALIZED (
  SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / CAST(o.ow AS DOUBLE) AS p
  FROM edges e JOIN out_w o ON e.src = o.src
),
nodes AS MATERIALIZED (
  SELECT src AS node FROM norm UNION SELECT dst AS node FROM norm
),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
pr0 AS MATERIALIZED (
  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes
)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(
            f""",
pr{i} AS MATERIALIZED (
  SELECT nd.node,
         CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
           + CAST(0.85 AS DOUBLE) * CAST(COALESCE(c.s, 0) AS DOUBLE) AS rank
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS node,
           SUM(CAST(ROUND(p.rank * e.p, 12) AS DECIMAL(27,12))) AS s
    FROM norm e JOIN pr{i - 1} p ON e.src = p.node
    GROUP BY e.dst
  ) c ON nd.node = c.node
)"""
        )
    tail = f"\nSELECT node, ROUND(rank, 6) AS pagerank FROM pr{iters}"
    return head + "".join(steps) + tail


@query("graph_pagerank", section="2.I", oracle=_pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    """Weighted PageRank over the nation-to-nation trade graph: edge
    (customer nation -> supplier nation) weighted by lineitem count,
    extracted with the Q5-style join pipeline (dims broadcast, one
    fact shuffle), then 20 power iterations with damping 0.85 on the
    25-node aggregate. ORACLE tier since round 2: the fixed iteration
    is unrolled into 20 chained DuckDB CTEs (`_pagerank_oracle`) —
    per-term quantization onto a decimal grid before summation makes
    every iteration's sum exact and order-independent in BOTH engines,
    so the hashes match bit-for-bit. The test additionally asserts
    ranks sum to 1 and the iteration is deterministic.

    At scale: iterate on the AGGREGATED graph (nodes x nodes max),
    never the fact table; each iteration is a broadcast join of the
    rank vector against the edge list — no large shuffle inside the
    loop."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("dst")
    )
    edges = (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nkey"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    ).cache()
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm = edges.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    ).cache()
    nodes = (
        norm.select(F.col("src").alias("node"))
        .union(norm.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(20):
        contrib = norm.join(ranks, norm.src == ranks.node).select(
            F.col("dst").alias("node"),
            # quantize each term so the (order-nondeterministic) sum of
            # doubles is exact on a fixed grid -> deterministic ranks
            F.round(F.col("rank") * F.col("p"), 12).cast("decimal(27,12)").alias("t"),
        )
        ranks = (
            nodes.join(contrib.groupBy("node").agg(F.sum("t").alias("s")), "node", "left")
            .select(
                "node",
                (
                    F.lit(0.15 / n_nodes)
                    + 0.85 * F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            # truncate lineage each step: without this the logical plan
            # doubles per iteration (ranks appears under contrib) and
            # analysis alone OOMs by ~iteration 15. The checkpointed
            # state is 25 rows — this is the standard iterative-DF move.
            # coalesce(1): keep the tiny state in one partition so each
            # iteration doesn't schedule 32 near-empty tasks.
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.round("rank", 6).alias("pagerank"))
