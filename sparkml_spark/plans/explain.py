"""Physical-plan inspection helpers (SURVEY.md §4).

The engine's performance contract is expressed as assertions over the
plan text (tests/test_plans.py): filters reach the scan, projections
prune the read schema, dim joins broadcast, top-k avoids full sorts,
aggregations are partial→final. These are the properties that decide
whether a query survives a 100× scale-up, checked on every CI run —
not just eyeballed once.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text (plus codegen ids)."""
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def executed_plan(df: DataFrame) -> str:
    """Simple-mode physical plan string."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each scan's ReadSchema (pruning evidence)."""
    cols = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols.append([c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()])
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastExchange" in formatted_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Partial→final hash aggregation (map-side combine before the
    exchange)."""
    plan = formatted_plan(df)
    return bool(re.search(r"partial_", plan)) and "HashAggregate" in plan


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the plan — the
    quantity to minimize; broadcast exchanges are excluded."""
    plan = formatted_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange SinglePartition", plan))
