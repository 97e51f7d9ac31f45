"""CLI: run any registered query by name.

    python -m sparkml_spark <query_id> [--sf-dir DIR] [--explain] [--limit N]
    python -m sparkml_spark --list

Prints the result (bounded by --limit) or the formatted physical plan.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser(prog="sparkml_spark")
    ap.add_argument("query", nargs="?", help="query id (see --list / COVERAGE.md)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--explain", action="store_true", help="print the physical plan instead of rows")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--list", action="store_true", help="list query ids and tiers")
    args = ap.parse_args()

    import sparkml_spark.operators  # noqa: F401
    from sparkml_spark.registry import META, ORACLES, QUERIES

    if args.list or not args.query:
        for name in sorted(QUERIES):
            print(f"{name:35s} {META[name]['tier']:6s} §{META[name]['section']}")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query: {args.query} (try --list)", file=sys.stderr)
        return 2

    from sparkml_spark.session import get_spark

    spark = get_spark("sparkml_spark-cli")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        from sparkml_spark.plans import formatted_plan

        print(formatted_plan(df))
    else:
        df.show(args.limit, truncate=False)
        if args.query in ORACLES:
            print(f"-- ORACLE-tier: DuckDB twin available via oracle_sql()['{args.query}']")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
