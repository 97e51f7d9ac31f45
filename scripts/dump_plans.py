"""Dump `.explain("formatted")` for registered queries to plan files.

Optimization-round evidence (guide §1.1/§7.2): the judge checks plan
claims (Exchange counts, join strategies, PushedFilters, ReadSchema,
BatchEvalPython nodes) against these committed files. Usage:

  python scripts/dump_plans.py --out plans/r13 --suffix before \
      [--sf-dir /root/testdata/sf0.1] names...

With no names, dumps the six headline bench queries.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
    from sparkml_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("dump-plans", master=f"local[{cpus}]")

    import sparkml_spark.operators  # noqa: F401
    from sparkml_spark.registry import QUERIES

    if args.names:
        names = args.names
    else:
        from bench import HEADLINE

        names = list(HEADLINE.values())

    os.makedirs(args.out, exist_ok=True)
    for qid in names:
        df = QUERIES[qid](spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{qid}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
