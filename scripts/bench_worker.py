"""Steady-state bench worker for the cross-round A/B control
(VERDICT r9 #1).

Runs the headline suite of ONE code version (the repo root passed as
argv[1] — typically a temp worktree at the previous round's
end-of-round commit) and serves per-query steady timings over a
line protocol on stdin/stdout, so the parent (bench.py at HEAD) can
interleave its own measurements with this worker's query-by-query in
the same wall-clock session. Interleaving is what makes the
comparison environment-controlled: any machine-level shift hits both
series identically, so the HEAD/prev ratio isolates CODE regressions
— the failure mode of round 9, where a +53% absolute move passed on
an "environment band" narrative verified for only one query.

Protocol (stdout is reserved for the protocol; Spark logs to stderr):
  -> READY {"queries": [...]}        after plans are prepared + warmed
  <- <bench_name>\n                  parent requests one execution
  -> TIME <bench_name> <seconds>\n   one steady execution of the
                                     prepared plan (collect)
  <- exit\n                          shut down
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time


def main() -> int:
    root = os.path.abspath(sys.argv[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, root)

    from sparkml_spark.session import get_spark  # the WORKTREE's package

    import sparkml_spark.operators  # noqa: F401
    from sparkml_spark.registry import QUERIES

    # the worktree's own headline map (names are stable across rounds)
    spec = importlib.util.spec_from_file_location(
        "prev_bench", os.path.join(root, "bench.py")
    )
    prev_bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(prev_bench)
    headline = prev_bench.HEADLINE

    spark = get_spark("sparkml_spark-bench-ab", master=f"local[{cpus}]")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    dfs = {}
    for bench_name, qid in headline.items():
        dfs[bench_name] = QUERIES[qid](spark, sf_dir)
        dfs[bench_name].collect()  # warmup: JIT + codegen + AQE stats

    print("READY " + json.dumps({"queries": list(headline)}), flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if not cmd:
            continue
        if cmd == "exit":
            break
        t0 = time.time()
        dfs[cmd].collect()
        print(f"TIME {cmd} {time.time() - t0:.4f}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
