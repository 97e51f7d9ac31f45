"""Standing t2 pass over a MULTI-FILE parquet layout (VERDICT r11 #3).

The committed fixtures are single-file parquet, so every per-round t2
comparison reads rows in one fixed order. A real corpus is thousands
of part files whose merge order Spark does not promise — a different
row order means a different float summation order, which is exactly
the class of fragility (order-sensitive aggregation, non-commutative
rounding, implicit head-of-file assumptions) a hash-compare gate must
cover. This script rebuilds the sf0.01 fixtures as an N-file layout
(raw reads — physical dtypes preserved, so the loader's dtype-gated
ts repair sees the same input) and runs the FULL driver_sim t2
protocol against it: every ORACLE query hash-compared against DuckDB
reading the same multi-file layout, every ROWS query executed.

Deliberately flat (repartition(N)), not hive-partitioned: a partition
column would change the Spark-visible schema of every `select *`
query and break oracle parity by construction; the hive mechanics
(pruning, PartitionFilters) are separately plan-asserted in
scripts/partitioned_bench.py. This stage's job is row-order and
multi-split robustness of all 400+ oracles, every round.

Usage: python scripts/partitioned_verify.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_N_FILES = 4


def _layout_signature(base_dir: str, tables) -> str:
    """Cache key for the rebuilt layout: source dir + the table list +
    each source file's (size, mtime) census. Regenerating the fixtures
    in place, adding a table to TABLES, or touching any source parquet
    changes the signature and forces a rebuild — previously the marker
    recorded only base_dir, so the standing multifile t2 gate could
    silently verify a stale or incomplete layout (ADVICE r12)."""
    import json

    census = []
    for t in tables:
        src = os.path.join(base_dir, f"{t}.parquet")
        paths = (
            sorted(
                os.path.join(r, f)
                for r, _, fs in os.walk(src)
                for f in fs
            )
            if os.path.isdir(src)
            else [src]
        )
        for p in paths:
            st = os.stat(p)
            census.append([os.path.relpath(p, base_dir), st.st_size,
                           int(st.st_mtime_ns)])
    return json.dumps({"base": base_dir, "tables": list(tables),
                       "files": census}, sort_keys=True)


def build_layout(base_dir: str, out_dir: str) -> None:
    """Rebuild every fixture table as _N_FILES part files. Rebuilt from
    scratch whenever the marker is missing or its recorded signature
    (source dir + TABLES + per-file size/mtime) no longer matches."""
    import shutil

    from pyspark.sql import SparkSession

    from sparkml_spark.sources.loader import TABLES

    sig = _layout_signature(base_dir, TABLES)
    marker = os.path.join(out_dir, ".layout_complete")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == sig.strip():
                return

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("partitioned-verify-build")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    try:
        for t in TABLES:
            src = os.path.join(base_dir, f"{t}.parquet")
            dst = os.path.join(out_dir, f"{t}.parquet")
            # Raw read + round-robin repartition: keeps physical dtypes
            # AND scatters neighboring rows into different files, the
            # adversarial row order for order-sensitive float sums.
            spark.read.parquet(src).repartition(_N_FILES).write.parquet(dst)
    finally:
        spark.stop()
    with open(marker, "w") as f:
        f.write(sig + "\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        repo, ".artifacts", "partverify",
        os.path.basename(args.sf_dir.rstrip("/")),
    )
    build_layout(args.sf_dir, out_dir)
    # Fresh interpreter for the sim itself: the build session above
    # must not leak confs into the driver-parity "plain session" run.
    cmd = [
        sys.executable, os.path.join(repo, "scripts", "driver_sim.py"),
        "--sf-dir", out_dir, *args.names,
    ]
    return subprocess.call(cmd)


if __name__ == "__main__":
    raise SystemExit(main())
