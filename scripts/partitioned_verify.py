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


def build_layout(base_dir: str, out_dir: str) -> None:
    """Rebuild every fixture table as _N_FILES part files. Rebuilt from
    scratch whenever the marker is missing; the marker records the
    source dir so a --sf-dir change invalidates the cache."""
    marker = os.path.join(out_dir, ".layout_complete")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == base_dir:
                return
    import shutil

    from pyspark.sql import SparkSession

    from sparkml_spark.sources.loader import TABLES

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
        f.write(base_dir + "\n")


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
