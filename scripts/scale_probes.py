"""One-off scale probes behind SCALE.md's measured claims that don't
fit the stress harness's base-vs-scaled timing shape.

  cc      iterative connected-components dedup at base vs ×k — pins
          that round count is set by cluster DIAMETER, not corpus
          size (warm wall, exact output-count scaling).
  stream  watermarked streaming tumbling agg replayed over the ×k
          events build — pins events/s and that state stays EXACTLY
          3600 windows × event_type regardless of input volume.

Both expect the scalebench x{k}p2 build to exist (run
stress_scale.py first). Prints one JSON line per probe.

Usage: python scripts/scale_probes.py [cc|stream|all] [--k 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _dirs(k: int, sf_dir: str) -> tuple[str, str]:
    scaled = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".artifacts",
        "scalebench",
        f"x{k}p2_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    if not os.path.isdir(scaled):
        raise SystemExit(f"{scaled} missing — run stress_scale.py --k {k} first")
    return sf_dir, scaled


def probe_cc(spark, k: int, sf_dir: str) -> dict:
    from sparkml_spark.registry import QUERIES

    base, scaled = _dirs(k, sf_dir)
    out = {}
    for _warm in (True, False):  # first pass warms JVM/codegen for BOTH dirs
        for name, d in (("base", base), ("scaled", scaled)):
            t0 = time.time()
            n = QUERIES["dedup_cc_clusters"](spark, d).count()
            out[name] = {"rows": n, "seconds": round(time.time() - t0, 2)}
    return {
        "metric": "cc_dedup_probe",
        "k": k,
        **out,
        "ratio": round(out["scaled"]["seconds"] / max(out["base"]["seconds"], 1e-9), 1),
    }


def probe_stream(spark, k: int, sf_dir: str) -> dict:
    from sparkml_spark.registry import QUERIES

    _, scaled = _dirs(k, sf_dir)
    n = spark.read.parquet(os.path.join(scaled, "events.parquet")).count()
    t0 = time.time()
    res = QUERIES["stream_tumbling_agg"](spark, scaled)
    windows = res.count()
    dt = time.time() - t0
    return {
        "metric": "stream_replay_probe",
        "k": k,
        "events": n,
        "state_rows": windows,
        "seconds": round(dt, 1),
        "events_per_sec": round(n / dt),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("probe", choices=["cc", "stream", "all"], nargs="?", default="all")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from sparkml_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    spark = get_spark("sparkml_spark-scale-probes")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    import sparkml_spark.operators  # noqa: F401
    import sparkml_spark.streaming.ops  # noqa: F401

    probes = {"cc": probe_cc, "stream": probe_stream}
    names = list(probes) if args.probe == "all" else [args.probe]
    for name in names:
        print(json.dumps(probes[name](spark, args.k, args.sf_dir)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
