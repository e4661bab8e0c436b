#!/usr/bin/env python
"""Isolated per-query timing with bench.py's exact methodology
(plan-build + drain action, reps, medians+minima, canary2) for the
round-13 optimization loop.

Usage: python tools/time_queries.py [sf_dir] name [name ...]
Env: TQ_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]
    reps = int(os.environ.get("TQ_REPS", "3"))

    import bench
    from deathmetal_datalake_spark.plans import QUERIES
    from deathmetal_datalake_spark.plans.registry import release_caches
    from deathmetal_datalake_spark.session import get_spark

    spark = get_spark(app_name="time-queries", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["tpch_q6_forecast_revenue"](spark, sf_dir).collect()
    import tempfile

    with tempfile.TemporaryDirectory(prefix="dml-tq-warm-") as d:
        spark.range(8).write.mode("overwrite").parquet(os.path.join(d, "w"))
    c2_med, c2_min = bench._canary2(spark)
    out = {"canary2": c2_med, "canary2_min": c2_min, "sf": sf_dir, "queries": {}}
    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            if name in bench._HASH_DRAIN:
                df.agg(F.sum(F.xxhash64(*df.columns))).collect()
            else:
                df.collect()
            ts.append(time.perf_counter() - t0)
            release_caches()
        out["queries"][name] = {
            "median": round(statistics.median(ts), 3),
            "min": round(min(ts), 3),
        }
        print(f"# {name}: median {statistics.median(ts):.3f} min {min(ts):.3f}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
