#!/usr/bin/env python
"""Full-catalog oracle sweep: run every registered query AND its DuckDB
oracle on the same parquet tables and compare exactly — the local
replica of the driver's correctness gate, as a repo tool.

Usage:
    python tools/sweep_oracles.py [sf_dir] [name_substring ...]

Defaults to /root/testdata/sf0.01 (the driver's scale). Positional
substrings filter the query set (OR-matched). Exit code 0 iff every
selected query matches. A vanilla SparkSession is used deliberately —
vanilla-session compatibility is part of the driver contract.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    filters = [a for a in args if "/" not in a]

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.master("local[16]")
    # Driver-gate parity wants a vanilla session (no engine defaults),
    # but 10x-receipt runs of the heavy dedup pair queries need more
    # than the 1g default driver heap (26M+ candidate pairs at
    # /tmp/dml-scale10x OOM it — measured round 7, old and new
    # signature forms alike). Opt-in only, so the default sf0.01 run
    # stays bit-for-bit the driver's environment.
    mem = os.environ.get("SWEEP_DRIVER_MEMORY")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    # Opt-in sweep-cost trim (round-13, VERDICT #5): the vanilla
    # session's 200 shuffle partitions dominate per-query fixed cost
    # for the two-phase statistics family at sf0.01. This flag resizes
    # the TOOL's session only — the driver's own gate still runs a
    # vanilla session, and the default invocation here stays
    # bit-for-bit that environment.
    if os.environ.get("SPARK_GRAFT_SWEEP_FAST"):
        builder = builder.config("spark.sql.shuffle.partitions", "32")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from deathmetal_datalake_spark.plans import ORACLES, QUERIES
    from tests.oracle_harness import compare_query

    names = sorted(
        n for n in QUERIES if not filters or any(f in n for f in filters)
    )
    t0 = time.time()
    failed: list[tuple[str, dict]] = []
    per_query: dict[str, dict] = {}
    for i, name in enumerate(names):
        q0 = time.time()
        r = compare_query(spark, name, QUERIES[name], ORACLES.get(name), sf_dir)
        ok = r["match"] is True
        per_query[name] = {"match": ok, "secs": round(time.time() - q0, 2)}
        if not ok:
            failed.append((name, r))
        print(f"{i + 1}/{len(names)} {name} {'OK' if ok else 'FAIL'}", flush=True)
    record = {
        "sf_dir": sf_dir,
        "total": len(names),
        "matched": len(names) - len(failed),
        "failed": [n for n, _ in failed],
        "secs": round(time.time() - t0, 1),
        "queries": per_query,
    }
    print(json.dumps({k: v for k, v in record.items() if k != "queries"}))
    out = os.environ.get("SPARK_GRAFT_SWEEP_OUT")
    if out:
        # Full per-query record (match + secs) for the committed
        # round artifact (docs/SWEEP_r{N}.json).
        with open(out, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
        print(f"# record -> {out}", flush=True)
    for name, r in failed:
        print(name, str(r)[:500])
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
