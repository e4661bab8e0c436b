#!/usr/bin/env python
"""Catalog-wide physical-plan census (round-13 optimization):
for every registered query, build the plan at a small SF and record
explain size, Exchange count, join strategies, and Python-eval nodes.
Flags plan-explosion candidates (the events_markov_attribution class)
mechanically instead of per-query spelunking.

Usage: python tools/plan_census.py [sf_dir] [out_json]
"""

from __future__ import annotations

import contextlib
import io
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_census.json"

    from deathmetal_datalake_spark.plans import QUERIES
    from deathmetal_datalake_spark.plans.registry import release_caches
    from deathmetal_datalake_spark.session import get_spark

    spark = get_spark(app_name="plan-census", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for i, name in enumerate(sorted(QUERIES)):
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
            out[name] = {
                "build_secs": round(time.perf_counter() - t0, 2),
                "lines": text.count("\n"),
                "exchanges": text.count("Exchange"),
                "smj": text.count("SortMergeJoin"),
                "bhj": text.count("BroadcastHashJoin"),
                "py": sum(
                    text.count(t)
                    for t in ("EvalPython", "MapInPandas", "MapInArrow")
                ),
                "windows": text.count("Window"),
                "scans": text.count("Scan parquet"),
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": repr(exc)[:200]}
        release_caches()
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{len(QUERIES)}", file=sys.stderr, flush=True)
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {out_path}", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
