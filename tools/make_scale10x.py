#!/usr/bin/env python
"""Build the 10x scale scratch dataset (docs/SCALING.md protocol),
persisted as a tool so every round can regenerate it identically.

Each table is the sf0.1 original unioned 10 times with per-replica key
shifts chosen FK-consistently: orders.o_custkey shifts with
customer.c_custkey, lineitem.l_orderkey with orders.o_orderkey, and so
on — joins stay intact, selectivities stay realistic, and each replica
is a disjoint key population. Dimension tables (region, nation) stay
1x, exactly like a real 10x business would look. `documents` get a
per-copy token suffix so replicas are NEAR-duplicates (shingle overlap
high but not identical) — the honest input for dedup-family scaling.
`embeddings` perturb one component per replica for the same reason.

Usage: python tools/make_scale10x.py [/tmp/scale10x]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deathmetal_datalake_spark.session import get_spark
from deathmetal_datalake_spark.sources.tables import load_table

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
# Strides far above any sf0.1 key range so replica populations are
# provably disjoint.
K = 100_000_000

# table -> {column: stride} applied as col + i * stride for replica i.
SHIFTS = {
    "customer": {"c_custkey": K},
    "orders": {"o_orderkey": K, "o_custkey": K},
    "lineitem": {"l_orderkey": K, "l_partkey": K, "l_suppkey": K},
    "part": {"p_partkey": K},
    "supplier": {"s_suppkey": K},
    "events": {"event_id": K, "user_id": K},
    "documents": {"doc_id": K},
    "embeddings": {"vec_id": K},
}
COPY_AS_IS = ["region", "nation"]


def build(spark, out: str) -> None:
    """Build the 10x scratch into ``out`` with the caller's session and
    drop a ``_scale10x.done`` marker so repeat callers (bench.py runs
    per driver round) can reuse the scratch instead of rebuilding."""
    os.makedirs(out, exist_ok=True)
    for t in COPY_AS_IS:
        shutil.copyfile(
            os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet")
        )
        print(f"{t}: copied 1x", file=sys.stderr)
    for t, shifts in SHIFTS.items():
        base = load_table(spark, SRC, t)
        parts = []
        for i in range(REPLICAS):
            df = base
            for col, stride in shifts.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * stride))
            if t == "documents":
                # Replicas are NEAR-duplicates: high shingle overlap,
                # not byte-identical (the honest dedup-scaling input).
                df = df.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replicatok{i}"))
                )
            if t == "embeddings":
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, j: F.when(j == 0, x + F.lit(i) * 0.001).otherwise(x),
                    ),
                )
            parts.append(df)
        union = parts[0]
        for p in parts[1:]:
            union = union.unionByName(p)
        # One FILE per table, like the driver's testdata layout (the
        # DuckDB oracle harness addresses `<dir>/<table>.parquet` as a
        # single file). Spark parallelizes the read by ROW GROUP, so
        # the row-group size is the scan-parallelism knob: the old
        # default (128 MB blocks) left the 136 MB 10x lineitem as ONE
        # row group — every scan decoded 6M rows in a single task and
        # the whole suite's 10x numbers measured one core's decode
        # throughput, not plan scaling (round-13 optimization finding;
        # guide §6 "file layout determines how well readers can skip
        # data" cuts both ways — it also determines how well they can
        # PARALLELIZE). 4 MB groups give the largest table ~32+ groups
        # (cluster width at local[32]) while small tables still land in
        # one group; content is byte-for-byte the same rows, so every
        # 10x oracle hash is unchanged.
        tmp = os.path.join(out, f"_{t}_build")
        shutil.rmtree(tmp, ignore_errors=True)
        (
            union.coalesce(1)
            .write.option("parquet.block.size", 4 * 1024 * 1024)
            .mode("overwrite")
            .parquet(tmp)
        )
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dest = os.path.join(out, f"{t}.parquet")
        if os.path.isdir(dest):
            shutil.rmtree(dest)
        elif os.path.exists(dest):
            os.remove(dest)
        os.replace(os.path.join(tmp, part), dest)
        shutil.rmtree(tmp)
        print(f"{t}: wrote {REPLICAS}x", file=sys.stderr)
    with open(os.path.join(out, "_scale10x.done"), "w") as f:
        f.write(_MARKER + "\n")


# Layout version is part of the marker so a scratch built with the old
# single-row-group layout is rebuilt, not silently reused (the cached
# scratch persists across driver rounds).
_MARKER = f"replicas={REPLICAS} src={SRC} rowgroup=4m"


def is_built(out: str) -> bool:
    path = os.path.join(out, "_scale10x.done")
    try:
        with open(path) as f:
            return f.read().strip() == _MARKER
    except OSError:
        return False


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x"
    spark = get_spark(app_name="make-scale10x", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, out)
    spark.stop()


if __name__ == "__main__":
    main()
