"""Versioned-store operators at 100×-the-test-scale: synthesize a
multi-ten-million-row changelog IN Spark (no driver data), then time
snapshot_at / diff / compact over it — the direct evidence that the
latest-wins max_by + derived-partition-pruning plan shapes hold far
beyond the sf0.1 driver tables (100k rows).

Usage: python scripts/bench_versioned_scale.py [n_rows] [n_graphs]
Defaults: 20,000,000 rows over 2,000,000 graphs (10 versions/graph),
local[$SPARK_GRAFT_CPUS]. Prints one JSON line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_graphs = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

    from rdf_diff_store_spark.operators.versioned import (
        compact_changelog,
        diff,
        metadata,
        snapshot_at,
    )
    from rdf_diff_store_spark.session import get_spark

    spark = get_spark("bench-versioned-scale")
    cpus = spark.sparkContext.defaultParallelism

    # deterministic synthetic changelog: graph g gets versions at
    # ts = 2024-01-01 + (version * 7200s); every 5th version changes
    # content, every 13th is a tombstone
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    log = (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("g"), (F.col("id") % n_graphs).cast("string")).alias("graph_id"),
            (base + F.make_interval(secs=(F.col("id") / n_graphs).cast("int") * 7200)).alias("ts"),
            F.when((F.col("id") % 13) == 0, F.lit("delete")).otherwise(F.lit("add")).alias("op"),
            F.col("id").alias("_id"),
        )
        .withColumn(
            "payload",
            F.when(
                F.col("op") == "delete", F.lit(None).cast("string")
            ).otherwise(
                F.concat(
                    F.lit("<http://e/s> <http://e/p> \""),
                    ((F.col("_id") / n_graphs / 5).cast("long")).cast("string"),
                    F.lit("\" ."),
                )
            ),
        )
        .withColumn(
            "content_hash",
            F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(
                F.sha2(F.col("payload"), 256)
            ),
        )
        .drop("_id")
    )

    t0 = time.perf_counter()
    log = log.localCheckpoint()
    n = log.count()
    gen_sec = round(time.perf_counter() - t0, 2)

    timings: dict[str, float] = {}

    def timed(name, fn):
        # min of 3: the first rep at this scale pays JIT/GC warmup
        # (measured 77 s → 21 s → 12 s → 10 s convergence on snapshot)
        best = None
        for _ in range(3):
            t = time.perf_counter()
            fn()
            r = time.perf_counter() - t
            best = r if best is None else min(best, r)
        timings[name] = round(best, 2)

    mid = "2024-01-01 18:00:00"
    late = "2024-01-02 12:00:00"
    timed("snapshot_at", lambda: snapshot_at(log, mid).write.format("noop").mode("overwrite").save())
    timed("diff_graph_level", lambda: diff(log, mid, late, on_triples=False).write.format("noop").mode("overwrite").save())
    timed("compact", lambda: compact_changelog(log).write.format("noop").mode("overwrite").save())
    timed("metadata", lambda: metadata(log).collect())

    print(
        json.dumps(
            {
                "metric": "versioned_scale",
                "rows": n,
                "graphs": n_graphs,
                "cpus": cpus,
                "generate_sec": gen_sec,
                "timings_sec": timings,
                "snapshot_rows_per_sec": round(n / timings["snapshot_at"], 0),
            }
        )
    )


if __name__ == "__main__":
    main()
