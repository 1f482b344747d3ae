"""Sketch operators at 100×-the-test-scale: synthesize a
multi-ten-million-token stream IN Spark (no driver data), then time
HLL registers, grid histogram, KMV, and count-min over it — direct
evidence that the constant-state map-side-combine plan shapes hold
far beyond the sf0.1 driver tables, and that the shuffled state
really is sketch-sized (rows out ≈ registers/bins, never input).

Usage: python scripts/bench_sketch_scale.py [n_tokens] [n_groups]
Defaults: 64,000,000 tokens over 8 groups (langs),
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
    n_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
    n_groups = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from rdf_diff_store_spark.operators.sketch import (
        countmin_counters,
        grid_histogram,
        hll_distinct,
        kmv_distinct,
    )
    from rdf_diff_store_spark.session import get_spark

    spark = get_spark("bench-sketch-scale")
    cpus = spark.sparkContext.defaultParallelism

    # deterministic synthetic token stream: ~n/20 distinct tokens per
    # group, Zipf-ish by construction (id mod a quadratic), built
    # executor-side from range()
    toks = (
        spark.range(n_tokens)
        .select(
            F.concat(F.lit("g"), (F.col("id") % n_groups)).alias("lang"),
            F.concat(
                F.lit("tok"),
                ((F.col("id") * F.col("id") + F.col("id")) % (n_tokens // 20)).alias(
                    "_"
                ),
            ).alias("tok"),
        )
        .localCheckpoint()  # materialize so timings exclude generation
    )
    n_actual = toks.count()

    out: dict[str, object] = {
        "metric": "sketch_scale",
        "rows": n_actual,
        "groups": n_groups,
        "cpus": cpus,
        "unit": "sec",
    }

    # warmup at full scale (JIT + codegen; same discipline as bench.py)
    hll_distinct(toks, ["lang"], "tok", b=8).collect()

    t0 = time.perf_counter()
    hll_rows = hll_distinct(toks, ["lang"], "tok", b=8).collect()
    out["hll_sec"] = round(time.perf_counter() - t0, 2)
    out["hll_state_rows"] = sum(r.n_regs for r in hll_rows)
    out["hll_est_per_group"] = hll_rows[0].est_distinct

    d = toks.select("lang", F.length("tok").alias("v"))
    t0 = time.perf_counter()
    hist_rows = grid_histogram(d, ["lang"], "v", 0, 64, 64).collect()
    out["hist_sec"] = round(time.perf_counter() - t0, 2)
    out["hist_state_rows"] = len(hist_rows)

    t0 = time.perf_counter()
    kmv_rows = kmv_distinct(toks, ["lang"], "tok", k=64).collect()
    out["kmv_sec"] = round(time.perf_counter() - t0, 2)
    out["kmv_est_per_group"] = kmv_rows[0].est_distinct

    t0 = time.perf_counter()
    cm = countmin_counters(toks, "tok", depth=3, width=256).collect()
    out["countmin_sec"] = round(time.perf_counter() - t0, 2)
    out["countmin_state_rows"] = len(cm)

    out["tokens_per_sec_hll"] = round(n_actual / out["hll_sec"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
