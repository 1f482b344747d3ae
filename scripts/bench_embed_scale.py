"""TransE training at 100×-the-test-scale: synthesize a multi-million-
triple KG IN Spark (no driver data), run full training rounds, and
report throughput — evidence that the exploded (id, d) parameter
sharding holds at volume: the per-round work is equi-joins + partial-
aggregated sums whose shuffle keys are (entity, dim), so hub entities
combine map-side and AQE splits skew.

Usage: python scripts/bench_embed_scale.py [n_triples] [dim]
Defaults: 2,000,000 triples over n/10 entities × 16 relations, dim 8.
Prints one JSON line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_triples = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_ents = max(n_triples // 10, 100)

    from rdf_diff_store_spark.operators.embed import transe_train
    from rdf_diff_store_spark.session import get_spark

    spark = get_spark("bench-embed-scale")
    cpus = spark.sparkContext.defaultParallelism

    t0 = time.perf_counter()
    d = F.col("id")
    tri = (
        spark.range(n_triples)
        .select(
            F.concat(F.lit("e"), (d % n_ents).cast("string")).alias("h"),
            F.concat(F.lit("r"), (d % 16).cast("string")).alias("r"),
            F.concat(F.lit("e"), ((d * 7 + 13) % n_ents).cast("string")).alias("t"),
        )
        .localCheckpoint()
    )
    n = tri.count()
    gen_sec = round(time.perf_counter() - t0, 2)

    # one discarded full-scale warmup round (JIT/codegen), then timed
    transe_train(tri, dim=dim, iterations=1)
    t1 = time.perf_counter()
    ent, rel = transe_train(tri, dim=dim, iterations=1)
    n_params = ent.count() + rel.count()
    round_sec = round(time.perf_counter() - t1, 2)

    print(
        json.dumps(
            {
                "metric": "embed_scale",
                "triples": n,
                "entities": n_ents,
                "dim": dim,
                "cpus": cpus,
                "generate_sec": gen_sec,
                "round_sec": round_sec,
                "param_rows": n_params,
                "triples_per_sec": round(n / round_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
