"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...}

Each query is forced end-to-end with a noop sink (full materialization,
no driver collect). Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "snapshot_at",
    "diff_versions",
    "diff_triples",
    "compact_versions",
    "sparql_bgp_join",
    "sparql_path_plus",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "window_topk_per_group",
    "doc_exact_dedup",
    "doc_quality_score",
    "ann_cosine_topk",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entrymod
    from rdf_diff_store_spark.session import get_spark
    from rdf_diff_store_spark.sources.relational import changelog_from_events

    spark = get_spark("bench", cpus=cpus)
    qs = entrymod.queries()

    # warmup: JVM/codegen spin-up on a trivial action
    spark.range(1000).count()

    # input scale for the throughput metric: changelog rows replayed
    n_versions = changelog_from_events(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        force(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    versioned = ["snapshot_at", "diff_versions", "diff_triples", "compact_versions"]
    versioned_sec = sum(timings[q] for q in versioned)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "changelog_rows": n_versions,
                "versioned_rows_per_sec": round(n_versions * len(versioned) / versioned_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
