"""Per-stage wall profile of the KG pipeline at bench configuration.

StageRecorder already times every stage boundary; this just runs the
bench workload (warmed, min-of-3 like bench.py) and prints each
stage's wall from the FASTEST rep, so optimization work targets the
measured hot stage instead of a guess.

Usage: python scripts/profile_kg.py   (env: SPARK_GRAFT_KG_URLS,
SPARK_GRAFT_CPUS — defaults match bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_diff_store_spark import get_spark
from rdf_diff_store_spark.pipeline.kg import build_kg
from rdf_diff_store_spark.sources.pages import generate_pages


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_urls = int(os.environ.get("SPARK_GRAFT_KG_URLS", "20000"))
    spark = get_spark("profile-kg", cpus=cpus)
    pages = (
        generate_pages(spark, n_urls=n_urls, n_crawls=4,
                       n_entities=max(n_urls // 10, 50), partitions=64)
        .select("url", "warc_ts", "html", "text", "lang")
        .localCheckpoint()
    )
    n_pages = pages.count()
    build_kg(spark, pages)  # full-scale warmup, discarded
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        _, rec = build_kg(spark, pages)
        wall = time.perf_counter() - t0
        if best is None or wall < best[0]:
            best = (wall, rec.metrics)
    wall, metrics = best
    staged = sum(m["wall_sec"] for m in metrics)
    print(json.dumps({
        "kg_pages": n_pages,
        "total_wall_sec": round(wall, 3),
        "staged_wall_sec": round(staged, 3),
        "unattributed_sec": round(wall - staged, 3),
        "stages": [
            {"stage": m["stage"], "wall_sec": m["wall_sec"], "rows": m["rows"]}
            for m in metrics
        ],
    }, indent=2))


if __name__ == "__main__":
    main()
