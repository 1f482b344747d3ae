"""Scaling-efficiency evidence for the north_rule (N vs 4N executors).

Sandbox stand-in: the same job at local[N] and local[4N] on the same
input (north_rule: "run ... at two cluster sizes (N and 4N executors)
with throughput scaling efficiency >= 0.8"). N defaults to 2 (so
4N = 8) because the host's 32 hardware threads are SMT/throttle-bound:
measured raw-CPU aggregate throughput scales 1→8 processes at ~0.86
efficiency but 8→32 at only ~0.54, so 8 vs 32 measures the silicon,
not the engine. Set SPARK_GRAFT_SCALE_N to override.

Each level runs the warmed KG pipeline REPS times in one JVM and takes
the minimum wall (standard noise filter — the sandbox shows ±30%
run-to-run variance from host contention).

Workload size matters (Amdahl): each build carries a ~14 s
core-count-independent fraction (driver-bound CC rounds, checkpoint
barriers), so efficiency RISES with scale — 0.685 at 891k pages,
0.836 at 1.78M (BENCH.md r03 table). Default n_urls is therefore
400k; smaller runs understate the engine.

Usage: python scripts/bench_scaling.py [sf_dir]
Env: SPARK_GRAFT_SCALE_N (default 2), SPARK_GRAFT_KG_URLS
(default 400000), SPARK_GRAFT_SCALE_REPS (default 4).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = """
import os, time, json
from rdf_diff_store_spark import get_spark
from rdf_diff_store_spark.sources.pages import generate_pages
from rdf_diff_store_spark.pipeline.kg import build_kg

cpus = int(os.environ["SPARK_GRAFT_CPUS"])
n_urls = int(os.environ.get("SPARK_GRAFT_KG_URLS", "400000"))
reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "4"))
spark = get_spark("bench-scaling", cpus=cpus)
pages = (generate_pages(spark, n_urls=n_urls, n_crawls=4,
                        n_entities=max(n_urls // 10, 50), partitions=64)
         .select("url", "warc_ts", "html", "text", "lang").localCheckpoint())
n_pages = pages.count()
# full-scale warmup rep, discarded: a small-scale warmup compiles
# DIFFERENT AQE plan shapes (broadcast/coalesce) so the first timed
# rep still paid JIT+codegen — the r02 local[2] leg never converged
# (walls 229->143->104->118). Same fix as bench.py (r03).
build_kg(spark, pages)
walls = []
for _ in range(reps):
    t0 = time.perf_counter()
    build_kg(spark, pages)
    walls.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"cpus": cpus, "pages": n_pages, "walls": walls,
                  "best_wall": min(walls),
                  "pages_per_sec": round(n_pages / min(walls), 1)}))
"""


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER], env=env, capture_output=True, text=True,
        check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))
    low = run(n)
    high = run(4 * n)
    speedup = low["best_wall"] / high["best_wall"]
    report = {
        "workload": "kg_pipeline (north_star DAG, warmed, min of reps)",
        "kg_pages": low["pages"],
        f"local{n}_wall_sec": low["best_wall"],
        f"local{4*n}_wall_sec": high["best_wall"],
        f"local{n}_pages_per_sec": low["pages_per_sec"],
        f"local{4*n}_pages_per_sec": high["pages_per_sec"],
        f"local{n}_walls": low["walls"],
        f"local{4*n}_walls": high["walls"],
        "speedup_N_to_4N": round(speedup, 3),
        "scaling_efficiency": round(speedup / 4, 3),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
