"""Scaling-efficiency evidence for the north_rule (N vs 4N executors,
sandbox stand-in: local[8] vs local[32] on the same input).

Runs bench.py in two subprocesses (fresh JVM each — parallelism is a
JVM-start setting) and reports throughput at both plus efficiency
= (T_8 / T_32) / 4 on the shuffle/compute-bound headline set.

Usage: python scripts/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    low = run(8, sf_dir)
    high = run(32, sf_dir)
    eff = (low["value"] / high["value"]) / 4
    report = {
        "sf": low["sf"],
        "local8_total_sec": low["value"],
        "local32_total_sec": high["value"],
        "speedup_8_to_32": round(low["value"] / high["value"], 3),
        "scaling_efficiency": round(eff, 3),
        "local8_queries": low["queries"],
        "local32_queries": high["queries"],
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
