"""Driver-harness simulation: run the FIRST-50 queries() window (the
slice the external correctness harness value-checks) under a VANILLA
SparkSession — none of session.py's confs, and a deliberately hostile
session timezone — and compare against the DuckDB oracles.

This is the strongest pre-driver gate: the r01 hash-fails
(version_history, sessionize) were exactly session-conf dependencies
that the repo's own pinned-UTC session masked.

Usage: python scripts/driver_sim.py [sf_dir] [n_window]
Exit 0 = every window row matches its oracle under the hostile session.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOSTILE_TZ = "Australia/Lord_Howe"


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_window = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from rdf_diff_store_spark.schemas import TESTDATA_TABLES
    from scripts.check_oracle import compare

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", HOSTILE_TZ)
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, oracles = e.queries(), e.oracle_sql()
    window = list(qs)[:n_window]
    fails = []
    for name in window:
        try:
            if name not in oracles:  # rows-only contract
                if qs[name](spark, sf).count() < 0:
                    fails.append((name, "negative row count"))
                continue
            problems = compare(name, qs[name](spark, sf), con, oracles[name])
            if problems:
                fails.append((name, problems))
        except Exception as ex:  # noqa: BLE001
            fails.append((name, f"{type(ex).__name__}: {ex}"))
    print(f"window checked: {len(window)}  FAILS: {len(fails)}")
    for name, p in fails:
        print(f"FAIL  {name}: {str(p)[:300]}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
