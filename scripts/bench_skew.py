"""Measured skew-join demonstration (north_star: hub entities handled
with salting + AQE skew-join splitting).

Synthesizes a deterministic hub-skewed fact table (50% of rows hit one
key — the quadratic entity skew taken to the worst case), joins it to
a per-key dimension expansion whose output EXPLODES on the hub key
(each fact row matches `fanout` dim rows), and times three plans:

  plain        AQE skew splitting only (session default)
  salted       operators.skew.salted_join (16 salts)
  plain-noAQE  skew splitting disabled — the unmitigated baseline

Usage: python scripts/bench_skew.py [n_rows] (default 2_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rdf_diff_store_spark.operators.skew import salted_join  # noqa: E402
from rdf_diff_store_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    fanout = 40
    spark = get_spark("bench-skew", extra_conf={
        # keep the dim side un-broadcastable so the join must shuffle
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    })

    # 50% of facts on key 0, rest uniform over 1..127
    fact = spark.range(n, numPartitions=64).select(
        F.when(F.pmod(F.col("id"), 2) == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(127)) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    ).localCheckpoint()
    dim = spark.range(128).select(F.col("id").alias("k")).crossJoin(
        spark.range(fanout).select(F.col("id").alias("rep"))
    ).withColumn("payload", F.sha2(F.concat_ws("|", "k", "rep"), 256)).localCheckpoint()

    def timed(label: str, df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 2)

    agg = lambda j: j.groupBy("k").agg(F.count("*").alias("n"))  # noqa: E731

    # warm
    timed("warm", agg(fact.limit(1000).join(dim, "k")))

    plain = timed("plain", agg(fact.join(dim, "k")))
    salted = timed("salted", agg(salted_join(fact, dim, "k", n_salts=16)))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    no_aqe = timed("plain_noaqe", agg(fact.join(dim, "k")))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    print(json.dumps({
        "n_fact_rows": n,
        "fanout": fanout,
        "hub_share": 0.5,
        "plain_aqe_sec": plain,
        "salted_sec": salted,
        "plain_no_aqe_sec": no_aqe,
    }))


if __name__ == "__main__":
    main()
