"""Temporal joins at 200×-the-test-scale: synthesize 20M events and
2M intervals IN Spark (no driver data), then time
`bucketed_range_join` and `asof_join` over them — direct evidence
that the equi-join rewrite and the union+window plan hold far beyond
the sf0.1 driver tables (~20k events).

Two counterfactuals, honestly labeled:
* uniform keys: the key-equi join + range post-filter at FULL scale
  (it examines every same-key pair — fine at 100 events/key, the
  comparison shows the bucket join's candidate-set advantage);
* ONE hot key (the celebrity-entity case): only the bucket join runs
  — the equi+filter plan degenerates to |events|×|intervals| pairs
  within the single key group (~4·10^11 comparisons here), and a
  pure inequality predicate would be BroadcastNestedLoopJoin at any
  key distribution.

Usage: python scripts/bench_temporal_scale.py [n_events] [n_keys]
Defaults: 20,000,000 events over 200,000 keys, 1/10 of events open a
30-minute interval. Prints one JSON line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

HALF_HOUR_US = 1_800_000_000


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000

    from rdf_diff_store_spark.operators.ranges import (
        asof_join,
        bucketed_range_join,
    )
    from rdf_diff_store_spark.session import get_spark

    spark = get_spark("bench-temporal-scale")
    cpus = spark.sparkContext.defaultParallelism

    # deterministic synthetic stream: xxhash-scattered timestamps over
    # ~30 days of microseconds, key = id % n_keys (uniform)
    span_us = 30 * 86_400 * 1_000_000
    ev = (
        spark.range(n_events, numPartitions=cpus * 2)
        .select(
            F.col("id").alias("eid"),
            (F.col("id") % n_keys).alias("k"),
            (F.abs(F.xxhash64(F.col("id"))) % span_us).alias("ts"),
        )
        .localCheckpoint()
    )
    # first 10% of ids, NOT eid % 10 == 0: with k = eid % n_keys a
    # mod-10 filter would land every interval on keys divisible by 10
    # (degenerate: 90% of keys interval-less, every event on the rest
    # its own interval opener); the prefix slice covers all keys
    iv = (
        ev.filter(F.col("eid") < n_events // 10)
        .select(
            F.col("eid").alias("vid"),
            "k",
            F.col("ts").alias("s"),
            (F.col("ts") + HALF_HOUR_US).alias("e"),
        )
        .localCheckpoint()
    )
    quotes = iv.select("k", F.col("s").alias("qts"), F.col("vid").alias("qid"))

    out = {
        "metric": "temporal_join_scale",
        "n_events": n_events,
        "n_intervals": iv.count(),
        "n_keys": n_keys,
        "cpus": cpus,
        "unit": "sec",
    }

    t0 = time.time()
    n_range = bucketed_range_join(
        ev, iv, key="k", ts_col="ts", start_col="s", end_col="e",
        bucket_width=HALF_HOUR_US,
    ).count()
    out["range_join_sec"] = round(time.time() - t0, 2)
    out["range_join_rows"] = n_range
    out["range_join_events_per_sec"] = round(n_events / out["range_join_sec"])

    t0 = time.time()
    # count MATCHED rows: a bare count() would let Catalyst prune the
    # unused window columns and skip the whole as-of computation
    n_asof = (
        asof_join(ev, quotes, key="k", ts_col="ts", quote_ts_col="qts")
        .filter(F.col("qid").isNotNull())
        .count()
    )
    out["asof_join_sec"] = round(time.time() - t0, 2)
    out["asof_matched_rows"] = n_asof
    out["asof_join_events_per_sec"] = round(n_events / out["asof_join_sec"])

    # counterfactual 1: key-equi join + range post-filter, FULL scale
    # (uniform keys — every same-key (event, interval) pair examined)
    t0 = time.time()
    n_naive = (
        ev.alias("e")
        .join(
            iv.alias("i"),
            (F.col("e.k") == F.col("i.k"))
            & (F.col("e.ts") >= F.col("i.s"))
            & (F.col("e.ts") < F.col("i.e")),
        )
        .count()
    )
    out["equi_filter_join_sec"] = round(time.time() - t0, 2)
    out["equi_filter_rows"] = n_naive

    # counterfactual 2: ONE hot key (celebrity entity) — 2M events,
    # 200k intervals, all on the same key. The equi+filter plan would
    # examine 4e11 pairs here; the bucket join stays linear-ish.
    hot_ev = (
        spark.range(2_000_000, numPartitions=cpus * 2)
        .select(
            F.col("id").alias("eid"),
            F.lit(0).alias("k"),
            (F.abs(F.xxhash64(F.col("id") + 7)) % span_us).alias("ts"),
        )
        .localCheckpoint()
    )
    hot_iv = (
        hot_ev.filter(F.col("eid") % 10 == 0)
        .select(
            F.col("eid").alias("vid"),
            "k",
            F.col("ts").alias("s"),
            (F.col("ts") + HALF_HOUR_US).alias("e"),
        )
        .localCheckpoint()
    )
    t0 = time.time()
    n_hot = bucketed_range_join(
        hot_ev, hot_iv, key="k", ts_col="ts", start_col="s", end_col="e",
        bucket_width=HALF_HOUR_US,
    ).count()
    out["hot_key_range_join_sec"] = round(time.time() - t0, 2)
    out["hot_key_rows"] = n_hot

    print(json.dumps(out))


if __name__ == "__main__":
    main()
