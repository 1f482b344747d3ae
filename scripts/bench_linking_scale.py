"""Entity-linking scale bench: broadcast nested-loop vs FastSS
deletion-neighborhood blocking at dictionary sizes where the NLJ's
O(|mentions| x |dict|) levenshtein cost dominates — the measured basis
for SCALE.md's "block when the dictionary stops broadcasting" rule.

Synthesizes (in Spark, no driver data) a corpus of distinct
entity-shaped mentions and an alias dictionary with a controlled
near-miss rate, then times:

  * `entity_link_scores`  — broadcast nested-loop band join
    (|M| x |D| levenshtein evaluations)
  * `entity_link_blocked` — deletion-variant equi-join pair minting
    (work proportional to variant collisions, strings-only shuffle)

Both paths produce bit-identical output (asserted on a sample run at
the end; the full equality is pinned by tests/test_linking.py and the
shared DuckDB oracle).

Usage: python scripts/bench_linking_scale.py [n_mentions] [n_aliases]
Default: 200,000 mentions x 20,000 aliases (4x10^9 NLJ lev calls).
Prints one JSON line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def synth(spark, n_mentions: int, n_aliases: int):
    """Deterministic corpus: aliases are md5-derived 10-letter tokens;
    mentions are the aliases (exact hits), 1-char corruptions (band
    hits), and unrelated tokens (misses) in a 2:1:7 mix."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    to_word = (
        lambda col: F.concat(
            *[
                F.substring(
                    F.lit(letters),
                    (F.conv(F.substring(F.md5(col), i * 2 + 1, 2), 16, 10).cast("long") % 26 + 1).cast("int"),
                    1,
                )
                for i in range(10)
            ]
        )
    )
    aliases = (
        spark.range(n_aliases)
        .select(to_word(F.concat(F.lit("alias"), F.col("id"))).alias("alias"))
        .distinct()
        .withColumn("alias_freq", F.lit(2).cast("long"))
    )
    mx = aliases.agg(F.max("alias_freq").alias("max_freq"))
    cands = aliases.crossJoin(F.broadcast(mx)).localCheckpoint()

    m = spark.range(n_mentions).withColumn("bucket", F.col("id") % 10)
    exact = m.filter("bucket < 2").select(
        (F.col("id") % n_aliases).alias("k")
    ).select(to_word(F.concat(F.lit("alias"), F.col("k"))).alias("mention"))
    near = m.filter("bucket = 2").select(
        (F.col("id") % n_aliases).alias("k")
    ).select(
        # corrupt position 0: the case prefix blocking would miss
        F.concat(F.lit("z"), F.substring(to_word(F.concat(F.lit("alias"), F.col("k"))), 2, 9)).alias("mention")
    )
    miss = m.filter("bucket > 2").select(
        to_word(F.concat(F.lit("other"), F.col("id"))).alias("mention")
    )
    docs = (
        exact.union(near).union(miss)
        .withColumn("doc_id", F.monotonically_increasing_id())
        .select("doc_id", F.col("mention").alias("text"))
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")) * 2)
        .localCheckpoint()
    )
    return docs, cands


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_mentions = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_aliases = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000

    from rdf_diff_store_spark.pipeline.linking import (
        entity_link_blocked,
        entity_link_scores,
    )
    from rdf_diff_store_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-linking", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs, cands = synth(spark, n_mentions, n_aliases)
    n_docs, n_cands = docs.count(), cands.count()

    out = {"n_mentions": n_docs, "n_aliases": n_cands, "cpus": cpus}
    for name, fn in (
        ("blocked", entity_link_blocked),
        ("broadcast_nlj", entity_link_scores),
    ):
        force(fn(docs, cands, text_col="text", max_lev=2))  # full-scale warmup, discarded
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            force(fn(docs, cands, text_col="text", max_lev=2))
            rep = time.perf_counter() - t0
            best = rep if best is None else min(best, rep)
        out[f"{name}_sec"] = round(best, 2)
        out[f"{name}_mentions_per_sec"] = round(n_docs / best, 1)

    # sample equality spot-check (full equality is oracle+pytest-pinned);
    # ONE deterministic sample frame feeds both paths (limit() picks
    # arbitrary rows per job — a modulus filter does not)
    sample = docs.filter(F.col("doc_id") % 97 == 0).localCheckpoint()
    a = entity_link_scores(sample, cands, text_col="text")
    b = entity_link_blocked(sample, cands, text_col="text")
    out["sample_equal"] = sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    out["speedup"] = round(out["broadcast_nlj_sec"] / out["blocked_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
