"""Planner-statistics / KG-summary family at 100×-the-test-scale:
synthesize a multi-ten-million-triple KG IN Spark (no driver data),
then time characteristic sets, the class-quotient summary graph,
entity-card top-k, dictionary encoding, and star-count-from-stats
over it — direct evidence that the family's plan shapes (subject-hash
set fold, vocabulary-sized broadcasts, WindowGroupLimit top-k,
join-free hash encoding) hold far beyond the sf0.1 driver tables, and
that the statistics outputs really are statistics-SIZED (distinct
characteristic sets ≈ 10³, summary edges ≈ |classes|²·|preds|, never
input-sized).

Usage: python scripts/bench_stats_scale.py [n_subjects]
Default: 4,000,000 subjects → ~26M triples, local[$SPARK_GRAFT_CPUS].
Prints one JSON line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def main() -> None:
    n_subjects = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000

    from rdf_diff_store_spark.operators.layout import dict_encode
    from rdf_diff_store_spark.operators.void_stats import (
        characteristic_sets,
        entity_facts_topk,
        star_subject_count,
        summary_graph,
    )
    from rdf_diff_store_spark.session import get_spark

    spark = get_spark("bench-stats-scale")
    cpus = spark.sparkContext.defaultParallelism

    # deterministic synthetic KG built executor-side from range():
    # every subject has a type (8 classes) and 2 names; subsets carry
    # knows (50%), url (20%), seeAlso (10%) — 2^3 characteristic-set
    # classes × varied multiplicities, ~6.5 triples per subject
    ids = spark.range(n_subjects).select(F.col("id"))
    s = F.concat(F.lit("e"), F.col("id"))

    def tri(pred, obj):
        return ids.select(
            s.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj")
        )

    types = tri(RDF_TYPE, F.concat(F.lit("C"), F.col("id") % 8))
    name1 = tri("p:name", F.concat(F.lit("n"), F.col("id") % 1000))
    name2 = tri("p:name", F.concat(F.lit("m"), F.col("id") % 997))
    knows = ids.filter(F.col("id") % 2 == 0).select(
        s.alias("subj"),
        F.lit("p:knows").alias("pred"),
        F.concat(F.lit("e"), (F.col("id") + 1) % n_subjects).alias("obj"),
    )
    # a second knows edge makes hub-ish in-degree on even targets
    knows2 = ids.filter(F.col("id") % 4 == 0).select(
        s.alias("subj"),
        F.lit("p:knows").alias("pred"),
        F.concat(F.lit("e"), (F.col("id") + 2) % n_subjects).alias("obj"),
    )
    url = ids.filter(F.col("id") % 5 == 0).select(
        s.alias("subj"),
        F.lit("p:url").alias("pred"),
        F.concat(F.lit("https://h/"), F.col("id")).alias("obj"),
    )
    see = ids.filter(F.col("id") % 10 == 0).select(
        s.alias("subj"),
        F.lit("p:seeAlso").alias("pred"),
        F.concat(F.lit("e"), (F.col("id") * 7) % n_subjects).alias("obj"),
    )
    triples = (
        types.unionByName(name1)
        .unionByName(name2)
        .unionByName(knows)
        .unionByName(knows2)
        .unionByName(url)
        .unionByName(see)
        .localCheckpoint()  # materialize so timings exclude generation
    )
    n_triples = triples.count()

    out: dict[str, object] = {
        "metric": "stats_scale",
        "triples": n_triples,
        "subjects": n_subjects,
        "cpus": cpus,
        "unit": "sec",
    }

    # warmup at full scale (JIT + codegen; bench.py discipline)
    characteristic_sets(triples).collect()

    t0 = time.perf_counter()
    cs_rows = characteristic_sets(triples).collect()
    out["char_sets_sec"] = round(time.perf_counter() - t0, 2)
    out["char_sets_rows"] = len(cs_rows)  # must be ~2^3, never ~n

    cs_df = spark.createDataFrame(cs_rows)
    t0 = time.perf_counter()
    star = star_subject_count(cs_df, ["p:knows", "p:url"]).first()["n_subjects"]
    out["star_from_stats_sec"] = round(time.perf_counter() - t0, 2)
    out["star_subjects"] = star  # answered WITHOUT rescanning triples

    t0 = time.perf_counter()
    sg_rows = summary_graph(triples).collect()
    out["summary_graph_sec"] = round(time.perf_counter() - t0, 2)
    out["summary_graph_rows"] = len(sg_rows)  # |classes|² per edge pred

    t0 = time.perf_counter()
    n_cards = entity_facts_topk(triples, k=3).count()
    out["entity_topk_sec"] = round(time.perf_counter() - t0, 2)
    out["entity_topk_rows"] = n_cards

    t0 = time.perf_counter()
    _, enc = dict_encode(triples)
    # a bare count() would let Catalyst prune the md5 projections away
    # and measure nothing — force all three id columns to compute
    m = 1_000_000_007
    sums = enc.agg(
        F.sum(F.col("s_id") % m), F.sum(F.col("p_id") % m), F.sum(F.col("o_id") % m)
    ).first()
    out["dict_encode_sec"] = round(time.perf_counter() - t0, 2)
    out["dict_encode_idsum"] = int(sums[0] % m)

    out["triples_per_sec_char_sets"] = round(n_triples / out["char_sets_sec"], 1)
    out["triples_per_sec_dict_encode"] = round(n_triples / out["dict_encode_sec"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
