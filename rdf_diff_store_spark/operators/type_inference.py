"""Type inference for untyped entities — SDType (Paulheim & Bizer,
"Type Inference on Noisy RDF Data", ISWC 2013) in exact integer
arithmetic: on the open web most extracted entities carry properties
but no rdf:type (the microdata/RDFa long tail), and the classic fix is
a weighted vote — each predicate an entity USES votes for the classes
that predicate statistically indicates among the typed population.

Integer model (engine-portable like pagerank/hits/TransE):

    w_micro(p, c) = (1,000,000 · |typed entities of c using p|)
                    div |typed entities using p|          (confidence)
    score(e, c)   = Σ_{p ∈ preds(e)} w_micro(p, c)

both operands non-negative, so Spark's truncating ``div`` and DuckDB's
flooring ``//`` agree. The winner per entity is the max-score class,
ties to the lexicographically smallest class IRI.

Scale shape: the weight table is (predicate × class) — vocabulary-
sized, broadcast to the scoring join; the entity side shuffles once
for its per-(entity, class) sum and once for the top-1 window
partitioned by entity. Distinct-entity counts partial-aggregate
map-side; hub predicates (schema:name on everything) are one weight
ROW, not a hot join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.structured import RDF_TYPE

MICRO = 1_000_000


def predicate_class_weights(
    triples: DataFrame, min_support: int = 1
) -> DataFrame:
    """(pred, cls, w_micro, n_support) — the confidence table learned
    from the TYPED population. ``min_support`` drops (pred, class)
    pairs seen on fewer than that many entities (noise floor)."""
    typed = (
        triples.filter(F.col("pred") == RDF_TYPE)
        .select("subj", F.col("obj").alias("cls"))
        .distinct()
    )
    preds = (
        triples.filter(F.col("pred") != RDF_TYPE)
        .select("subj", "pred")
        .distinct()
    )
    n_p = preds.groupBy("pred").agg(F.countDistinct("subj").alias("n_p"))
    n_pc = (
        preds.join(typed, "subj")
        .groupBy("pred", "cls")
        .agg(F.countDistinct("subj").alias("n_support"))
        .filter(F.col("n_support") >= min_support)
    )
    return n_pc.join(n_p, "pred").select(
        "pred",
        "cls",
        F.expr(f"({MICRO} * n_support) div n_p").cast("long").alias("w_micro"),
        "n_support",
    )


def infer_types(triples: DataFrame, min_support: int = 1) -> DataFrame:
    """(subj, inferred_type, score_micro, n_evidence) for every
    UNTYPED entity that uses at least one weighted predicate — the
    SDType vote with a deterministic per-entity argmax."""
    weights = F.broadcast(predicate_class_weights(triples, min_support))
    typed_subjects = (
        triples.filter(F.col("pred") == RDF_TYPE).select("subj").distinct()
    )
    untyped = (
        triples.filter(F.col("pred") != RDF_TYPE)
        .select("subj", "pred")
        .distinct()
        .join(typed_subjects, "subj", "left_anti")
    )
    scores = (
        untyped.join(weights, "pred")
        .groupBy("subj", "cls")
        .agg(
            F.sum("w_micro").alias("score_micro"),
            F.count(F.lit(1)).alias("n_evidence"),
        )
    )
    w = Window.partitionBy("subj").orderBy(
        F.col("score_micro").desc(), F.col("cls").asc()
    )
    return (
        scores.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "subj",
            F.col("cls").alias("inferred_type"),
            "score_micro",
            "n_evidence",
        )
    )
