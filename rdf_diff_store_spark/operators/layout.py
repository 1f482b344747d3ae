"""Storage-layout transforms for triple frames.

Reference context: the reference stores each graph as ONE Turtle
document (src/rdf.rs:87-92) and leaves any query-friendly layout to
oxigraph's internal indexes. At warehouse scale the standard move is
the PROPERTY TABLE (Wilkinson, "Jena Property Table Implementation",
SSWS 2006): one row per subject, one column per predicate, so
star-shaped SPARQL patterns (the dominant shape — all attributes of an
entity) become a single scan with zero self-joins, and Parquet's
columnar layout gives per-predicate column pruning — the same win
vertical partitioning (Abadi et al., VLDB 2007) gets from per-predicate
tables, without the n-way join to reassemble an entity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def property_table(
    triples: DataFrame,
    predicates: list[str] | None = None,
    subj_col: str = "s",
    pred_col: str = "p",
    obj_col: str = "o",
) -> DataFrame:
    """Pivot an (s, p, o) frame into one row per subject with one
    column per predicate. Multi-valued predicates collapse to a
    DETERMINISTIC sorted comma-joined string (the inverted-index
    postings convention — engine-portable, order-proof); absent
    predicates are NULL.

    `predicates` is the column vocabulary. Pass it explicitly when
    known (schema-sized knowledge) — that skips Spark's pivot-value
    discovery job entirely; with None, one distinct-scan discovers it
    (still vocabulary-sized output, but an extra pass over the data).

    Scale shape: exactly ONE hash exchange on subject, with map-side
    partial aggregation (pivot-with-explicit-values compiles to a
    regular two-phase HashAggregate whose buffer is one cell per
    predicate). Hub subjects with millions of values for one predicate
    concentrate into a single cell string — cap upstream with
    `operators.skew.capped_topk_per_group` if the corpus has such
    keys; there is no join anywhere, so no fanout skew."""
    if predicates is None:
        predicates = [
            r[0]
            for r in triples.select(pred_col).distinct().orderBy(pred_col).collect()
        ]
    # collect_list over an absent (subject, predicate) cell yields an
    # empty array, not NULL — nullif restores the NULL-means-absent
    # contract (an entity with a genuinely empty-string object is
    # indistinguishable; RDF literals are rarely "" and the layout is
    # lossy-by-design for that corner)
    wide = (
        triples.groupBy(F.col(subj_col).alias("s"))
        .pivot(pred_col, predicates)
        .agg(F.array_join(F.array_sort(F.collect_list(obj_col)), ","))
    )
    # nullif must sit OUTSIDE the pivot agg (Spark's pivot rewrite
    # rejects the expression inside) — one extra projection, no shuffle
    return wide.select(
        "s", *[F.nullif(F.col(f"`{p}`"), F.lit("")).alias(p) for p in predicates]
    )


def vertical_partitions(
    triples: DataFrame,
    subj_col: str = "s",
    pred_col: str = "p",
    obj_col: str = "o",
) -> dict[str, DataFrame]:
    """The Abadi-style complement: one (s, o) frame per predicate,
    for workloads that touch few predicates over many subjects.
    Returns {predicate: DataFrame}; the predicate list is discovered
    with one vocabulary-sized distinct. Each partition is a pushed-down
    filter over the same scan — writing them with
    ``df.write.partitionBy(pred_col)`` gets the same effect as real
    per-predicate tables (partition pruning) without materializing
    len(vocabulary) separate writes."""
    preds = [
        r[0] for r in triples.select(pred_col).distinct().orderBy(pred_col).collect()
    ]
    return {
        p: triples.filter(F.col(pred_col) == p).select(subj_col, obj_col)
        for p in preds
    }
