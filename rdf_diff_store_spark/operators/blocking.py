"""Meta-blocking for web-scale entity resolution (Papadakis et al.,
"Meta-Blocking: Taking Entity Resolution to the Next Level", TKDE
2014): given redundancy-positive blocking keys (two profiles are
likelier to match the more blocks they share), build the block graph,
weight candidate edges by co-occurrence, and prune to the pairs worth
running an expensive matcher on.

Reference context: the reference links entities only through exact
graph ids (src/rdf.rs term equality); the north rule's
entity-canonicalization stage needs candidate GENERATION before
`pipeline/linking.py`'s levenshtein scorer and `operators/dedup.py`'s
MinHash — meta-blocking is the standard web-scale front-end for both
(WDC-scale dirty ER), complementing the FastSS deletion-neighborhood
blocking in `operators/tables.py::align_headers` (which needs a
curated vocabulary; meta-blocking is schema-agnostic).

Scale design: the only corpus-quadratic danger is the within-block
self-join, bounded two ways like every inverted-index operator here
(`mirror_hosts`, `doc_shared_spans`, `wedge_overlap`):

* **block purging** (`max_block_size`): a stopword-like key shared by
  10^6 profiles would mint 10^12 pairs that carry ~zero evidence each
  — drop oversize blocks before pairing (Papadakis' Block Purging);
  singleton blocks (< 2 members) mint nothing and are dropped too.
* the pair shuffle carries **ids + one BIGINT only**; per-node
  statistics for pruning attach AFTER the pair aggregation, on the
  already-collapsed edge set.

Edge weighting is CBS (common-blocks scheme — the count of shared
kept blocks), pruning is WNP (weighted node pruning): each node keeps
edges at or above its own mean edge weight, an edge survives if
EITHER endpoint keeps it. All thresholds are exact integer
micro-units (sum·1_000_000 div count — non-negative `div`, the one
integer-division regime Spark and DuckDB share bit-for-bit), so the
DuckDB oracle reproduces the pruned graph exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def meta_blocking(
    keys: DataFrame,
    max_block_size: int = 200,
    min_block_size: int = 2,
) -> DataFrame:
    """Candidate pairs from redundancy-positive blocking keys.

    `keys`: (id, block_key) — one row per profile-key assignment
    (attribute-value strings, token keys, q-grams — any
    redundancy-positive scheme). Returns (id_a, id_b, cbs) with
    id_a < id_b: the WNP-pruned block-graph edges, cbs = number of
    kept blocks the pair co-occurs in.
    """
    k = keys.select("id", "block_key").distinct()
    bsize = k.groupBy("block_key").agg(F.count("*").alias("bs"))
    kept = k.join(
        bsize.filter(
            (F.col("bs") >= min_block_size) & (F.col("bs") <= max_block_size)
        ),
        "block_key",
    ).select("id", "block_key")
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(b, F.col("a.block_key") == F.col("b.block_key"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("cbs"))
    )
    # WNP node statistic: mean incident edge weight, integer micro-units.
    node_stat = (
        pairs.select(F.col("id_a").alias("id"), "cbs")
        .unionByName(pairs.select(F.col("id_b").alias("id"), "cbs"))
        .groupBy("id")
        .agg(
            F.expr("(sum(cbs) * 1000000) div count(*)")
            .cast("bigint")
            .alias("thr_micro")
        )
    )
    return (
        pairs.join(
            node_stat.select(F.col("id").alias("id_a"), F.col("thr_micro").alias("ta")),
            "id_a",
        )
        .join(
            node_stat.select(F.col("id").alias("id_b"), F.col("thr_micro").alias("tb")),
            "id_b",
        )
        .filter(
            (F.col("cbs") * 1_000_000 >= F.col("ta"))
            | (F.col("cbs") * 1_000_000 >= F.col("tb"))
        )
        .select("id_a", "id_b", "cbs")
    )
