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


def sorted_neighborhood(
    profiles: DataFrame,
    key_col: str = "key",
    window: int = 3,
    prefix_len: int = 2,
) -> DataFrame:
    """Sorted-neighborhood ER blocking (Hernández & Stolfo, SIGMOD
    1995): sort all profiles by a fabricated blocking key and emit
    every pair within `window` positions of each other — the classic
    complement to hash blocking (`meta_blocking`): typo'd keys that
    hash apart still sort adjacent.

    EXACT global-order semantics with no global sort: the total order
    is built two-level, the way distributed sorted-neighborhood
    implementations do it (Kolb et al., Dedoop / Load-Balanced SNM) —

    1. bucket = the key's `prefix_len`-char prefix; prefix buckets
       are CONTIGUOUS under lexicographic order, so per-bucket
       `row_number` windows (hash-partitioned, no funnel) give local
       positions;
    2. bucket offsets = a DISTRIBUTED prefix scan over the
       (bucket, count) frame: range-partition by bucket, run the
       running sum per range partition (a PARTITIONED window — no
       single-task funnel even when `prefix_len` makes |buckets|
       approach |rows|), then add each partition's base offset,
       computed by a triangular broadcast join over the
       #partitions-row totals frame. The ranged frame is frozen with
       an eager localCheckpoint so both consumers (per-partition scan
       and partition totals) see the SAME range boundaries —
       repartitionByRange re-samples per execution, and a lazy
       double-compute would silently mis-align pids (CLAUDE.md barrier
       rule);
    3. global_pos = offset + local pos. Pairs join band-to-band
       (band = global_pos div window, probe band and band+1), so the
       neighborhood predicate is two equi-joins + a filter — never a
       BroadcastNestedLoopJoin range join.

    Profiles whose key is NULL have no position in the sort order and
    are dropped explicitly up front (stated contract, not a join
    artifact): a NULL blocking key carries no sortable evidence.

    Returns (id_a, id_b) with id_a the earlier row in sort order —
    windows CROSS bucket boundaries exactly (the two-level order is
    the true global order), which naive per-partition variants lose.
    """
    rows = profiles.filter(F.col(key_col).isNotNull()).select(
        F.col("id"), F.col(key_col).alias("_key"),
        F.substring(F.col(key_col), 1, prefix_len).alias("_bucket"),
    )
    from pyspark.sql import Window as W

    pos = F.row_number().over(W.partitionBy("_bucket").orderBy("_key", "id"))
    local = rows.select("id", "_key", "_bucket", pos.alias("_pos"))
    counts = rows.groupBy("_bucket").agg(F.count("*").alias("_cnt"))
    # distributed prefix scan: order-preserving range partitions, each
    # scanned independently, stitched by per-partition base offsets.
    n_scan = max(2, counts.sparkSession.sparkContext.defaultParallelism)
    ranged = (
        counts.repartitionByRange(n_scan, "_bucket")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # freeze pids for both consumers
    )
    within = F.coalesce(
        F.sum("_cnt").over(
            W.partitionBy("_pid").orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    loc = ranged.select("_bucket", "_pid", within.alias("_woff"))
    tot = ranged.groupBy("_pid").agg(F.sum("_cnt").alias("_ptot"))
    base = (
        tot.alias("x")
        .join(F.broadcast(tot.alias("y")), F.col("y._pid") < F.col("x._pid"), "left")
        .groupBy(F.col("x._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("y._ptot"), F.lit(0)).alias("_poff"))
    )
    off = loc.join(F.broadcast(base), "_pid").select(
        "_bucket", (F.col("_poff") + F.col("_woff")).alias("_off")
    )
    g = local.join(off, "_bucket").select(
        "id", (F.col("_off") + F.col("_pos")).cast("bigint").alias("_g")
    )
    banded = g.select("id", "_g", F.expr(f"_g div {window}").alias("_band"))
    a = banded.alias("a")
    pairs = None
    # a pair (g, g') with g < g' <= g + window has band' in {band,
    # band+1}, and in exactly ONE of them — the two shifted equi-joins
    # partition the band predicate, so no distinct is needed
    for shift in (0, 1):
        b = banded.select(
            F.col("id").alias("id_b"),
            F.col("_g").alias("_gb"),
            (F.col("_band") - shift).alias("_band"),
        ).alias("b")
        part = a.join(b, "_band").filter(
            (F.col("_gb") > F.col("_g")) & (F.col("_gb") <= F.col("_g") + window)
        )
        pairs = part if pairs is None else pairs.unionByName(part)
    return pairs.select(F.col("a.id").alias("id_a"), "id_b")
