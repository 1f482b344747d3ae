"""Entity-link scoring: mention → candidate-entity scores via an
Arrow-batched pandas UDF (the north_star's "batched mention detection
and entity-link scoring via Arrow pandas UDFs" stage; the reference
delegates all entity semantics to opaque graph payloads —
/root/reference/src/graphs.rs:17-61 stores, never links — so this
stage is specified by BASELINE.json's north_star, not by reference
code).

Design for 100 TB:

* The candidate dictionary is TINY relative to the corpus (top-N
  aliases) — it broadcasts; the mention×candidate match is a
  broadcast nested-loop join with a JVM `levenshtein` band predicate,
  never a shuffle of the corpus.
* Feature extraction (edit distance, lengths, corpus priors) stays
  JVM-side inside whole-stage codegen; ONLY the final score
  combination crosses to Python, as one Arrow-vectorized pandas UDF
  over numeric columns (no strings cross the boundary).
* Scoring uses pure IEEE-754 rational arithmetic (no transcendentals)
  so the DuckDB oracle twin reproduces it bit-for-bit.
* Top-1 link per mention is a `max_by` hash-aggregation (partial +
  final combine), not a window sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

ALIAS_RE = r"^[A-Za-z]{5,}$"


# DataType instance, not a DDL string: the string form would need an
# active SparkSession at import time (module must import session-free)
@pandas_udf(DoubleType())
def link_score(
    lev: pd.Series, tok_len: pd.Series, alias_len: pd.Series,
    freq: pd.Series, max_freq: pd.Series,
) -> pd.Series:
    """score = 0.8 * string_similarity + 0.2 * corpus_prior.

    Vectorized numpy float64 throughout; every operation is an exact
    IEEE primitive (div/mul/add, max), so any engine computing the
    same formula in doubles produces the identical bit pattern —
    the basis for the DuckDB oracle twin.
    """
    max_len = pd.concat([tok_len, alias_len], axis=1).max(axis=1).astype("float64")
    sim = 1.0 - lev.astype("float64") / max_len
    prior = freq.astype("float64") / max_freq.astype("float64")
    return 0.8 * sim + 0.2 * prior


def candidate_dictionary(docs: DataFrame, text_col: str = "text", top_n: int = 50) -> DataFrame:
    """Corpus-derived alias dictionary: the top_n most frequent
    entity-shaped tokens with their corpus frequency and the corpus
    max frequency (carried on every row so prior normalization never
    needs a second pass). Deterministic order: (freq DESC, alias ASC).
    """
    tokens = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("alias")
    ).filter(F.col("alias").rlike(ALIAS_RE))
    counts = tokens.groupBy("alias").agg(F.count("*").alias("alias_freq"))
    top = counts.orderBy(F.col("alias_freq").desc(), F.col("alias").asc()).limit(top_n)
    # top_n rows: the scalar max rides a broadcast-joined literal frame
    mx = top.agg(F.max("alias_freq").alias("max_freq"))
    return top.crossJoin(F.broadcast(mx))


def entity_link_scores(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_lev: int = 2,
) -> DataFrame:
    """Top-1 entity link per (doc, mention): broadcast band join on
    levenshtein <= max_lev, Arrow-batched score, max_by winner with a
    deterministic (score, entity) tie-break. Exact matches of an
    alias with itself (lev=0) naturally score highest on the string
    term; the prior breaks ties between near-miss aliases."""
    mentions = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("mention"),
        )
        .filter(F.col("mention").rlike(ALIAS_RE))
        .distinct()
        # AQE sizes the distinct output by BYTES and coalesces a compact
        # mention frame to ~1-2 partitions — but each row then pays
        # |dict| levenshtein calls in the nested-loop band join below
        # (the shingle_frame lesson: repartition before CPU-heavy
        # per-row work). Same-key hash partitioning keeps determinism.
        .repartition(docs.sparkSession.sparkContext.defaultParallelism, "mention")
    )
    lev = F.levenshtein(F.col("mention"), F.col("alias"))
    scored = (
        mentions.join(
            F.broadcast(candidates), lev <= F.lit(max_lev)
        )
        .withColumn(
            "score",
            link_score(
                lev.cast("long"),
                F.length("mention").cast("long"),
                F.length("alias").cast("long"),
                F.col("alias_freq").cast("long"),
                F.col("max_freq").cast("long"),
            ),
        )
    )
    # winner per mention: hash-agg max over the (score, alias) struct —
    # ties on the double score fall to the lexicographically LAST
    # alias, a total order both engines agree on. The struct is built
    # in ONE projection so Catalyst's ProjectCollapse cannot duplicate
    # the pandas-UDF score expression (audit asserts one ArrowEvalPython)
    packed = scored.select(
        "doc_id", "mention", F.struct(F.col("score"), F.col("alias")).alias("w0")
    )
    return (
        packed.groupBy("doc_id", "mention")
        .agg(F.max("w0").alias("w"), F.count("*").alias("n_candidates"))
        .select(
            "doc_id",
            "mention",
            F.col("w.alias").alias("entity"),
            F.round(F.col("w.score"), 4).alias("score"),
            "n_candidates",
        )
    )


def deletion_variants(col, max_del: int = 2):
    """All strings reachable from ``col`` by deleting up to ``max_del``
    characters (the FastSS deletion neighborhood, Bocek et al. 2007):
    ``ed(a, b) <= k`` implies the k-deletion neighborhoods of a and b
    intersect (delete the mismatched position of each side for every
    edit in an optimal alignment), so an equi-join on variants has
    100% recall for a levenshtein band — over-generated pairs are
    removed by a verify filter.

    Pure JVM array expression: ONE nested transform over position
    sequences (never one lambda per position — the Janino-compile
    lesson from MinHash), whole-stage-codegen friendly, duplicate
    variants of repeated characters removed with array_distinct.
    Supports max_del in {1, 2} — a 2-deletion neighborhood of an
    n-char token is O(n^2/2) variants (~120 at n=15), the documented
    scale envelope for max_lev=2 band joins."""
    if max_del not in (1, 2):
        raise ValueError(f"deletion_variants supports max_del 1 or 2, got {max_del}")
    s = col
    n = F.length(s)
    empty = F.array().cast("array<string>")
    # delete the 0-based position i: prefix s[1..i] ++ suffix s[i+2..]
    d1 = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat(s.substr(F.lit(1), i), s.substr(i + 2, n)),
        ),
    ).otherwise(empty)
    parts = [F.array(s), d1]
    if max_del >= 2:
        # delete 0-based positions i < j in one pass
        d2 = F.when(
            n >= 2,
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.transform(
                        F.sequence(i + 1, n - 1),
                        lambda j: F.concat(
                            s.substr(F.lit(1), i),
                            s.substr(i + 2, j - i - 1),
                            s.substr(j + 2, n),
                        ),
                    ),
                )
            ),
        ).otherwise(empty)
        parts.append(d2)
    return F.array_distinct(F.concat(*parts))


def entity_link_blocked(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_lev: int = 2,
) -> DataFrame:
    """`entity_link_scores` for dictionaries too big to broadcast:
    bit-identical output, no BroadcastNestedLoopJoin anywhere in the
    plan (audit-asserted).

    The broadcast variant's mention x candidate match is a broadcast
    nested loop — O(corpus_mentions x |dict|) levenshtein calls and a
    full-dictionary broadcast, both of which die at a 10^8-alias web
    dictionary. This path scales every term independently:

    * candidate pairs are minted by an EQUI-join on FastSS deletion
      variants (`deletion_variants`) — exact recall for the
      levenshtein band, work proportional to variant collisions, and
      the shuffle carries only short strings (the id-only-pair-dedup
      lesson from similarity.lsh_topk applies: nothing wide rides the
      pair exchange);
    * scoring runs per DISTINCT mention string, not per (doc,
      mention) — the score formula has no doc term, so the Arrow UDF
      hop and the top-1 aggregation touch |mentions| x band rows,
      after which one equi-join fans winners back out to documents;
    * the dictionary is only ever touched by equi-joins on
      (variant, alias) — it can live in a 10^8-row table.

    North-star stage 2b at scale; same spec note as
    `entity_link_scores` (the reference stores, never links —
    /root/reference/src/graphs.rs:17-61)."""
    doc_mentions = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("mention"),
        )
        .filter(F.col("mention").rlike(ALIAS_RE))
        .distinct()
    )
    ment = (
        doc_mentions.select("mention")
        .distinct()
        # same AQE-coalesce guard as the broadcast variant: the O(n^2/2)
        # variant expansion below is the CPU-heavy per-row stage
        .repartition(docs.sparkSession.sparkContext.defaultParallelism, "mention")
    )
    mvar = ment.select(
        "mention", F.explode(deletion_variants(F.col("mention"), max_lev)).alias("v")
    )
    cvar = candidates.select(
        "alias", F.explode(deletion_variants(F.col("alias"), max_lev)).alias("v")
    )
    pairs = (
        mvar.join(cvar, "v")
        .select("mention", "alias")
        .distinct()  # strings-only exchange: no freq/score payload rides it
        .filter(F.levenshtein("mention", "alias") <= F.lit(max_lev))
    )
    matched = pairs.join(candidates, "alias")
    lev = F.levenshtein(F.col("mention"), F.col("alias"))
    scored = matched.withColumn(
        "score",
        link_score(
            lev.cast("long"),
            F.length("mention").cast("long"),
            F.length("alias").cast("long"),
            F.col("alias_freq").cast("long"),
            F.col("max_freq").cast("long"),
        ),
    )
    # per-MENTION winner (one projection: ProjectCollapse cannot
    # duplicate the Arrow score expression — same guard as the
    # broadcast variant), then fan out to documents
    packed = scored.select("mention", F.struct(F.col("score"), F.col("alias")).alias("w0"))
    winners = (
        packed.groupBy("mention")
        .agg(F.max("w0").alias("w"), F.count("*").alias("n_candidates"))
        .select(
            "mention",
            F.col("w.alias").alias("entity"),
            F.round(F.col("w.score"), 4).alias("score"),
            "n_candidates",
        )
    )
    return doc_mentions.join(winners, "mention").select(
        "doc_id", "mention", "entity", "score", "n_candidates"
    )
