"""Fact fusion / truth discovery over multi-source extractions — the
stage between extraction (operators/structured.py, operators/tables.py)
and the versioned store (operators/versioned.py): the same (subj, pred)
is asserted with CONFLICTING objects by thousands of hosts on the open
web, and the store should ingest one fused, provenance-weighted truth
per functional attribute (Knowledge Vault, Dong et al. KDD 2014, runs
exactly this fusion in front of its KG; the reference ingests
already-fused RDF — /root/reference/src/graphs.rs:30-61 — so on web
data this operator is what produces its input).

Three operators:

* ``fact_support`` — provenance rollup: distinct-source / claim counts
  per fact. ONE map-side-combinable aggregation.
* ``source_trust`` — the Sums truth-discovery algorithm (Pasternack &
  Roth, COLING 2010): trust(source) ⇆ belief(fact) fixpoint iteration,
  which on the bipartite source→fact graph IS Kleinberg's HITS (trust
  = hub, belief = authority). Implemented by delegating to the repo's
  bit-exact integer ``operators.graph.hits`` — same micro-unit
  div-by-max rescale, same engine-portable BIGINT arithmetic, same
  unrolled-CTE oracle story.
* ``resolve_conflicts`` — per (subj, pred) pick the object whose
  supporting sources carry the most total trust (ties: lexicographic
  smallest object, deterministic in any engine).

Scale shape at 10^11 claims: distinct() is one shuffle; each HITS
half-round is one shuffle-hash join + one combinable sum (hot facts —
claimed by millions of pages — are absorbed by partial aggregation and
AQE skew splitting); conflict resolution is one join + one windowed
top-1 partitioned by (subj, pred), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# U+001F (unit separator) cannot appear in IRIs and is scrubbed from
# web text by functions/text.py::clean_text — safe fact-id glue.
_SEP = "\x1f"

_FACT_COLS = ["subj", "pred", "obj"]


def _fact_id() -> F.Column:
    return F.concat_ws(_SEP, *_FACT_COLS)


def fact_support(claims: DataFrame, source_col: str = "source") -> DataFrame:
    """(subj, pred, obj) → n_sources (distinct), n_claims — the
    provenance weight of every asserted fact. Input rows are
    (source, subj, pred, obj) claims, one per extraction occurrence
    (the same source asserting a fact on many pages raises n_claims
    but not n_sources). ONE aggregation shuffle, both counts partial-
    aggregated map-side."""
    return claims.groupBy(*_FACT_COLS).agg(
        F.countDistinct(source_col).alias("n_sources"),
        F.count(F.lit(1)).alias("n_claims"),
    )


def source_trust(
    claims: DataFrame,
    iterations: int = 3,
    source_col: str = "source",
) -> tuple[DataFrame, DataFrame]:
    """Sums truth discovery (Pasternack & Roth 2010) in exact integer
    micro-units: every source starts with trust 1,000,000; each round

        belief(f) = Σ_{s asserts f} trust(s)   (rescaled div-by-max)
        trust(s)  = Σ_{f asserted by s} belief(f)   (rescaled)

    over the DISTINCT claim set. Returns ``(trust, beliefs)``:
    (source, trust_micro) and (subj, pred, obj, belief_micro).

    This is HITS on the bipartite source→fact graph — trust is hub
    mass, belief is authority mass — so it delegates to
    ``operators.graph.hits`` verbatim: identical integer model,
    identical plan shape, identical oracle strategy (unrolled CTEs
    match bit-for-bit; belief is the authority of the FINAL round's
    first half-step, trust the hub after its second, exactly as hits
    returns). Fact ids ride a U+001F-glued key that is never split
    back — beliefs re-attach to the fact table by equi-join."""
    from rdf_diff_store_spark.operators.graph import hits

    c = claims.select(
        F.col(source_col).alias("source"), *_FACT_COLS
    ).distinct()
    edges = c.select(
        F.concat(F.lit("s:"), F.col("source")).alias("src"),
        F.concat(F.lit("f:"), _fact_id()).alias("dst"),
    )
    scores = hits(edges, iterations=iterations)
    trust = (
        scores.filter(F.col("node").startswith("s:"))
        .select(
            F.expr("substring(node, 3)").alias("source"),
            F.col("hub_micro").alias("trust_micro"),
        )
    )
    facts = c.select(*_FACT_COLS).distinct().withColumn("_fid", _fact_id())
    beliefs = (
        scores.filter(F.col("node").startswith("f:"))
        .select(
            F.expr("substring(node, 3)").alias("_fid"),
            F.col("auth_micro").alias("belief_micro"),
        )
        .join(facts, "_fid")
        .select(*_FACT_COLS, "belief_micro")
    )
    return trust, beliefs


def resolve_conflicts(
    claims: DataFrame,
    trust: DataFrame,
    source_col: str = "source",
) -> DataFrame:
    """One fused object per (subj, pred): the value whose DISTINCT
    supporting sources carry the most total trust (micro-units from
    ``source_trust``, or any (source, trust_micro) frame — uniform
    trust degrades to majority vote). Ties break on the
    lexicographically smallest object, so the result is deterministic
    in any engine. Output: (subj, pred, obj, support_micro,
    n_sources).

    Plan: distinct claims ⋈ trust (sources are the SMALL side of web
    fusion — broadcastable at 10^8 sources × 16 bytes under AQE), one
    combinable per-fact sum, one row_number window partitioned by
    (subj, pred) — top-1 per group, never a global sort."""
    c = claims.select(
        F.col(source_col).alias("source"), *_FACT_COLS
    ).distinct()
    # LEFT join: a source absent from the trust frame (e.g. trust
    # computed on an earlier crawl) contributes 0 trust but still
    # counts as a source — its facts must not vanish from the output
    support = (
        c.join(trust, "source", "left")
        .groupBy(*_FACT_COLS)
        .agg(
            F.sum(F.coalesce(F.col("trust_micro"), F.lit(0).cast("bigint"))).alias(
                "support_micro"
            ),
            F.count(F.lit(1)).alias("n_sources"),
        )
    )
    w = Window.partitionBy("subj", "pred").orderBy(
        F.col("support_micro").desc(), F.col("obj").asc()
    )
    return (
        support.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def fact_intervals(
    observations: DataFrame,
    gap_seconds: int,
    ts_col: str = "ts",
) -> DataFrame:
    """Temporal fact validity from crawl observations — the temporal-KG
    reading of the diff store's data: a fact (subj, pred, obj) seen on
    crawls t₁…tₖ is VALID over each maximal run of sightings whose
    consecutive gaps stay ≤ ``gap_seconds``; a longer silence closes
    the interval (the page stopped asserting it) and a later sighting
    opens a new one (the fact came back). Classic session-gap algebra
    lifted onto facts.

    Input: (subj, pred, obj, ts) with NTZ timestamps. Output one row
    per validity interval: (subj, pred, obj, valid_from_s, valid_to_s,
    n_obs) — epoch SECONDS as BIGINT (the timezone-proof lexical:
    timestamp_diff against an NTZ epoch literal, never a session-TZ
    cast — CLAUDE.md).

    Scale: one window + one aggregation, both partitioned by the fact
    key and SHARING that hash partitioning (one Exchange total, the
    change_rate precedent); hot facts sort only their own sightings.
    """
    from pyspark.sql import Window

    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    secs = F.timestamp_diff(
        "SECOND", epoch, F.col(ts_col).cast("timestamp_ntz")
    )
    obs = observations.select(*_FACT_COLS, secs.alias("_s"))
    w = Window.partitionBy(*_FACT_COLS).orderBy("_s")
    new_run = F.when(
        F.col("_s") - F.lag("_s").over(w) > gap_seconds, 1
    ).otherwise(0)
    run_id = F.sum(new_run).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        obs.withColumn("_run", run_id)
        .groupBy(*_FACT_COLS, "_run")
        .agg(
            F.min("_s").alias("valid_from_s"),
            F.max("_s").alias("valid_to_s"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .drop("_run")
    )
