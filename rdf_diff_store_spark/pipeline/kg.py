"""Knowledge-graph construction pipeline (the north_star DAG):

pages ─(1) extract          deterministic boilerplate-strip (pandas UDF;
                            byte-identical per url ≙ prettify O-13)
      ─(2) mentions         posexplode word positions, filter entity
                            tokens (JVM regex, no Python)
      ─(3) near-dup pairs   MinHash-LSH banding over first-capture text
      ─(4) alias edges      position-aligned mention mismatches on
                            Jaccard-verified near-dup page pairs
      ─(5) canonicalize     connected components (iterative min-label
                            joins) → token → canonical entity id
      ─(6) quads            (graph_id=url, subj, pred, obj, warc_ts)
      ─(7) changelog        canonical per-(url,ts) Turtle payload +
                            content hash; tombstones for disappeared
                            urls; consecutive-dup compaction (O-01/O-02)

Snapshots/diffs/metadata then come straight from operators.versioned.

Scale notes: stages 1–2 and 6–7 are narrow (no shuffle except the
per-(url,ts) payload aggregation); stage 3 shuffles on LSH bucket
keys (AQE splits skewed buckets — hub boilerplate); stage 5 shuffles
on vertex id with per-iteration localCheckpoint. Every stage boundary
goes through StageRecorder — parquet checkpoint + per-partition
lineage counts — so a killed run resumes at the last completed stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf_diff_store_spark.functions.text import extract_text_udf
from rdf_diff_store_spark.metrics import StageRecorder
from rdf_diff_store_spark.operators.dedup import jaccard_on_pairs, lsh_candidate_pairs
from rdf_diff_store_spark.operators.graph import connected_components

ENTITY_TOKEN_RE = r"^ENT[0-9]+[a-z]?$"
ENTITY_IRI_PREFIX = "http://kg.example.org/entity/"


def extract_pages(pages: DataFrame) -> DataFrame:
    """Stage 1: recompute text from html (the pipeline never trusts a
    pre-extracted column) — Arrow-batched UDF."""
    return pages.select(
        "url", "warc_ts", extract_text_udf(F.col("html")).alias("text"), "lang"
    )


def mentions_of(extracted: DataFrame) -> DataFrame:
    """Stage 2: (url, warc_ts, pos, token) for entity-shaped tokens."""
    words = F.split(F.trim(F.col("text")), r"\s+")
    return (
        extracted.select("url", "warc_ts", F.posexplode(words).alias("pos", "token"))
        .filter(F.col("token").rlike(ENTITY_TOKEN_RE))
    )


def first_capture(extracted: DataFrame) -> DataFrame:
    """One row per url: the earliest capture's text (dedup corpus).
    min_by hash-agg, not a window: partial+final combine means the
    shuffle carries at most one row per (url, input partition) instead
    of sorting every capture — the same latest-wins trick snapshot_at
    uses (text tiebreak keeps ties deterministic)."""
    return (
        extracted.groupBy("url")
        .agg(
            F.min_by(
                F.struct("warc_ts", "text"), F.struct("warc_ts", "text")
            ).alias("f")
        )
        .select("url", F.col("f.warc_ts").alias("warc_ts"), F.col("f.text").alias("text"))
    )


def alias_edges(
    firsts: DataFrame, first_mentions: DataFrame, min_jaccard: float = 0.4
) -> DataFrame:
    """Stages 3-4: LSH near-dup url pairs, Jaccard-verified, then
    position-aligned mention mismatches become entity-equivalence
    edges (src, dst).

    32 hashes / 16 bands (r=2): collision probability 1-(1-j²)^16,
    ≈0.99 at j=0.5 — mirror pages with 3 swapped tokens out of 30
    words sit right at j≈0.5, so the wider banding is what keeps
    recall above the 0.95 gate."""
    from rdf_diff_store_spark.operators.dedup import shingle_frame

    sh = shingle_frame(firsts, id_col="url", text_col="text")
    pairs = lsh_candidate_pairs(
        firsts, id_col="url", text_col="text", num_hashes=32, bands=16, shingles=sh
    )
    verified = jaccard_on_pairs(
        pairs, firsts, id_col="url", text_col="text", shingles=sh
    ).filter(F.col("jaccard") >= min_jaccard)
    ma = first_mentions.select(
        F.col("url").alias("id_a"), F.col("pos"), F.col("token").alias("token_a")
    )
    mb = first_mentions.select(
        F.col("url").alias("id_b"), F.col("pos"), F.col("token").alias("token_b")
    )
    return (
        verified.join(ma, "id_a")
        .join(mb, ["id_b", "pos"])
        .filter(F.col("token_a") != F.col("token_b"))
        .select(F.col("token_a").alias("src"), F.col("token_b").alias("dst"))
        .distinct()
    )


def canonical_entity_map(edges: DataFrame) -> DataFrame:
    """Stage 5: token → canonical (min token of its component)."""
    return connected_components(edges).select(
        F.col("id").alias("token"), F.col("component").alias("canonical")
    )


def quads_of(mentions: DataFrame, extracted: DataFrame, entity_map: DataFrame) -> DataFrame:
    """Stage 6: quads (graph_id, subj, pred, obj, obj_dt, obj_lang,
    warc_ts). Entity map is tiny → broadcast; unmapped tokens are
    their own canonical id."""
    canon = F.coalesce(F.col("canonical"), F.col("token"))
    # distinct over the NARROW (url, warc_ts, obj) projection only —
    # the duplicated url column, constant pred and null typing columns
    # are re-added after, so they never ride the dedup shuffle
    # (~2x fewer shuffle bytes on the fattest exchange of this stage)
    mention_quads = (
        mentions.join(F.broadcast(entity_map), "token", "left")
        .select(
            "url",
            "warc_ts",
            F.concat(F.lit(ENTITY_IRI_PREFIX), canon).alias("obj"),
        )
        .distinct()
        .select(
            F.col("url").alias("graph_id"),
            F.col("url").alias("subj"),
            F.lit("http://kg.example.org/mentions").alias("pred"),
            "obj",
            F.lit(None).cast("string").alias("obj_dt"),
            F.lit(None).cast("string").alias("obj_lang"),
            "warc_ts",
        )
    )
    # extracted is one row per (url, warc_ts) already — projections of
    # it need NO distinct (each removed distinct was a full shuffle)
    lang_quads = extracted.select(
        F.col("url").alias("graph_id"),
        F.col("url").alias("subj"),
        F.lit("http://kg.example.org/inLanguage").alias("pred"),
        F.col("lang").alias("obj"),
        F.lit("http://www.w3.org/2001/XMLSchema#string").alias("obj_dt"),
        F.lit(None).cast("string").alias("obj_lang"),
        "warc_ts",
    )
    # content fingerprint: ties the graph version to the page body, so
    # content changes produce new versions while byte-identical
    # re-crawls compact away (idempotent-write contract)
    from rdf_diff_store_spark.functions.text import fingerprint

    fp_quads = extracted.select(
        F.col("url").alias("graph_id"),
        F.col("url").alias("subj"),
        F.lit("http://kg.example.org/contentFingerprint").alias("pred"),
        fingerprint(F.col("text")).cast("string").alias("obj"),
        F.lit("http://www.w3.org/2001/XMLSchema#string").alias("obj_dt"),
        F.lit(None).cast("string").alias("obj_lang"),
        "warc_ts",
    )
    return mention_quads.unionByName(lang_quads).unionByName(fp_quads)


def changelog_of(quads: DataFrame, pages: DataFrame) -> DataFrame:
    """Stage 7: per-(url, warc_ts) canonical payload + content hash,
    tombstones for urls that vanish from later crawl rounds, then
    consecutive-duplicate compaction (bulk-replay idempotence)."""
    from rdf_diff_store_spark.operators.versioned import compact_changelog

    line = F.concat(
        F.lit("<"), F.col("subj"), F.lit("> <"), F.col("pred"), F.lit("> "),
        F.when(
            F.col("obj_dt").isNull() & F.col("obj_lang").isNull(),
            F.concat(F.lit("<"), F.col("obj"), F.lit(">")),
        ).otherwise(F.concat(F.lit('"'), F.col("obj"), F.lit('"'))),
        F.lit(" ."),
    )
    # ONE exchange for the whole adds branch (r06, guide §2.4): hash-
    # repartitioning the narrow (graph_id, ts, line) projection on
    # graph_id satisfies the ClusteredDistribution of BOTH the
    # per-(graph_id, ts) payload aggregation and compact_changelog's
    # graph_id window below, so the agg plans complete-mode with no
    # second shuffle of the adds rows. Measured at bench scale
    # (445k quads): changelog stage 1.69 s → 1.15 s, identical rows.
    spark = quads.sparkSession
    adds = (
        quads.select(F.col("graph_id"), F.col("warc_ts").alias("ts"), line.alias("line"))
        .repartition(spark.sparkContext.defaultParallelism, "graph_id")
        .groupBy("graph_id", "ts")
        # collect_set: a graph is a SET of triples — re-sent rows or
        # duplicate quads can never change the canonical payload
        .agg(F.concat_ws("\n", F.array_sort(F.collect_set("line"))).alias("payload"))
        .select(
            "graph_id",
            "ts",
            F.lit("add").alias("op"),
            F.concat(F.col("payload"), F.lit("\n")).alias("payload"),
        )
        .withColumn("content_hash", F.sha2(F.col("payload"), 256))
    )
    # tombstones: a url whose last capture precedes the last crawl
    # round is deleted at the first later round. The crawl-round frame
    # is tiny (one row per round), so "next round" is a broadcast
    # self-join + min — no global-order window anywhere in the plan.
    rounds = pages.select("warc_ts").distinct()
    later = rounds.select(F.col("warc_ts").alias("tomb_ts"))
    next_round = (
        rounds.select(F.col("warc_ts").alias("last_ts"))
        .join(F.broadcast(later), F.col("tomb_ts") > F.col("last_ts"), "left")
        .groupBy("last_ts")
        .agg(F.min("tomb_ts").alias("tomb_ts"))
    )
    last_seen = pages.groupBy("url").agg(F.max("warc_ts").alias("last_ts"))
    tombstones = (
        last_seen.join(F.broadcast(next_round), "last_ts")
        .filter(F.col("tomb_ts").isNotNull())
        .select(
            F.col("url").alias("graph_id"),
            F.col("tomb_ts").alias("ts"),
            F.lit("delete").alias("op"),
            F.lit(None).cast("string").alias("payload"),
            F.lit(None).cast("string").alias("content_hash"),
        )
    )
    return compact_changelog(adds.unionByName(tombstones))


def build_kg(
    spark: SparkSession, pages: DataFrame, work_dir: str | None = None
) -> tuple[DataFrame, StageRecorder]:
    """Run the full DAG; returns (changelog, recorder). With a
    work_dir, every stage checkpoints to parquet and a re-run resumes
    from completed stages."""
    rec = StageRecorder(spark, work_dir)
    extracted = rec.stage("extract", extract_pages(pages))
    mentions = rec.stage("mentions", mentions_of(extracted))
    firsts = rec.stage("first_capture", first_capture(extracted))
    # mentions of the first capture only: re-tokenizing the 1-per-url
    # frame is cheaper than a dense_rank window over every capture's
    # mention rows
    first_mentions = mentions_of(firsts)
    edges = rec.stage("alias_edges", alias_edges(firsts, first_mentions))
    entity_map = rec.stage("entity_map", canonical_entity_map(edges))
    quads = rec.stage("quads", quads_of(mentions, extracted, entity_map))
    from rdf_diff_store_spark.operators.versioned import with_day_partition

    # checkpoint the changelog in the production days(ts) layout so
    # downstream snapshot/diff reads prune partitions (no-op in-memory)
    changelog = rec.stage(
        "changelog",
        with_day_partition(changelog_of(quads, pages)) if work_dir else changelog_of(quads, pages),
        partition_by="day" if work_dir else None,
    )
    rec.flush()
    # the changelog stage is fully materialized by its lineage count;
    # drop the six intermediate stage caches so back-to-back pipeline
    # runs don't accumulate dead storage blocks (guide §5)
    rec.release_intermediates()
    return changelog, rec
