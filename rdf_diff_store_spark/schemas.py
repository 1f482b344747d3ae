"""Canonical schemas (FIXTURES.md; BASELINE.json input_hint).

The reference's data model is narrow and fixed (SURVEY.md §1.2):
graph documents keyed by id, versioned by unix-seconds commit time,
expanded into (subject, predicate, object) triples. We keep the same
narrowness but store it columnar.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Common-Crawl-style page table — the authoritative input shape
# (BASELINE.json input_hint).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Ingest row — mirrors the reference write API's Graph model
# {id, format, graph} (reference: src/models/graph.rs:14-22) plus the
# version timestamp the reference takes from Signature::now
# (reference: src/git.rs:208).
GRAPH_UPDATES = T.StructType(
    [
        T.StructField("graph_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("op", T.StringType(), False),  # 'add' | 'delete'
        T.StructField("payload", T.StringType(), True),  # Turtle; null for delete
        T.StructField("format", T.StringType(), True),
    ]
)

# Append-only changelog — one row per accepted graph version
# (= one git commit in the reference, src/git.rs:192-222).
# content_hash is the idempotence key: the reference skips a write
# when the *canonicalized* document is byte-identical to the stored
# file (src/graphs.rs:52-61); here that is sha2(canonical_payload).
CHANGELOG = T.StructType(
    [
        T.StructField("graph_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),  # canonical form
        T.StructField("content_hash", T.StringType(), True),
    ]
)

# Quad/triple table (FIXTURES.md §3). obj_dt / obj_lang carry RDF
# literal typing that the reference leaves opaque inside oxigraph.
TRIPLES = T.StructType(
    [
        T.StructField("graph_id", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_dt", T.StringType(), True),
        T.StructField("obj_lang", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir: str, name: str):
    """Read one driver-provided parquet table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
