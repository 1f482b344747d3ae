"""Turtle-file source/sink — direct on-disk compatibility with the
reference's storage layout.

The reference persists one Turtle file per graph in the repo root,
filename = base64(graph_id) with '/'→'_' and '+'→'-', suffix '.ttl'
(reference: src/graphs.rs:42-45; pathological ids like "<#/(%¤=:" are
exercised by tests/integration_test.rs:22). A user can therefore
point `read_graph_dir` at a checkout of an existing rdf-diff-store
git repo (any commit) and get the same graphs this engine serves, and
`write_snapshot_dir` emits a directory the reference could serve.

Scale path: `spark.read.format("binaryFile")` distributes the file
scan across executors; the filename decode and Turtle canonicalization
are the usual vectorized paths. The non-recursive `*.ttl` filter
mirrors read_all_graph_files (src/graphs.rs:96-135).
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def encode_graph_filename(graph_id: str) -> str:
    """graph id → filename, matching src/graphs.rs:42-45."""
    b64 = base64.b64encode(graph_id.encode("utf-8")).decode("ascii")
    return b64.replace("/", "_").replace("+", "-") + ".ttl"


def decode_graph_filename(name: str) -> str:
    stem = name[: -len(".ttl")] if name.endswith(".ttl") else name
    b64 = stem.replace("_", "/").replace("-", "+")
    return base64.b64decode(b64.encode("ascii")).decode("utf-8")


@F.pandas_udf(T.StringType())
def _decode_filename_udf(names: pd.Series) -> pd.Series:
    return names.map(decode_graph_filename)


def read_graph_dir(spark: SparkSession, path: str, ts: str | None = None) -> DataFrame:
    """Read a directory of {b64(graph_id)}.ttl files into graph-update
    rows (graph_id, ts, op='add', payload, format) ready for
    append_updates. `ts` defaults to each file's modificationTime —
    the closest analog of the reference's commit stamp."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.ttl")
        .option("recursiveFileLookup", "false")
        .load(path)
    )
    ts_col = (
        F.lit(ts).cast("timestamp") if ts is not None else F.col("modificationTime").cast("timestamp")
    )
    return files.select(
        _decode_filename_udf(F.element_at(F.split(F.col("path"), "/"), -1)).alias("graph_id"),
        ts_col.alias("ts"),
        F.lit("add").alias("op"),
        F.col("content").cast("string").alias("payload"),
        F.lit("text/turtle").alias("format"),
    )


def write_snapshot_dir(snapshot_triples: DataFrame, path: str) -> int:
    """Write a snapshot (triples form) as one canonical .ttl file per
    graph, named exactly as the reference would name them. Returns the
    number of graphs written.

    Files are written driver-side after a per-graph aggregation — the
    per-graph document is one row; at web scale you'd write a single
    partitioned table instead (this sink exists for reference interop,
    not for the 100 TB path)."""
    import os

    from rdf_diff_store_spark.functions.turtle import serialize_graph

    os.makedirs(path, exist_ok=True)
    rows = serialize_graph(snapshot_triples).collect()
    for r in rows:
        fname = encode_graph_filename(r.graph_id)
        with open(os.path.join(path, fname), "w", encoding="utf-8") as fh:
            fh.write(r.doc + "\n")
    return len(rows)
