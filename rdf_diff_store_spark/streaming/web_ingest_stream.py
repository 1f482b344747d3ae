"""Streaming web→KG ingest: the `kg_web_ingest` composition run per
micro-batch of crawled pages — the live form of the reference's write
path (/root/reference/src/bin/rdf-diff-writer.rs:45-91 applies pushes
on a 60 s cadence; a live crawler lands pages continuously and the
store must version each page's extracted RDF as it arrives).

Per batch: multi-format extraction (JSON-LD ∪ RDFa, optionally
microdata) → OpenGraph→schema.org alignment → skolemization →
per-page Turtle serialization → `StreamingChangelogWriter`
(streaming/ingest.py), which provides the exactly-once incremental
append: content-identical re-crawls are skipped (the reference's
skip-write, src/graphs.rs:52-61), replays are safe in all three crash
windows, and per-batch state I/O is O(touched buckets). Pages with no
extractable structured data produce no update row — a page without
RDF is not a graph version.

Tombstones (vanished pages) are a CRAWL-level signal, not an
extraction-level one: derive them upstream (operators/crawl.py::
crawl_delta 'removed' class) and feed delete rows to the writer
directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_diff_store_spark.streaming.ingest import StreamingChangelogWriter


class StreamingWebIngest:
    """foreachBatch processor: feed (url, crawl_ts, html) page
    micro-batches via ``stream.writeStream.foreachBatch(wi.process_batch)``,
    read the always-current versioned changelog with `changelog()`."""

    def __init__(
        self,
        spark: SparkSession,
        table_dir: str,
        n_buckets: int = 16,
        include_microdata: bool = False,
    ) -> None:
        self.spark = spark
        self._writer = StreamingChangelogWriter(spark, table_dir, n_buckets)
        self._include_microdata = include_microdata

    def changelog(self) -> DataFrame:
        return self._writer.read_changelog()

    def _page_updates(self, pages: DataFrame) -> DataFrame:
        from rdf_diff_store_spark.functions.turtle import serialize_graph
        from rdf_diff_store_spark.operators.structured import (
            extract_jsonld,
            extract_microdata,
            extract_rdfa,
            skolemize,
        )
        from rdf_diff_store_spark.operators.vocab import (
            align_predicates,
            og_mapping,
        )

        tri = extract_jsonld(pages).unionByName(extract_rdfa(pages))
        if self._include_microdata:
            tri = tri.unionByName(extract_microdata(pages))
        tri = skolemize(align_predicates(tri, og_mapping(self.spark)))
        docs = serialize_graph(tri.withColumnRenamed("url", "graph_id"))
        ts_of = pages.select(
            F.col("url").alias("graph_id"), F.col("crawl_ts").alias("ts")
        ).groupBy("graph_id").agg(F.max("ts").alias("ts"))
        return docs.join(ts_of, "graph_id").select(
            "graph_id",
            "ts",
            F.lit("add").alias("op"),
            F.col("doc").alias("payload"),
            F.lit("text/turtle").alias("format"),
        )

    def process_batch(self, pages: DataFrame, batch_id: int) -> None:
        # localCheckpoint barrier: the extraction (two Arrow hops) is
        # materialized ONCE before the writer's read-state/anti-join/
        # commit sequence touches it twice (CLAUDE.md lazy-checkpoint
        # double-compute rule)
        updates = self._page_updates(pages).localCheckpoint()
        if not updates.isEmpty():
            self._writer.process_batch(updates, batch_id)
