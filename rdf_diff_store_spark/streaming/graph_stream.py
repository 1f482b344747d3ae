"""Streaming link-graph maintenance: keep a web link graph — and the
graph analytics built on it — current over an unbounded stream of
crawl batches. Every fetch cycle lands (src, dst) hyperlink edges
(compose `functions/text.py::extract_links` + `url_host` upstream);
the maintained state is the DISTINCT edge set, so every operator in
`operators/graph.py` (pagerank, hits, scc, triangle_count,
hyperball, …) runs on live state without rescanning 10^12 historical
fetches.

State discipline = the StreamingFactSupport / StreamingEntailment
class: an append-only DISTINCT edge set maintained by anti-join
append. Edge sets are idempotent under re-observation (the same link
seen on every crawl must not duplicate), so no count merging exists
and the anti-join gives crash-replay safety WITHOUT a high-water
mark — replaying a batch (full, or a partially-surviving append)
derives against whatever state survived and appends only what is
still missing.

`degrees()` aggregates on read (one combinable shuffle over the
deduped edge set); `edges()` hands the state to any graph operator.
Production buckets the edge state by hash(src)
(sources/bucketed_store.py) so the per-batch anti-join and the read
aggregations co-locate without shuffling stored state; the
append-only parquet directory here is the test shape.

Reference context: the reference has no streaming and no graph
analytics at all — this is the live-crawl composition of the
SURVEY §2 extensions (web_link_graph × the graph operator family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_diff_store_spark.streaming.state import AppendOnlyState

_SCHEMA = "src string, dst string"
_COLS = ["src", "dst"]


class StreamingLinkGraph:
    """foreachBatch processor: feed (src, dst) edge micro-batches via
    ``stream.writeStream.foreachBatch(g.process_batch)``; read the
    live edge set with `edges()`, degree rollups with `degrees()`."""

    def __init__(self, spark: SparkSession, work_dir: str) -> None:
        self.spark = spark
        self._state = AppendOnlyState(spark, work_dir, "edge_state", _SCHEMA)

    def edges(self) -> DataFrame:
        """The deduped (src, dst) state (AppendOnlyState read
        semantics: only a missing directory means empty)."""
        return self._state.read()

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        self._state.append_if_new(
            batch.filter(F.col("src").isNotNull() & F.col("dst").isNotNull()),
            _COLS,
        )

    def degrees(self) -> DataFrame:
        """(node, out_degree, in_degree) over the live edge set —
        equal by construction to degree counts over the union of all
        batches ever fed."""
        out_d = self.edges().groupBy(F.col("src").alias("node")).agg(
            F.count("*").alias("out_degree")
        )
        in_d = self.edges().groupBy(F.col("dst").alias("node")).agg(
            F.count("*").alias("in_degree")
        )
        return (
            out_d.join(in_d, "node", "full_outer")
            .select(
                "node",
                F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
                F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            )
        )
