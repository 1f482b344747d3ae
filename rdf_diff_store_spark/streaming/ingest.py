"""Structured-Streaming ingest: the reference's writer loop as a
stream job.

Reference contract being translated (SURVEY.md §2A O-04 + streaming
notes): graph updates arrive as an unbounded stream, are stamped at
arrival (`Signature::now`, src/git.rs:208), and are *published* in
60-second batches by a background task decoupled from individual
commits (src/bin/rdf-diff-writer.rs:109-123). In Spark:

* `readStream` over the updates source (file/kafka in production;
  parquet-dir or `add_batch` memory feed in tests);
* event-time = `ts` with a watermark for replayed crawl data, where
  capture order != arrival order (the reference never faces late
  data; a crawl replay does);
* `foreachBatch` appends canonicalized changelog rows with the same
  content-hash idempotence as the batch writer (shared code path:
  operators.versioned.append_updates) — so streaming and batch ingest
  can never diverge semantically;
* `Trigger.ProcessingTime('60 seconds')` reproduces the publish
  cadence (tests use availableNow/processAllAvailable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from rdf_diff_store_spark.schemas import CHANGELOG, GRAPH_UPDATES


class StreamingChangelogWriter:
    """Accumulates an exactly-once changelog parquet table from a
    stream of graph updates via foreachBatch + idempotent append.

    At cluster scale the sink would be an Iceberg/Delta table commit
    per micro-batch (transactional); here the changelog directory is
    overwritten per batch from the folded DataFrame, which is the
    same exactly-once contract in miniature (re-running a failed
    batch re-derives the same rows — content-hash dedup makes the
    append idempotent, so replays are harmless).
    """

    def __init__(self, spark: SparkSession, table_dir: str):
        self.spark = spark
        self.table_dir = table_dir

    def read_changelog(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.table_dir)
        except Exception:  # first batch: empty table  # noqa: BLE001
            return self.spark.createDataFrame([], CHANGELOG)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from rdf_diff_store_spark.operators.versioned import append_updates

        current = self.read_changelog()
        folded = append_updates(current, batch_df)
        # stage-and-swap to keep the read/write paths disjoint
        tmp = f"{self.table_dir}__staging"
        folded.write.mode("overwrite").parquet(tmp)
        self.spark.read.parquet(tmp).write.mode("overwrite").parquet(self.table_dir)

    def start(
        self,
        updates_stream: DataFrame,
        checkpoint_dir: str,
        trigger_seconds: int = 60,
        watermark: str = "1 day",
    ) -> StreamingQuery:
        """Run the ingest loop. `updates_stream` must match
        GRAPH_UPDATES (graph_id, ts, op, payload, format)."""
        stream = updates_stream.withWatermark("ts", watermark)
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start()
        )


def windowed_update_rates(updates_stream: DataFrame, window: str = "5 minutes") -> DataFrame:
    """Observability stream: update/delete counts per event-time
    window per op (the metrics-histogram analog, src/metrics/mod.rs).
    Watermarked so state is bounded under late replayed data."""
    return (
        updates_stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window), F.col("op"))
        .agg(
            F.count("*").alias("n_updates"),
            # exact distinct is unsupported in streaming aggs; HLL is
            # the scale-appropriate choice anyway
            F.approx_count_distinct("graph_id").alias("n_graphs"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "op",
            "n_updates",
            "n_graphs",
        )
    )


def dedup_updates_stream(updates_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming duplicate suppression: drop re-sent updates with the
    same (graph_id, content) inside the watermark window —
    `dropDuplicatesWithinWatermark` bounds the dedup state, which an
    unbounded crawl replay needs (the batch content-hash anti-join in
    append_updates gives the cross-batch guarantee; this removes
    intra-window resends before they ever hit the sink)."""
    keyed = updates_stream.withColumn(
        "_content_key",
        F.coalesce(F.sha2(F.col("payload"), 256), F.lit("__tombstone__")),
    )
    return (
        keyed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["graph_id", "_content_key"])
        .drop("_content_key")
    )


def read_updates_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of graph updates (parquet drop-dir — the
    sandbox stand-in for a Kafka topic of write requests)."""
    return spark.readStream.schema(GRAPH_UPDATES).parquet(source_dir)
