"""Streaming fact-support maintenance: keep the provenance rollup of
`operators/fusion.py::fact_support` current over an unbounded stream
of claim batches — the live-crawl shape of fusion, where every fetch
cycle lands new (source, subj, pred, obj) assertions and the fused
store (the reference's 60 s push cadence,
/root/reference/src/bin/rdf-diff-writer.rs:45-91) must see current
support counts without re-aggregating 10^11 historical claims.

State = the DISTINCT (source, subj, pred, obj) claim set, maintained
by anti-join append — the StreamingEntailment class of idempotence,
NOT the additive count-min class: distinct-source counts are not
additive across batches (the same source re-asserting a fact on every
crawl must not inflate n_sources), so the state must be the deduped
pair set itself, and the anti-join gives crash-replay safety WITHOUT
a high-water mark. Replaying a batch — whether the crash hit before
or after the append — derives against whatever state survived and
appends only what is still missing; partial appends self-heal.

``support()`` aggregates the state on read (one combinable shuffle
over the deduped pair set, which is orders of magnitude smaller than
the raw claim stream). n_claims — the raw occurrence count, additive
and therefore mark-needing — is deliberately NOT maintained here;
compose `streaming/sketch_stream.py::StreamingHeavyHitters` over the
fact key when approximate occurrence counts are wanted.

Scale note: the append-only parquet directory is the test shape;
production writes the pair state bucketed by fact-key hash
(sources/bucketed_store.py) so the per-batch anti-join and the read
aggregation co-locate without shuffling stored state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_diff_store_spark.streaming.state import AppendOnlyState

_SCHEMA = "source string, subj string, pred string, obj string"
_COLS = ["source", "subj", "pred", "obj"]


class StreamingFactSupport:
    """foreachBatch processor: feed (source, subj, pred, obj) claim
    micro-batches via ``stream.writeStream.foreachBatch(fs.process_batch)``,
    read current per-fact support with `support()`."""

    def __init__(self, spark: SparkSession, work_dir: str) -> None:
        self.spark = spark
        self._state = AppendOnlyState(spark, work_dir, "claim_state", _SCHEMA)

    def claims(self) -> DataFrame:
        """The deduped (source, subj, pred, obj) state. Only a
        MISSING state directory means "not initialized" — any other
        read failure (corrupt file, permissions) must propagate, or a
        transient fault would silently zero the support counts and
        make replays re-append whole batches."""
        return self._state.read()

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        self._state.append_if_new(batch, _COLS)

    def support(self) -> DataFrame:
        """(subj, pred, obj, n_sources) over the current state — equal
        by construction to `fact_support(all claims ever fed)` minus
        its n_claims column (occurrence counts are not maintained
        here; see module docstring)."""
        return self.claims().groupBy("subj", "pred", "obj").agg(
            F.countDistinct("source").alias("n_sources")
        )
