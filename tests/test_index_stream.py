"""Streaming inverted-index maintenance (streaming/index_stream.py):
incremental merge must equal the one-shot build over the concatenated
batches, and a crash replay must merge nothing.
"""

from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.index import inverted_index
from rdf_diff_store_spark.streaming.index_stream import StreamingIndex


def _docs(spark, lo, hi):
    # small rotating vocab so terms span batches; doc ids are unique
    # across batches (append-only doc stream)
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("w"), (F.col("id") % 7)),
            F.concat(F.lit("w"), (F.col("id") % 3)),
            F.lit("common"),
        ).alias("text"),
    )


class TestStreamingIndex:
    def test_incremental_equals_one_shot(self, spark, tmp_path):
        ix = StreamingIndex(spark, str(tmp_path / "ix"), postings_cap=5)
        ix.process_batch(_docs(spark, 0, 40), 0)
        ix.process_batch(_docs(spark, 40, 70), 1)
        ix.process_batch(_docs(spark, 70, 100), 2)
        got = sorted(map(tuple, ix.index().collect()))
        want = sorted(
            map(
                tuple,
                inverted_index(_docs(spark, 0, 100), postings_cap=5).collect(),
            )
        )
        assert got == want

    def test_replayed_batch_merges_nothing(self, spark, tmp_path):
        ix = StreamingIndex(spark, str(tmp_path / "ix2"))
        ix.process_batch(_docs(spark, 0, 30), 0)
        before = sorted(map(tuple, ix.index().collect()))
        ix.process_batch(_docs(spark, 0, 30), 0)  # crash replay
        assert sorted(map(tuple, ix.index().collect())) == before

    def test_min_df_filter_and_empty_state(self, spark, tmp_path):
        ix = StreamingIndex(spark, str(tmp_path / "ix3"))
        assert ix.index().count() == 0  # before any batch
        ix.process_batch(_docs(spark, 0, 10), 0)
        full = {r["term"] for r in ix.index().collect()}
        common_only = {r["term"] for r in ix.index(min_df=10).collect()}
        assert "common" in full and common_only == {"common"}

    def test_postings_capped_and_sorted_across_batches(self, spark, tmp_path):
        # later batch carries SMALLER doc ids than the first: the
        # merged postings must still be the global smallest-k
        ix = StreamingIndex(spark, str(tmp_path / "ix4"), postings_cap=3)
        ix.process_batch(
            spark.createDataFrame(
                [(100, "z z"), (101, "z")], "doc_id long, text string"
            ),
            0,
        )
        ix.process_batch(
            spark.createDataFrame(
                [(5, "z"), (6, "z")], "doc_id long, text string"
            ),
            1,
        )
        row = ix.index().filter(F.col("term") == "z").first()
        assert row["postings"] == "5,6,100"
        assert row["df"] == 4 and row["cf"] == 5
