"""Streaming closure maintenance (streaming/entail_stream.py):
incremental state must equal the one-shot closure; replays are
mathematical no-ops (no high-water mark exists to protect them)."""

from __future__ import annotations

from rdf_diff_store_spark.operators.entailment import rdfs_entailment
from rdf_diff_store_spark.streaming.entail_stream import StreamingEntailment

SCHEMA_ROWS = [
    ("p", "rdfs:domain", "C"),
    ("C", "rdfs:subClassOf", "D"),
]

B1 = [("a", "p", "x")]
B2 = [("b", "p", "y"), ("a", "p", "x")]  # overlaps batch 1
B3 = [("c", "p", "z")]


def _df(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def _setof(df):
    return {tuple(r) for r in df.collect()}


def test_incremental_equals_oneshot(spark, tmp_path):
    se = StreamingEntailment(spark, str(tmp_path))
    se.initialize(_df(spark, SCHEMA_ROWS))
    for i, b in enumerate([B1, B2, B3]):
        se.process_batch(_df(spark, b), i)
    oneshot = rdfs_entailment(_df(spark, SCHEMA_ROWS + B1 + B2 + B3))
    assert _setof(se.closure()) == _setof(oneshot)
    # append-only state never holds duplicates
    assert se.closure().count() == se.closure().distinct().count()


def test_replayed_batch_appends_nothing(spark, tmp_path):
    se = StreamingEntailment(spark, str(tmp_path))
    se.initialize(_df(spark, SCHEMA_ROWS))
    se.process_batch(_df(spark, B1), 0)
    n = se.closure().count()
    se.process_batch(_df(spark, B1), 0)  # crash-replay, same batch id
    se.process_batch(_df(spark, B1), 1)  # same CONTENT, new id
    assert se.closure().count() == n


def test_uninitialized_closure_is_empty(spark, tmp_path):
    se = StreamingEntailment(spark, str(tmp_path / "fresh"))
    assert se.closure().count() == 0
