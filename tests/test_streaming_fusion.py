"""Streaming fact-support maintenance (streaming/fusion_stream.py):
incremental state must equal the one-shot fact_support over the
concatenated batches; replays are mathematical no-ops (anti-join
idempotence, no high-water mark)."""

from __future__ import annotations

from rdf_diff_store_spark.operators.fusion import fact_support
from rdf_diff_store_spark.streaming.fusion_stream import StreamingFactSupport

B1 = [
    ("A", "e1", "p", "x"),
    ("B", "e1", "p", "x"),
]
B2 = [
    ("A", "e1", "p", "x"),  # A re-asserts on a later crawl: no-op
    ("C", "e1", "p", "y"),
    ("A", "e2", "p", "z"),
]
B3 = [("B", "e2", "p", "z")]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "source string, subj string, pred string, obj string"
    )


def _setof(df):
    return {tuple(r) for r in df.collect()}


def test_incremental_equals_oneshot(spark, tmp_path):
    fs = StreamingFactSupport(spark, str(tmp_path))
    for i, b in enumerate([B1, B2, B3]):
        fs.process_batch(_df(spark, b), i)
    oneshot = fact_support(_df(spark, B1 + B2 + B3)).drop("n_claims")
    assert _setof(fs.support()) == _setof(oneshot)
    # the re-asserting source did not inflate n_sources
    by_fact = {(r["subj"], r["obj"]): r["n_sources"] for r in fs.support().collect()}
    assert by_fact[("e1", "x")] == 2 and by_fact[("e2", "z")] == 2


def test_replay_appends_nothing(spark, tmp_path):
    fs = StreamingFactSupport(spark, str(tmp_path))
    fs.process_batch(_df(spark, B1), 0)
    fs.process_batch(_df(spark, B2), 1)
    before = _setof(fs.claims())
    fs.process_batch(_df(spark, B2), 1)  # full replay
    fs.process_batch(_df(spark, B1), 7)  # stale content, new id: still no-op
    assert _setof(fs.claims()) == before
    assert fs.claims().count() == len(before)  # duplicate-free, not just set-equal


def test_uninitialized_support_is_empty(spark, tmp_path):
    fs = StreamingFactSupport(spark, str(tmp_path))
    assert fs.support().count() == 0


def test_partial_append_self_heals(spark, tmp_path):
    # simulate a crash that persisted only PART of batch 2's novel
    # pairs: replaying the batch must append exactly the missing rest
    fs = StreamingFactSupport(spark, str(tmp_path))
    fs.process_batch(_df(spark, B1), 0)
    fs.process_batch(_df(spark, [B2[1]]), 1)  # half of batch 2 survived
    fs.process_batch(_df(spark, B2), 1)  # full replay
    expected = fact_support(_df(spark, B1 + B2)).drop("n_claims")
    assert _setof(fs.support()) == _setof(expected)
