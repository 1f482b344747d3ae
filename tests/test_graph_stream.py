"""StreamingLinkGraph (streaming/graph_stream.py): incremental edge
state must equal the one-shot union of all batches, replays must be
no-ops without any mark, and live state must feed the batch graph
operators unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_diff_store_spark.streaming.graph_stream import StreamingLinkGraph


def _batch(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_incremental_equals_one_shot(spark, tmp_path):
    g = StreamingLinkGraph(spark, str(tmp_path))
    b1 = [("a", "b"), ("b", "c")]
    b2 = [("b", "c"), ("c", "a")]  # overlaps b1
    b3 = [("c", "d"), ("c", "d")]  # in-batch duplicate
    for i, b in enumerate([b1, b2, b3]):
        g.process_batch(_batch(spark, b), i)
    got = sorted((r.src, r.dst) for r in g.edges().collect())
    assert got == sorted(set(b1) | set(b2) | set(b3))
    degs = {r.node: (r.out_degree, r.in_degree) for r in g.degrees().collect()}
    assert degs == {"a": (1, 1), "b": (1, 1), "c": (2, 1), "d": (0, 1)}


def test_replay_is_noop(spark, tmp_path):
    g = StreamingLinkGraph(spark, str(tmp_path))
    g.process_batch(_batch(spark, [("a", "b"), ("b", "c")]), 0)
    before = g.edges().count()
    # full replay of the same batch (same or different batch_id)
    g.process_batch(_batch(spark, [("a", "b"), ("b", "c")]), 0)
    g.process_batch(_batch(spark, [("a", "b")]), 7)  # partial replay
    assert g.edges().count() == before
    # state is duplicate-free
    assert g.edges().distinct().count() == before


def test_null_endpoints_dropped_and_operators_compose(spark, tmp_path):
    from rdf_diff_store_spark.operators.graph import pagerank, scc

    g = StreamingLinkGraph(spark, str(tmp_path))
    g.process_batch(
        _batch(spark, [("a", "b"), ("b", "a"), (None, "x"), ("y", None)]), 0
    )
    assert g.edges().count() == 2
    comp = {r.id: r.scc_id for r in scc(g.edges()).collect()}
    assert comp == {"a": "a", "b": "a"}
    ranks = pagerank(g.edges(), iterations=2)
    assert ranks.filter(F.col("rank_micro") > 0).count() == 2


def test_append_only_state_read_discipline(spark, tmp_path):
    """Missing dir = empty; a CORRUPT state read must RAISE, never
    silently return empty (the entail_stream drift the shared class
    closed: silent-empty makes replays append duplicates)."""
    import pytest as _pytest

    from rdf_diff_store_spark.streaming.state import AppendOnlyState

    st = AppendOnlyState(spark, str(tmp_path), "s", "a string, b string")
    assert st.read().count() == 0  # missing dir -> empty, no error

    st.append_if_new(spark.createDataFrame([("x", "y")], "a string, b string"), ["a", "b"])
    assert st.read().count() == 1

    # corrupt the directory: a non-parquet file where data should be
    import os as _os

    bad = _os.path.join(st.path, "zzz_corrupt.parquet")
    with open(bad, "w") as fh:
        fh.write("this is not parquet")
    with _pytest.raises(Exception):
        st.read().count()
