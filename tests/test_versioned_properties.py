"""Property-based invariants of the versioned-store operators over
randomized changelogs (hypothesis) — the robustness net the reference
lacks entirely (SURVEY.md §5: two integration tests, no properties).

Strategy: random (graph_id, day, op) changelogs with a tiny id/day
space so collisions (same-graph rewrites, delete/re-add, out-of-order)
are dense. Invariants:

  I1 diff(t, t) is empty for any t
  I2 snapshot(t) == apply(diff(t0, t)) over snapshot(t0) cardinality-wise
  I3 diff is antisymmetric: added(t1→t2) == removed(t2→t1)
  I4 compact_changelog never changes any snapshot
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.versioned import (
    compact_changelog,
    diff,
    snapshot_at,
)
from rdf_diff_store_spark.schemas import CHANGELOG

_entry = st.tuples(
    st.sampled_from(["g1", "g2", "g3"]),
    st.integers(min_value=1, max_value=9),  # day
    st.sampled_from(["add", "add", "add", "delete"]),
    st.integers(min_value=0, max_value=3),  # payload variant
)
_changelogs = st.lists(_entry, min_size=1, max_size=12, unique_by=lambda e: (e[0], e[1]))

T_MID = "2024-01-05 00:00:00"
T_END = "2024-01-10 00:00:00"


def _df(spark, entries):
    rows = []
    for gid, day, op, variant in entries:
        payload = None if op == "delete" else f"<http://e/{gid}> <http://e/p> \"v{variant}\" ."
        h = None if op == "delete" else f"h{gid}v{variant}"
        rows.append((gid, dt.datetime(2024, 1, day), op, payload, h))
    return spark.createDataFrame(rows, CHANGELOG)


@pytest.fixture(scope="module")
def sparksession(spark):
    return spark


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(entries=_changelogs)
def test_versioned_invariants(sparksession, entries):
    spark = sparksession
    log = _df(spark, entries)

    # I1: self-diff empty (graph-level)
    assert diff(log, T_MID, T_MID, on_triples=False).count() == 0

    # I3: antisymmetry
    fwd = diff(log, T_MID, T_END, on_triples=False)
    bwd = diff(log, T_END, T_MID, on_triples=False)
    fwd_added = sorted(
        (r.graph_id, r.content_hash) for r in fwd.filter(F.col("change") == "added").collect()
    )
    bwd_removed = sorted(
        (r.graph_id, r.content_hash) for r in bwd.filter(F.col("change") == "removed").collect()
    )
    assert fwd_added == bwd_removed

    # I2: snapshot(t_end) = snapshot(t_mid) + added − removed (by graph state)
    s_mid = {(r.graph_id, r.content_hash) for r in snapshot_at(log, T_MID).collect()}
    s_end = {(r.graph_id, r.content_hash) for r in snapshot_at(log, T_END).collect()}
    added = {(r.graph_id, r.content_hash) for r in fwd.filter(F.col("change") == "added").collect()}
    removed = {
        (r.graph_id, r.content_hash) for r in fwd.filter(F.col("change") == "removed").collect()
    }
    assert (s_mid - removed) | added == s_end

    # I4: compaction preserves snapshots
    compacted = compact_changelog(log)
    for t in (T_MID, T_END):
        a = {(r.graph_id, r.content_hash) for r in snapshot_at(log, t).collect()}
        b = {(r.graph_id, r.content_hash) for r in snapshot_at(compacted, t).collect()}
        assert a == b
