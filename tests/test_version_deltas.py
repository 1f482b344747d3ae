"""version_deltas (operators/versioned.py): whole-history triple
deltas — multi-triple payloads, tombstone transitions, replays."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.versioned import version_deltas

T = ["2024-01-0%d 00:00:00" % i for i in range(1, 6)]


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # g:a — grow 2 triples, drop 1 + add 1, tombstone, re-add
        ("g:a", T[0], "add", '<s> <p> "1" .\n<s> <p> "2" .\n'),
        ("g:a", T[1], "add", '<s> <p> "2" .\n<s> <p> "3" .\n'),
        ("g:a", T[2], "delete", None),
        ("g:a", T[3], "add", '<s> <p> "3" .\n'),
        # g:b — identical replay (0/0 transition)
        ("g:b", T[0], "add", '<t> <q> "x" .\n'),
        ("g:b", T[1], "add", '<t> <q> "x" .\n'),
    ]
    df = spark.createDataFrame(
        rows, "graph_id string, ts string, op string, payload string"
    ).select("graph_id", F.col("ts").cast("timestamp").alias("ts"), "op", "payload")
    return df.withColumn(
        "content_hash",
        F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(
            F.sha2("payload", 256)
        ),
    ).localCheckpoint()


def test_version_deltas_full_history(log):
    out = {
        (r.graph_id, r.vn): (r.n_added, r.n_removed)
        for r in version_deltas(log).collect()
    }
    assert out[("g:a", 1)] == (2, 0)  # initial two triples
    assert out[("g:a", 2)] == (1, 1)  # "3" added, "1" removed
    assert out[("g:a", 3)] == (0, 2)  # tombstone removes both
    assert out[("g:a", 4)] == (1, 0)  # re-add after delete
    assert out[("g:b", 1)] == (1, 0)
    assert out[("g:b", 2)] == (0, 0)  # identical replay moves nothing
    assert len(out) == 6  # no phantom vn beyond the last version


class TestExpireVersions:
    def test_snapshots_after_cutoff_unchanged(self, spark, log):
        from rdf_diff_store_spark.operators.versioned import (
            expire_versions,
            snapshot_at,
        )

        cutoff = T[2]  # g:a is tombstoned exactly at the cutoff row
        expired = expire_versions(log, cutoff).localCheckpoint()
        for t in (T[2], T[3], T[4]):
            a = {(r.graph_id, r.content_hash) for r in snapshot_at(log, t).collect()}
            b = {(r.graph_id, r.content_hash) for r in snapshot_at(expired, t).collect()}
            assert a == b, t
        # history strictly before the cutoff is gone except boundaries
        assert expired.filter("ts < timestamp'%s'" % cutoff).count() == 2  # g:a v2, g:b v2... boundary adds only

    def test_boundary_tombstone_graph_absent(self, spark):
        from pyspark.sql import functions as F

        from rdf_diff_store_spark.operators.versioned import (
            expire_versions,
            snapshot_at,
        )

        rows = [
            ("g:x", T[0], "add", '<s> <p> "1" .\n'),
            ("g:x", T[1], "delete", None),
        ]
        df = spark.createDataFrame(
            rows, "graph_id string, ts string, op string, payload string"
        ).select("graph_id", F.col("ts").cast("timestamp").alias("ts"), "op", "payload")
        df = df.withColumn(
            "content_hash",
            F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(
                F.sha2("payload", 256)
            ),
        )
        expired = expire_versions(df, T[3])
        assert expired.count() == 0  # fully-deleted pre-cutoff graph vanishes
        assert snapshot_at(expired, T[4]).count() == 0
