"""Bucketed changelog storage (sources/bucketed_store.py): the
graph_id-keyed version-store reads must be EXCHANGE-FREE on a table
bucketed by graph_id — the Spark analogue of the reference's
locality-by-layout (each graph's history in one git repo,
/root/reference/src/git.rs:60-162).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.versioned import snapshot_at
from rdf_diff_store_spark.sources.bucketed_store import (
    read_bucketed_changelog,
    write_bucketed_changelog,
)
from rdf_diff_store_spark.sources.relational import changelog_from_events

SF = "/root/testdata/sf0.001"
T1 = "2024-01-10 00:00:00"
T2 = "2024-01-20 00:00:00"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bstore") / "tbl")
    write_bucketed_changelog(
        changelog_from_events(spark, SF), "test_chg_bucketed", path, n_buckets=8
    )
    return read_bucketed_changelog(spark, "test_chg_bucketed")


class TestBucketedStore:
    def test_snapshot_plan_exchange_free(self, spark, bucketed):
        plan = _executed(snapshot_at(bucketed, T1))
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan

    def test_snapshot_values_equal_unbucketed(self, spark, bucketed):
        cols = ["graph_id", "content_hash"]
        a = sorted(map(tuple, snapshot_at(bucketed, T1).select(*cols).collect()))
        b = sorted(
            map(
                tuple,
                snapshot_at(changelog_from_events(spark, SF), T1)
                .select(*cols)
                .collect(),
            )
        )
        assert a == b and len(a) > 0

    def test_asof_diff_self_join_exchange_free(self, spark, bucketed):
        # the diff of two as-of states: with broadcast off (the shape
        # a 100-TB side forces), the whole plan must have no Exchange
        # — both aggregations AND the join ride the bucket layout.
        # save/RESTORE (never unset): session.py pins a builder-level
        # 64 MiB threshold that unset() would silently drop back to
        # Spark's 10 MB ConfigEntry default for every later test in
        # the session-scoped fixture
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            s1 = snapshot_at(bucketed, T1).select("graph_id", "content_hash")
            s2 = snapshot_at(bucketed, T2).select(
                "graph_id", F.col("content_hash").alias("h2")
            )
            j = s1.join(s2, "graph_id")
            assert "Exchange" not in _executed(j)
            assert j.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_reread_after_catalog_loss(self, spark, bucketed, tmp_path):
        # a fresh catalog (new session) re-registers by re-writing to
        # the same path — must not fail on the non-empty location
        path = str(tmp_path / "tbl2")
        write_bucketed_changelog(
            changelog_from_events(spark, SF), "test_chg_b2", path, n_buckets=4
        )
        write_bucketed_changelog(
            changelog_from_events(spark, SF), "test_chg_b2", path, n_buckets=4
        )
        assert read_bucketed_changelog(spark, "test_chg_b2").count() > 0
