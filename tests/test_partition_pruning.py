"""days(ts) partition-layout pruning: the distributed analog of the
reference's binary search over commit times (src/git.rs:154-160)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.versioned import (
    _as_of_filter,
    snapshot_at,
    with_day_partition,
)
from rdf_diff_store_spark.sources.relational import changelog_from_events


def test_day_partitioned_changelog_prunes_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "changelog_by_day")
    with_day_partition(changelog_from_events(spark, sf_dir)).write.partitionBy(
        "day"
    ).parquet(path)
    part = spark.read.parquet(path)
    full = part.select(F.input_file_name().alias("f")).distinct().count()
    read = (
        _as_of_filter(part, F.lit("2024-01-05 00:00:00").cast("timestamp"))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert 0 < read < full / 2, (read, full)
    # correctness is unchanged by the layout: same snapshot either way
    flat = changelog_from_events(spark, sf_dir)
    a = sorted(r.graph_id for r in snapshot_at(part, "2024-01-05 00:00:00").collect())
    b = sorted(r.graph_id for r in snapshot_at(flat, "2024-01-05 00:00:00").collect())
    assert a == b
