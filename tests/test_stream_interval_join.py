"""Native stream-stream interval join
(streaming/interval_join.py::stream_interval_join): REAL Structured
Streaming file sources → stream-stream join → memory sink, compared
against the equivalent static join, plus the state-bound contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)

from rdf_diff_store_spark.streaming.interval_join import stream_interval_join

EV_SCHEMA = StructType(
    [
        StructField("eid", IntegerType()),
        StructField("k", IntegerType()),
        StructField("ts", TimestampType()),
    ]
)
IV_SCHEMA = StructType(
    [
        StructField("vid", IntegerType()),
        StructField("k", IntegerType()),
        StructField("s", TimestampType()),
        StructField("e", TimestampType()),
    ]
)


def _t(minute: int):
    from datetime import datetime

    return datetime(2024, 1, 1, 10, minute, 0)


def _write_sources(spark, tmp_path):
    ev_rows = [
        (1, 1, _t(5)),
        (2, 1, _t(20)),
        (3, 1, _t(31)),  # outside the 1..31-exclusive interval end
        (4, 2, _t(7)),
        (5, 3, _t(9)),  # key with no interval
    ]
    iv_rows = [
        (100, 1, _t(1), _t(31)),
        (101, 2, _t(6), _t(8)),
        # malformed/overlong interval (3h > max 2h): must be dropped
        (102, 3, _t(0), _t(0).replace(hour=13)),
    ]
    ev_dir, iv_dir = str(tmp_path / "ev"), str(tmp_path / "iv")
    spark.createDataFrame(ev_rows, EV_SCHEMA).write.parquet(ev_dir)
    spark.createDataFrame(iv_rows, IV_SCHEMA).write.parquet(iv_dir)
    return ev_dir, iv_dir


class TestStreamIntervalJoin:
    def test_matches_static_join_and_bounds_state(self, spark, tmp_path):
        ev_dir, iv_dir = _write_sources(spark, tmp_path)
        ev_s = spark.readStream.schema(EV_SCHEMA).parquet(ev_dir)
        iv_s = spark.readStream.schema(IV_SCHEMA).parquet(iv_dir)
        joined = stream_interval_join(
            ev_s, iv_s, key="k", ts_col="ts", start_col="s", end_col="e",
            max_interval_seconds=7200, watermark_seconds=600,
        )
        q = (
            joined.writeStream.format("memory")
            .queryName("ivj_out")
            .outputMode("append")
            .option(
                "checkpointLocation", str(tmp_path / "ck")
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted(
            (r.eid, r.vid) for r in spark.sql("SELECT * FROM ivj_out").collect()
        )
        # static truth with the same predicate (overlong interval 102
        # excluded by the state-bound filter, ts<end exclusive)
        assert got == [(1, 100), (2, 100), (4, 101)]

    def test_streaming_plan_is_stateful_join(self, spark, tmp_path):
        ev_dir, iv_dir = _write_sources(spark, tmp_path)
        ev_s = spark.readStream.schema(EV_SCHEMA).parquet(ev_dir)
        iv_s = spark.readStream.schema(IV_SCHEMA).parquet(iv_dir)
        joined = stream_interval_join(
            ev_s, iv_s, key="k", ts_col="ts", start_col="s", end_col="e",
            max_interval_seconds=7200,
        )
        assert joined.isStreaming
        # both event-time columns watermarked -> state is evictable
        plan = joined._jdf.queryExecution().analyzed().toString()
        assert plan.count("EventTimeWatermark") == 2

    def test_column_clash_rejected(self, spark, tmp_path):
        ev_dir, iv_dir = _write_sources(spark, tmp_path)
        ev_s = spark.readStream.schema(EV_SCHEMA).parquet(ev_dir)
        iv_s = (
            spark.readStream.schema(IV_SCHEMA)
            .parquet(iv_dir)
            .withColumnRenamed("vid", "eid")
        )
        with pytest.raises(ValueError, match="share non-key columns"):
            stream_interval_join(
                ev_s, iv_s, key="k", ts_col="ts", start_col="s", end_col="e",
                max_interval_seconds=7200,
            )


class TestStreamingHeavyHitters:
    def _toks(self, spark, lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("t"), (F.col("id") % 23)).alias("tok")
        )

    def test_incremental_equals_one_shot(self, spark, tmp_path):
        from rdf_diff_store_spark.operators.sketch import countmin_counters
        from rdf_diff_store_spark.streaming.sketch_stream import (
            StreamingHeavyHitters,
        )

        hh = StreamingHeavyHitters(spark, str(tmp_path / "hh"))
        hh.process_batch(self._toks(spark, 0, 300), 0)
        hh.process_batch(self._toks(spark, 300, 500), 1)
        got = sorted(map(tuple, hh.counters().collect()))
        want = sorted(
            map(tuple, countmin_counters(self._toks(spark, 0, 500)).collect())
        )
        assert got == want

    def test_replayed_batch_merges_nothing(self, spark, tmp_path):
        from rdf_diff_store_spark.streaming.sketch_stream import (
            StreamingHeavyHitters,
        )

        hh = StreamingHeavyHitters(spark, str(tmp_path / "hh2"))
        hh.process_batch(self._toks(spark, 0, 200), 0)
        before = sorted(map(tuple, hh.counters().collect()))
        hh.process_batch(self._toks(spark, 0, 200), 0)  # crash replay
        assert sorted(map(tuple, hh.counters().collect())) == before

    def test_estimates_one_sided(self, spark, tmp_path):
        from rdf_diff_store_spark.streaming.sketch_stream import (
            StreamingHeavyHitters,
        )

        hh = StreamingHeavyHitters(spark, str(tmp_path / "hh3"))
        hh.process_batch(self._toks(spark, 0, 460), 0)  # 20 x t0..t22ish
        est = {
            r.tok: r.est_count
            for r in hh.estimate(
                self._toks(spark, 0, 460).distinct()
            ).collect()
        }
        exact = {
            r.tok: r["count"]
            for r in self._toks(spark, 0, 460).groupBy("tok").count().collect()
        }
        assert set(est) == set(exact)
        assert all(est[t] >= exact[t] for t in exact)


class TestStreamingDistinct:
    def _vals(self, spark, lo, hi):
        return spark.range(lo, hi).select(
            F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("g"),
            F.col("id").cast("string").alias("v"),
        )

    def test_incremental_equals_one_shot(self, spark, tmp_path):
        from rdf_diff_store_spark.operators.sketch import hll_registers
        from rdf_diff_store_spark.streaming.sketch_stream import StreamingDistinct

        sd = StreamingDistinct(spark, str(tmp_path / "sd"), group_cols=["g"])
        sd.process_batch(self._vals(spark, 0, 3000), 0)
        sd.process_batch(self._vals(spark, 3000, 5000), 1)
        got = sorted(map(tuple, sd.registers().collect()))
        want = sorted(
            map(tuple, hll_registers(self._vals(spark, 0, 5000), ["g"], "v").collect())
        )
        assert got == want

    def test_replay_is_noop_without_any_mark(self, spark, tmp_path):
        # max-merge is idempotent: replaying the SAME batch twice
        # leaves state bit-identical with NO high-water-mark machinery
        from rdf_diff_store_spark.streaming.sketch_stream import StreamingDistinct

        sd = StreamingDistinct(spark, str(tmp_path / "sd2"), group_cols=["g"])
        sd.process_batch(self._vals(spark, 0, 1000), 0)
        before = sorted(map(tuple, sd.registers().collect()))
        sd.process_batch(self._vals(spark, 0, 1000), 0)  # crash replay
        assert sorted(map(tuple, sd.registers().collect())) == before

    def test_estimate_tracks_growth(self, spark, tmp_path):
        from rdf_diff_store_spark.streaming.sketch_stream import StreamingDistinct

        sd = StreamingDistinct(spark, str(tmp_path / "sd3"), group_cols=["g"])
        sd.process_batch(self._vals(spark, 0, 2000), 0)
        first = {r.g: r.est_distinct for r in sd.estimate().collect()}
        sd.process_batch(self._vals(spark, 2000, 8000), 1)
        second = {r.g: r.est_distinct for r in sd.estimate().collect()}
        # 1000 -> 4000 true distinct per group; 6.5% sigma sketch
        for g in ("even", "odd"):
            assert abs(first[g] - 1000) / 1000 < 0.26
            assert abs(second[g] - 4000) / 4000 < 0.26
            assert second[g] > first[g]
