"""Native stream-stream point-in-interval join, state bounded by
watermarks.

Reference context: the reference's write channel publishes batches on
a 60 s trigger (/root/reference/src/bin/rdf-diff-writer.rs:109-123);
joining a LIVE event stream against a LIVE interval stream (crawl
sessions, retention windows, experiment exposure spans) is the
streaming face of ``operators/ranges.py::bucketed_range_join`` — and
unlike the batch rewrite it uses Spark's built-in stream-stream join,
whose state store holds both sides until the watermark passes them.

The state-boundedness contract is the whole design: Spark can only
garbage-collect the interval side if the join condition contains an
event-time RANGE between the two streams' event-time columns. A
data-dependent ``ts < end`` alone gives the planner no bound — state
grows forever — so the caller must supply ``max_interval_seconds``
(an upper bound on interval length, enforced business-side) and the
condition becomes

    ts >= start AND ts <= start + max_interval AND ts < end

The first two conjuncts let Spark evict interval state older than
``watermark + max_interval``; the third applies the exact
data-dependent bound. At 100 TB/day the state store then holds
O(arrival rate × (watermark + max_interval)) rows per side —
a sizing knob, not a leak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    max_interval_seconds: int,
    watermark_seconds: int = 3600,
) -> DataFrame:
    """Inner-join two STREAMING frames on ``key`` equality and
    ``start <= ts < end`` (end exclusive), with both sides
    watermarked on their event-time columns. ``ts_col`` /
    ``start_col`` / ``end_col`` must be TIMESTAMP columns; interval
    rows longer than ``max_interval_seconds`` are dropped loudly at
    the source filter (they would silently violate the state bound
    otherwise). Output: events columns + intervals columns minus the
    duplicated key."""
    clash = (set(events.columns) & set(intervals.columns)) - {key}
    if clash:
        raise ValueError(
            f"events/intervals share non-key columns {clash}: rename one side"
        )
    wm = f"{watermark_seconds} seconds"
    ev = events.withWatermark(ts_col, wm).alias("e")
    iv = (
        intervals.filter(
            F.col(end_col)
            <= F.col(start_col) + F.expr(f"INTERVAL {max_interval_seconds} SECONDS")
        )
        .withWatermark(start_col, wm)
        .alias("i")
    )
    cond = (
        (F.col(f"e.{key}") == F.col(f"i.{key}"))
        & (F.col(f"e.{ts_col}") >= F.col(f"i.{start_col}"))
        & (
            F.col(f"e.{ts_col}")
            <= F.col(f"i.{start_col}")
            + F.expr(f"INTERVAL {max_interval_seconds} SECONDS")
        )
        & (F.col(f"e.{ts_col}") < F.col(f"i.{end_col}"))
    )
    out_cols = [f"e.{c}" for c in events.columns] + [
        f"i.{c}" for c in intervals.columns if c != key
    ]
    return ev.join(iv, cond).select(*out_cols)
