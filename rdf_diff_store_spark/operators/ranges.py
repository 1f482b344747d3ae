"""Bucketed range join — point-in-interval joins without a cartesian
plan.

The reference answers "which graph version was live at time T?" with a
binary search over version timestamps per request
(/root/reference/src/git.rs:131-162, checkout-by-timestamp); the
relational generalization — EVERY event joined to EVERY interval that
covers it — is a range join, and Spark's only native plan for a pure
inequality predicate is BroadcastNestedLoopJoin / CartesianProduct:
O(|events|·|intervals|) work that dies long before 100 TB.

``bucketed_range_join`` rewrites the range predicate as an EQUI-join:
intervals are exploded to every fixed-width time bucket they overlap
(a map-side constant ≤ ceil(max_len/width)+1 copies), events carry
their single bucket, the join runs hash/sort-merge on
(key, bucket) — shuffled, AQE-skew-splittable, partition-prunable —
and the exact ``start <= ts < end`` predicate re-filters the bucket
candidates. Each event lands in exactly one bucket, so a (event,
interval) pair can match at most one exploded copy: no dedup pass is
needed. This is the standard interval-bucketing technique (e.g.
Databricks' range-join bin hints); pick ``bucket_width`` near the
typical interval length so the explode factor stays ~2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Join ``events`` (one long ``ts_col`` per row) to ``intervals``
    (long ``start_col`` inclusive, ``end_col`` exclusive) on
    ``key`` equality AND start <= ts < end, as an equi-join on
    (key, time-bucket). All three time columns must share one unit
    (e.g. epoch micros). Returns events columns + intervals columns
    (minus the duplicated key). Malformed intervals with
    ``end <= start`` match nothing (same as the inequality predicate)
    instead of exploding a descending bucket sequence."""
    clash = (set(events.columns) & set(intervals.columns)) - {key}
    if clash:
        raise ValueError(
            f"events/intervals share non-key columns {clash}: rename one "
            "side or the output would carry ambiguous duplicates"
        )
    for df, side in ((events, "events"), (intervals, "intervals")):
        if "_bucket" in df.columns:
            raise ValueError(f"{side} already has a _bucket column")

    def b(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    ev = events.withColumn("_bucket", b(F.col(ts_col)))
    # end is exclusive: an interval touching only the boundary of the
    # next bucket must not be exploded into it, hence end-1. The
    # end > start filter keeps F.sequence ascending — a corrupt row
    # with end << start would otherwise generate a gap-sized DESCENDING
    # array (up to the 2^31 array limit) where the plain inequality
    # join would simply match nothing.
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_bucket",
        F.explode(F.sequence(b(F.col(start_col)), b(F.col(end_col) - 1))),
    )
    out_cols = [f"e.{c}" for c in events.columns] + [
        f"i.{c}" for c in intervals.columns if c != key
    ]
    return (
        ev.alias("e")
        .join(
            iv.alias("i"),
            (F.col(f"e.{key}") == F.col(f"i.{key}"))
            & (F.col("e._bucket") == F.col("i._bucket"))
            & (F.col(f"e.{ts_col}") >= F.col(f"i.{start_col}"))
            & (F.col(f"e.{ts_col}") < F.col(f"i.{end_col}")),
        )
        .select(*out_cols)
    )


def asof_join(
    events: DataFrame,
    quotes: DataFrame,
    key: str,
    ts_col: str,
    quote_ts_col: str | None = None,
    direction: str = "backward",
    matched_ts_alias: str | None = None,
) -> DataFrame:
    """As-of join: each event row picks the single quote row with the
    LATEST quote-ts <= event-ts (``backward``, inclusive) or the
    EARLIEST quote-ts >= event-ts (``forward``) for the same ``key`` —
    the temporal-join primitive the reference's checkout-by-timestamp
    performs one graph at a time (/root/reference/src/git.rs:131-162),
    generalized to full-table volume. Left-outer semantics: events
    with no eligible quote keep NULL quote columns.

    NOT a join at all in the physical plan: events and quotes are
    UNIONed with a side tag, ONE window (partitionBy key, orderBy ts,
    side) carries the last quote row forward as a single struct, and
    the quote side is filtered back out. One shuffle total — the
    naive formulations either shuffle every candidate (event, quote)
    pair through a join + max-per-event aggregation, or plan a
    BroadcastNestedLoopJoin on the inequality; both die at 100 TB.
    Hot keys are AQE-skew-splittable only at the shuffle, not the
    window — for a pathological single-key table, pre-bucket the key
    by coarse time range first (SCALE.md).

    Quote rows ride the window as one struct, so quotes with NULL
    payload fields are matched faithfully (ignorenulls skips only the
    event rows, never a real quote). Ties among quotes at identical
    (key, ts) are broken arbitrarily — pre-aggregate quotes to one
    row per (key, ts) when that matters. ``matched_ts_alias`` exposes
    the matched quote timestamp as an output column.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    qts = quote_ts_col or ts_col
    payload = [c for c in quotes.columns if c not in (key, qts)]
    clash = set(payload) & set(events.columns)
    if clash:
        raise ValueError(f"quote payload columns collide with events: {clash}")

    ev_only = [c for c in events.columns if c != key]
    q_struct = F.struct(
        *[F.col(c) for c in payload], F.col(qts).alias("__matched_ts")
    )
    ev_side = events.select(
        F.col(key),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in ev_only],
        F.lit(None).cast(
            quotes.select(q_struct.alias("q")).schema["q"].dataType
        ).alias("_q"),
    )
    # SQL comparison with NULL is never true, so a NULL-timestamp
    # quote can match nothing — drop it here; under asc NULLS FIRST it
    # would otherwise sort before every event and become the running
    # "latest" match (DuckDB ASOF JOIN excludes it too).
    q_side = quotes.filter(F.col(qts).isNotNull()).select(
        F.col(key),
        F.col(qts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(events.schema[c].dataType).alias(c)
            for c in ev_only
        ],
        q_struct.alias("_q"),
    )
    # backward: ascending ts, quote (side 0) before event at equal ts
    # -> the running last-quote INCLUDES an equal-ts quote. forward:
    # descending ts, same tag order -> running last is the earliest
    # quote at-or-after.
    order = (
        [F.col("_ts").asc(), F.col("_side").asc()]
        if direction == "backward"
        else [F.col("_ts").desc(), F.col("_side").asc()]
    )
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # events with NULL ts never match either (comparison with NULL is
    # never true): under backward's asc NULLS FIRST ordering they sort
    # before every quote and get NULL naturally, but forward's desc
    # puts NULLS LAST where the running value is populated — the guard
    # makes both directions return NULL payloads.
    matched = F.when(
        F.col("_ts").isNotNull(), F.last("_q", ignorenulls=True).over(w)
    )
    out = [F.col(key)] + [F.col(c) for c in ev_only]
    out += [matched.getField(c).alias(c) for c in payload]
    if matched_ts_alias:
        out.append(matched.getField("__matched_ts").alias(matched_ts_alias))
    return (
        ev_side.unionByName(q_side)
        .select(*out, "_side")
        .filter(F.col("_side") == 1)
        .drop("_side")
    )
