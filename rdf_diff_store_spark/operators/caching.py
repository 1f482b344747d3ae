"""Snapshot/query cache tiers — the Spark analog of the reference's
three moka LRU caches (store_cache / graphs_cache / query_cache, each
capacity 1000: src/query.rs:29-43) and their fallthrough logic
(graphs_with_cache src/query.rs:46-69, query_with_cache
src/query.rs:72-99, levels enum src/query.rs:14-20).

Mapping:
  store_cache[ts]        -> persisted snapshot DataFrame (executor
                            memory/disk blocks instead of an in-heap
                            oxigraph store)
  graphs_cache[ts]       -> memoized canonical Turtle text per graph
  query_cache[(ts, q)]   -> memoized collected result rows

The cache level reached is recorded per call (Nothing / Graph /
Prettified / Query), matching the reference's Cache-Level response
header that feeds its latency histograms
(src/metrics/middleware.rs:12)."""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

LEVEL_NOTHING = "Nothing"
LEVEL_GRAPH = "Graph"
LEVEL_PRETTIFIED = "Prettified"
LEVEL_QUERY = "Query"


class _LRU(OrderedDict):
    def __init__(self, capacity: int, on_evict: Callable | None = None):
        super().__init__()
        self.capacity = capacity
        self.on_evict = on_evict

    def get_or(self, key, compute):
        if key in self:
            self.move_to_end(key)
            return self[key], True
        value = compute()
        self[key] = value
        if len(self) > self.capacity:
            _, evicted = self.popitem(last=False)
            if self.on_evict:
                self.on_evict(evicted)
        return value, False


class SnapshotCache:
    """Three-tier cache over a changelog DataFrame.

    Capacity defaults to the reference's 1000 entries per tier
    (src/query.rs:38-41). Evicted snapshot DataFrames are unpersisted
    so executor storage is bounded.
    """

    def __init__(
        self,
        changelog: DataFrame,
        capacity: int = 1000,
        max_rows: int = 100_000,
    ):
        self.changelog = changelog
        self.store_cache: _LRU = _LRU(capacity, on_evict=lambda df: df.unpersist())
        self.graphs_cache: _LRU = _LRU(capacity)
        self.query_cache: _LRU = _LRU(capacity)
        self.last_level: str | None = None
        # driver-OOM guard: document()/query() refuse to materialize
        # more than max_rows on the driver (the reference returns the
        # whole snapshot as one HTTP body, which has the same failure
        # mode — here it is bounded and explicit). Use *_iter for
        # results of unbounded size.
        self.max_rows = max_rows

    def _bounded_collect(self, df: DataFrame, what: str) -> list:
        # toLocalIterator with a row cap: partitions stream to the
        # driver one at a time and we stop at the bound — a
        # limit(max_rows+1) would instead funnel everything through a
        # single GlobalLimit task (measured 8× pipeline regression on a
        # 2M-row limit, CLAUDE.md)
        rows: list = []
        for row in df.toLocalIterator(prefetchPartitions=True):
            rows.append(row)
            if len(rows) > self.max_rows:
                raise ValueError(
                    f"{what} exceeds max_rows={self.max_rows} on the driver; "
                    "use document_iter()/query_iter() (toLocalIterator) or "
                    "raise max_rows explicitly"
                )
        return rows

    def snapshot(self, ts: str) -> DataFrame:
        """store_cache tier: persisted snapshot-at-ts DataFrame."""
        from rdf_diff_store_spark.operators.versioned import snapshot_at

        def cold():
            df = snapshot_at(self.changelog, ts).persist(StorageLevel.MEMORY_AND_DISK)
            df.count()  # materialize now; later hits are cache reads
            return df

        df, hit = self.store_cache.get_or(ts, cold)
        self.last_level = LEVEL_GRAPH if hit else LEVEL_NOTHING
        return df

    def document(self, ts: str) -> list:
        """graphs_cache tier: canonical per-graph Turtle rows
        (GET /api/graphs/{ts} analog — src/bin/rdf-query-cache.rs:81-102)."""
        def cold():
            from rdf_diff_store_spark.functions.turtle import (
                parse_triples,
                serialize_graph,
            )

            snap = self.snapshot(ts)
            return sorted(
                self._bounded_collect(
                    serialize_graph(parse_triples(snap)), f"document({ts})"
                ),
                key=lambda r: r.graph_id,
            )

        rows, hit = self.graphs_cache.get_or(ts, cold)
        if hit:
            self.last_level = LEVEL_PRETTIFIED
        return rows

    def document_iter(self, ts: str):
        """Unbounded variant: iterate per-graph documents without
        materializing the snapshot on the driver (no memoization —
        an iterator can only be consumed once)."""
        from rdf_diff_store_spark.functions.turtle import parse_triples, serialize_graph

        snap = self.snapshot(ts)
        return serialize_graph(parse_triples(snap)).orderBy("graph_id").toLocalIterator()

    def query(self, ts: str, name: str, fn: Callable[[DataFrame], DataFrame]) -> list:
        """query_cache tier: memoized collected results of `fn`
        applied to the snapshot (GET /api/sparql/{ts} analog).
        Bounded at max_rows; use query_iter for unbounded results."""
        key = (ts, name)

        def cold():
            return self._bounded_collect(fn(self.snapshot(ts)), f"query({name!r})")

        rows, hit = self.query_cache.get_or(key, cold)
        if hit:
            self.last_level = LEVEL_QUERY
        return rows

    def query_iter(self, ts: str, fn: Callable[[DataFrame], DataFrame]):
        """Unbounded variant: stream result rows to the driver one
        Arrow batch at a time (toLocalIterator; not memoized)."""
        return fn(self.snapshot(ts)).toLocalIterator()
