"""Versioned-store operators — the reference's core contract.

Reference semantics being reproduced (SURVEY.md §2A):

* O-01 store_graph   (src/graphs.rs:35-79)  — idempotent upsert: skip
  when the canonicalized document is byte-identical to current state.
* O-02 delete_graph  (src/graphs.rs:82-93)  — tombstone.
* O-06 checkout_timestamp (src/git.rs:151-189) — as-of resolution:
  latest version <= t; empty store if t precedes history.
* O-07 snapshot      (src/graphs.rs:96-135, src/query.rs:117-145) —
  union of all live graphs at the checked-out commit.
* O-08 diff          (implicit in git commit deltas, pinned by
  tests/integration_test.rs:74-90) — added/removed between snapshots.
* O-09 repo_metadata (src/git.rs:78-85) — first/last commit times.

Spark design notes (scale):

* The changelog is an append-only table. At 100 TB it is partitioned
  by days(ts) — `snapshot_at` starts with `filter(ts <= t)`, which
  Catalyst turns into partition pruning + parquet min/max skipping:
  the distributed analog of the reference's binary search over sorted
  commit times (src/git.rs:154-160).
* latest-wins uses `max_by` hash aggregation (partial + final, no
  sort) rather than a window: a window would sort every partition;
  max_by does a map-side partial combine first, so the shuffle
  carries at most one row per (graph_id) per input partition.
* diff is a pair of anti-joins on the full triple key. Both sides
  share the same hash-partitioning on the join key, so AQE can plan
  one exchange per side; skewed keys are split by AQE skew-join.
* Idempotent append anti-joins the incoming batch against the
  *current* content hash per graph — broadcastable when the batch's
  touched graph set is small, shuffle hash join otherwise (Catalyst
  decides; we only declare the plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_diff_store_spark.functions.turtle import canonicalize_udf

TOMBSTONE = "delete"

# Conventional partition column for changelog tables laid out as
# days(ts) — the production partitioning (SURVEY.md §7 stage 4).
PARTITION_COL = "day"


def _as_of_filter(changelog: DataFrame, t: Column) -> DataFrame:
    """ts <= t, PLUS the derived partition predicate when the table
    carries the days(ts) partition column. Catalyst cannot infer
    `day <= date(t)` from `ts <= t` on its own, and without it a
    day-partitioned changelog reads every file — the explicit
    predicate is what turns the reference's binary search
    (src/git.rs:154-160) into file-level pruning at 100 TB."""
    cond = F.col("ts") <= t
    if PARTITION_COL in changelog.columns:
        cond = cond & (F.col(PARTITION_COL) <= F.to_date(t))
    return changelog.filter(cond)


def with_day_partition(changelog: DataFrame) -> DataFrame:
    """Add the days(ts) partition column (write with
    .partitionBy(PARTITION_COL) to get a prunable layout)."""
    return changelog.withColumn(PARTITION_COL, F.to_date("ts"))


# RDF serializations the canonicalizer handles. N-Triples is a strict
# subset of the Turtle subset we parse, so both dispatch to the same
# canonicalizer; anything else fails loudly — the reference's
# models::Graph.format hint (src/models/graph.rs:14-22,
# openapi.yaml:30-32) is honored, not silently assumed to be Turtle.
KNOWN_FORMATS = ("text/turtle", "application/n-triples")


def canonical_changelog_row(updates: DataFrame) -> DataFrame:
    """Normalize raw graph updates into changelog rows:
    canonicalize payloads (prettifier analog, O-13) and stamp the
    content hash that drives idempotence (O-01). If the updates carry
    the reference's `format` hint it is validated against
    KNOWN_FORMATS (unknown formats raise at execution time).
    """
    payload = F.col("payload")
    if "format" in updates.columns:
        known = F.col("format").isNull() | F.col("format").isin(*KNOWN_FORMATS)
        payload = F.when(known, payload).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("unsupported RDF format "),
                    F.col("format"),
                    F.lit(f" (known: {', '.join(KNOWN_FORMATS)})"),
                )
            )
        )
    canon = F.when(F.col("op") == TOMBSTONE, F.lit(None).cast("string")).otherwise(
        canonicalize_udf(payload)
    )
    return updates.select(
        "graph_id",
        "ts",
        "op",
        canon.alias("payload"),
    ).withColumn(
        "content_hash",
        F.when(F.col("op") == TOMBSTONE, F.lit(None).cast("string")).otherwise(
            F.sha2(F.col("payload"), 256)
        ),
    )


def current_state(changelog: DataFrame) -> DataFrame:
    """Latest changelog row per graph_id (including tombstones).

    max_by keeps the row with the greatest (ts, op, content_hash)
    tiebreak so the result is deterministic even when two versions
    share a timestamp (the reference can't hit this — commit time is
    wall clock — but replayed crawl data can; SURVEY.md §7 hard-part 3).
    """
    ord_key = F.struct(
        F.col("ts"), F.col("op"), F.coalesce(F.col("content_hash"), F.lit(""))
    )
    return changelog.groupBy("graph_id").agg(
        F.max_by(F.struct("ts", "op", "payload", "content_hash"), ord_key).alias("latest")
    ).select("graph_id", "latest.ts", "latest.op", "latest.payload", "latest.content_hash")


def _normalize_history(log: DataFrame) -> DataFrame:
    """Canonical minimal history: per graph in (ts, op, hash) order,
    drop (a) rows whose content equals their predecessor's —
    consecutive-duplicate versions, which also absorbs exact replayed
    rows — and (b) tombstones with no prior 'add' (deleting a graph
    that never existed is a no-op, src/graphs.rs's intent). One window
    shuffle on graph_id."""
    from pyspark.sql import Window

    w = Window.partitionBy("graph_id").orderBy(
        F.col("ts"), F.col("op"), F.coalesce(F.col("content_hash"), F.lit(""))
    )
    cur = F.coalesce(F.col("content_hash"), F.lit("__tombstone__"))
    prev = F.lag(cur).over(w)
    prior_adds = F.count(F.when(F.col("op") != TOMBSTONE, 1)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    keep = (prev.isNull() | (prev != cur)) & ~(
        (F.col("op") == TOMBSTONE) & (prior_adds == 0)
    )
    return (
        log.withColumn("_keep", keep).filter(F.col("_keep")).drop("_keep")
    )


def append_updates(changelog: DataFrame, updates: DataFrame) -> DataFrame:
    """O-01/O-02: idempotent append.

    Defined as `normalize(changelog ∪ canonical(incoming))`: an 'add'
    survives iff its canonical content differs from the graph's
    previous version in event-time order (reference skip-write,
    src/graphs.rs:52-61, pinned by tests/integration_test.rs:96-125);
    a 'delete' survives iff the graph existed before it. Because the
    result depends only on the SET of rows ever ingested, the operator
    is batch-split invariant and replay-idempotent: feeding the same
    updates in any batching (or twice) yields the identical table —
    the exactly-once property the streaming writer leans on. The
    reference gets the same guarantee from its global write lock +
    wall-clock stamps; a replayed crawl needs it from the algebra.
    """
    incoming = canonical_changelog_row(updates)
    return _normalize_history(changelog.unionByName(incoming))


def apply_update_batches(changelog: DataFrame, batches: list[DataFrame]) -> DataFrame:
    """Fold a sequence of micro-batches through append_updates — the
    60 s batched-publish cadence (O-04, src/bin/rdf-diff-writer.rs:109-123)
    expressed as successive transactional appends."""
    for b in batches:
        changelog = append_updates(changelog, b)
    return changelog


def compact_changelog(changelog: DataFrame) -> DataFrame:
    """Bulk-replay form of O-01 idempotence: drop versions whose
    content is identical to the graph's *previous* version (lag over
    ts). `append_updates` gives the same guarantee batch-by-batch;
    this gives it in ONE pass over an already-assembled history —
    the right shape when replaying a 100 TB crawl, where per-batch
    folding would serialize the job. One window shuffle on graph_id.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("graph_id").orderBy(
        F.col("ts"), F.col("op"), F.coalesce(F.col("content_hash"), F.lit(""))
    )
    prev = F.lag(F.coalesce(F.col("content_hash"), F.lit("__tombstone__"))).over(w)
    cur = F.coalesce(F.col("content_hash"), F.lit("__tombstone__"))
    return (
        changelog.withColumn("_prev", prev)
        .filter(F.col("_prev").isNull() | (F.col("_prev") != cur))
        .drop("_prev")
    )


def snapshot_at(changelog: DataFrame, ts: str | Column) -> DataFrame:
    """O-06 + O-07: graph state as of `ts` (inclusive).

    filter(ts <= t)          — partition pruning ≙ binary search
    max_by per graph         — latest-wins
    drop tombstones          — delete semantics
    If ts precedes all history the result is empty, matching
    checkout_timestamp's Err(0) → empty-store behavior
    (src/git.rs:157-158).
    """
    t = F.lit(ts).cast("timestamp") if isinstance(ts, str) else ts
    return (
        current_state(_as_of_filter(changelog, t))
        .filter(F.col("op") != TOMBSTONE)
        .select("graph_id", "ts", "payload", "content_hash")
    )


def snapshot_triples(changelog: DataFrame, ts: str | Column) -> DataFrame:
    """Snapshot expanded to triples (the store the reference queries:
    src/query.rs:117-145). Bulk mapInPandas parse over the snapshot's
    canonical payloads."""
    from rdf_diff_store_spark.functions.turtle import parse_triples

    return parse_triples(snapshot_at(changelog, ts))


def _dual_state(changelog: DataFrame, t1: Column, t2: Column) -> DataFrame:
    """Both as-of states in ONE scan + ONE shuffle: per graph_id,
    max_by with a condition-gated ordering key (rows newer than the
    probe time get a null key, which max_by skips). The naive form —
    two independent snapshot_at calls — scans and shuffles the
    changelog twice; this halves both, which at a 100 TB changelog is
    the difference between one pass and two."""
    ord_key = F.struct(F.col("ts"), F.col("op"), F.coalesce(F.col("content_hash"), F.lit("")))
    val = F.struct("ts", "op", "payload", "content_hash")
    return (
        _as_of_filter(changelog, F.greatest(t1, t2))  # t1 > t2 is legal (reversed diff)
        .groupBy("graph_id")
        .agg(
            F.max_by(val, F.when(F.col("ts") <= t1, ord_key)).alias("s1"),
            F.max_by(val, F.when(F.col("ts") <= t2, ord_key)).alias("s2"),
        )
    )


def diff(changelog: DataFrame, t1: str | Column, t2: str | Column, *, on_triples: bool = True) -> DataFrame:
    """O-08: added/removed between snapshot(t1) and snapshot(t2).

    Single-scan dual-state aggregation (see _dual_state), then:
    * graph-level: live-state hash comparison per graph — no join at
      all (the states are already co-grouped).
    * triple-level: only graphs whose content hash CHANGED between t1
      and t2 are parsed (mapInPandas Turtle parse is the expensive
      step; unchanged graphs can't contribute diff rows), then
      bidirectional anti-joins on the triple key within that reduced
      set (north_rule's sort-merge anti-joins).

    Returns rows tagged with `change` ∈ {'added','removed'}.
    """
    c1 = F.lit(t1).cast("timestamp") if isinstance(t1, str) else t1
    c2 = F.lit(t2).cast("timestamp") if isinstance(t2, str) else t2
    dual = _dual_state(changelog, c1, c2)
    live1 = F.col("s1").isNotNull() & (F.col("s1.op") != TOMBSTONE)
    live2 = F.col("s2").isNotNull() & (F.col("s2.op") != TOMBSTONE)
    h1 = F.when(live1, F.col("s1.content_hash"))
    h2 = F.when(live2, F.col("s2.content_hash"))

    if not on_triples:
        added = dual.filter(h2.isNotNull() & (h1.isNull() | (h1 != h2))).select(
            "graph_id", F.col("s2.content_hash").alias("content_hash"), F.lit("added").alias("change")
        )
        removed = dual.filter(h1.isNotNull() & (h2.isNull() | (h1 != h2))).select(
            "graph_id", F.col("s1.content_hash").alias("content_hash"), F.lit("removed").alias("change")
        )
        return added.unionByName(removed)

    changed = dual.filter(
        ~(h1.isNull() & h2.isNull()) & ~h1.eqNullSafe(h2)
    ).select(
        "graph_id",
        F.when(live1, F.col("s1.payload")).alias("payload1"),
        F.when(live2, F.col("s2.payload")).alias("payload2"),
    )
    from rdf_diff_store_spark.functions.turtle import parse_triples

    # ONE mapInPandas pass parses BOTH sides (r02 VERDICT wrong #4:
    # the old form ran two separate parses over the same `changed`
    # frame — double the Python cost of the most expensive versioned
    # query). posexplode tags each payload with its side; parse_triples
    # passes the tag through to every emitted triple.
    stacked = changed.select(
        "graph_id",
        F.lit(None).cast("timestamp").alias("ts"),
        F.posexplode(F.array("payload1", "payload2")).alias("_side", "payload"),
    )
    parsed = parse_triples(stacked, passthrough="_side")
    # The triple identity key includes datatype and language tag:
    # "hello"@en → "hello"@de is one removed + one added triple in the
    # reference (git diff of canonical N-Triples, which serialize
    # @lang/^^dt), and an IRI object is distinct from a plain literal
    # with the same lexical form. groupBy treats NULL keys as equal, so
    # no sentinel coalescing is needed. One aggregation shuffle (with
    # map-side partial agg) replaces the old pair of anti-joins — and a
    # graph is a SET of triples, so the grouping's dedup is exact.
    key = ["graph_id", "subj", "pred", "obj", "obj_dt", "obj_lang"]
    return (
        parsed.groupBy(*key)
        .agg(
            F.max(F.when(F.col("_side") == 0, 1).otherwise(0)).alias("_in1"),
            F.max(F.when(F.col("_side") == 1, 1).otherwise(0)).alias("_in2"),
        )
        .filter(F.col("_in1") != F.col("_in2"))
        .select(
            *key,
            F.when(F.col("_in2") == 1, F.lit("added"))
            .otherwise(F.lit("removed"))
            .alias("change"),
        )
    )


def version_deltas(changelog: DataFrame) -> DataFrame:
    """Triple-level added/removed counts for EVERY consecutive version
    transition of every graph — the whole-history generalization of
    diff(t1, t2) (reference: the api/graphs diff endpoint queried over
    each adjacent version pair, src/git.rs:151-179 checkout walk).

    Plan shape: one window (version index per graph — partitioned by
    graph_id, never global), ONE mapInPandas parse over all version
    payloads (tombstones carry no payload and parse to zero triples),
    then a single shifted full-outer self-join on triple identity and
    a count aggregation. All shuffles key on graph_id(+vn): co-
    partitioned, AQE-coalesced, no driver loop — the same per-graph
    independence that makes snapshot/diff scale.
    """
    from pyspark.sql import Window

    from rdf_diff_store_spark.functions.turtle import parse_triples

    w = Window.partitionBy("graph_id").orderBy(
        F.col("ts"), F.col("op"), F.coalesce(F.col("content_hash"), F.lit(""))
    )
    versions = changelog.withColumn("vn", F.row_number().over(w)).localCheckpoint()
    spine = versions.select("graph_id", "vn")
    trip = parse_triples(
        versions.select("graph_id", F.col("ts"), "payload", "vn"), passthrough="vn"
    ).select(
        "graph_id",
        "vn",
        "subj",
        "pred",
        "obj",
        F.coalesce("obj_dt", F.lit("\x00")).alias("dtk"),
        F.coalesce("obj_lang", F.lit("\x00")).alias("lk"),
    )
    cur = trip.withColumn("in_cur", F.lit(1))
    prev = trip.withColumn("vn", F.col("vn") + 1).withColumn("in_prev", F.lit(1))
    keys = ["graph_id", "vn", "subj", "pred", "obj", "dtk", "lk"]
    j = cur.join(prev, keys, "full_outer")
    per_vn = j.groupBy("graph_id", "vn").agg(
        F.count(F.when(F.col("in_prev").isNull(), 1)).alias("n_added"),
        F.count(F.when(F.col("in_cur").isNull(), 1)).alias("n_removed"),
    )
    # the spine keeps transitions with zero triple movement (replayed
    # identical payloads, tombstone-after-tombstone) and drops the
    # phantom "vn = last + 1" rows the shift invents
    return (
        spine.join(per_vn, ["graph_id", "vn"], "left")
        .select(
            "graph_id",
            "vn",
            F.coalesce("n_added", F.lit(0)).alias("n_added"),
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        )
    )


def expire_versions(changelog: DataFrame, before: str | Column) -> DataFrame:
    """Retention vacuum: drop history older than `before` while
    preserving every snapshot at t >= before — per graph, all rows with
    ts >= before survive plus the single latest row with ts < before
    (the graph's state entering the retention window; dropped when it
    is a tombstone, since "absent" and "deleted" read identically at
    snapshot time). The Iceberg expire_snapshots analog for the
    changelog layout; the reference never prunes its git history, so
    this is a new capability the table layout makes cheap.

    Plan: one partition-pruned scan for the recent slice (ts >= before
    pushes to the scan) + one max_by hash-agg over the older slice —
    no window, no global sort."""
    t = F.lit(before).cast("timestamp") if isinstance(before, str) else before
    recent = changelog.filter(F.col("ts") >= t)
    boundary = (
        current_state(changelog.filter(F.col("ts") < t))
        .filter(F.col("op") != TOMBSTONE)
    )
    return boundary.unionByName(recent)


def metadata(changelog: DataFrame) -> DataFrame:
    """O-09: {start_time, end_time} = first/last version times
    (reference: src/git.rs:78-85, src/models/metadata.rs:14-20)."""
    return changelog.agg(
        F.min("ts").alias("start_time"), F.max("ts").alias("end_time")
    )


def snapshots_at(changelog: DataFrame, timestamps: list) -> DataFrame:
    """k as-of snapshots in ONE scan + ONE shuffle — `_dual_state`
    generalized: a temporal-analytics client asking "the store at
    every month-end of 2024" must not pay k changelog scans
    (`snapshot_at` k times = k× the dominant cost at a 100 TB
    changelog). Per graph, ONE groupBy evaluates k condition-gated
    max_by aggregates (rows newer than probe i get a null ordering
    key, which max_by skips — the proven `diff` trick), then the k
    states unfold via ONE explode. Tombstoned and not-yet-created
    states drop, matching `snapshot_at` exactly per probe
    (pytest-pinned equivalence).

    Returns (query_ts, graph_id, ts, payload, content_hash). k is a
    plan-size constant (k aggregate buffers per graph), so keep k ≤
    ~10²; beyond that, batch the probes. Reference: checkout_timestamp
    runs per single ts (src/git.rs:154-160) — the reference client
    loops; this is the loop fused into one job."""
    ts_cols = [
        F.lit(t).cast("timestamp") if isinstance(t, str) else t for t in timestamps
    ]
    if not ts_cols:
        raise ValueError("snapshots_at needs at least one timestamp")
    ord_key = F.struct(
        F.col("ts"), F.col("op"), F.coalesce(F.col("content_hash"), F.lit(""))
    )
    val = F.struct("ts", "op", "payload", "content_hash")
    bound = ts_cols[0] if len(ts_cols) == 1 else F.greatest(*ts_cols)
    g = (
        _as_of_filter(changelog, bound)
        .groupBy("graph_id")
        .agg(
            *[
                F.max_by(val, F.when(F.col("ts") <= t, ord_key)).alias(f"_s{i}")
                for i, t in enumerate(ts_cols)
            ]
        )
    )
    arr = F.array(
        *[
            F.struct(t.alias("query_ts"), F.col(f"_s{i}").alias("s"))
            for i, t in enumerate(ts_cols)
        ]
    )
    return (
        g.select("graph_id", F.explode(arr).alias("q"))
        .filter(F.col("q.s").isNotNull() & (F.col("q.s.op") != TOMBSTONE))
        .select(
            F.col("q.query_ts").alias("query_ts"),
            "graph_id",
            F.col("q.s.ts").alias("ts"),
            F.col("q.s.payload").alias("payload"),
            F.col("q.s.content_hash").alias("content_hash"),
        )
    )


PROV = "http://www.w3.org/ns/prov#"
XSD_DATETIME = "http://www.w3.org/2001/XMLSchema#dateTime"


def prov_lineage(
    changelog: DataFrame, activity_iri: str = "urn:rdf-diff-store:ingest"
) -> DataFrame:
    """Materialize the store's version lineage as standard PROV-O
    triples (W3C PROV-O Rec) — the north rule requires per-partition
    lineage; `metrics.py` records it operationally, and this operator
    publishes it INTO the KG so provenance is queryable with the same
    SPARQL engine as the data (the reference keeps lineage only as
    git history, src/git.rs:61-118 — unqueryable from the store).

    Per changelog row, with ``version = urn:version:{graph_id}@{ts}``:

    * every row:   (version, prov:specializationOf, urn:graph:{id})
    * adds:        (version, prov:generatedAtTime, ts^^xsd:dateTime),
                   (version, prov:wasGeneratedBy, activity_iri)
    * tombstones:  (version, prov:invalidatedAtTime, ts^^xsd:dateTime)

    Output is the shared term convention (subj, pred, obj, obj_dt,
    obj_lang) — composes unchanged with `serialize_nquads`, the
    nquads/turtle sinks, and `append_updates` itself (provenance
    stored as just another graph). Pure JVM projections + union:
    map-only, ZERO shuffle, embarrassingly parallel at a 100 TB
    changelog. Timestamps format from the NTZ value (date_format on
    NTZ is session-TZ-independent — the CLAUDE.md trap avoided)."""
    lex = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    version = F.concat(F.lit("urn:version:"), F.col("graph_id"), F.lit("@"), lex)

    def row(pred: str, obj, obj_dt=None):
        return F.struct(
            version.alias("subj"),
            F.lit(PROV + pred).alias("pred"),
            obj.alias("obj"),
            (F.lit(obj_dt) if obj_dt else F.lit(None)).cast("string").alias("obj_dt"),
            F.lit(None).cast("string").alias("obj_lang"),
        )

    spec = changelog.select(
        row("specializationOf", F.concat(F.lit("urn:graph:"), F.col("graph_id"))).alias("t")
    )
    adds = changelog.filter(F.col("op") != TOMBSTONE)
    gen = adds.select(row("generatedAtTime", lex, XSD_DATETIME).alias("t"))
    act = adds.select(row("wasGeneratedBy", F.lit(activity_iri)).alias("t"))
    dels = changelog.filter(F.col("op") == TOMBSTONE).select(
        row("invalidatedAtTime", lex, XSD_DATETIME).alias("t")
    )
    return (
        spec.unionByName(gen).unionByName(act).unionByName(dels).select("t.*")
    )


def version_intervals(changelog: DataFrame) -> DataFrame:
    """SCD-2 style validity intervals: each stored version becomes a
    row (graph_id, valid_from, valid_to, payload, content_hash) where
    valid_to is the NEXT version's timestamp (exclusive) or NULL for
    the currently-live version; tombstones close the preceding
    interval and emit no row of their own. The warehouse-standard
    interval table — the exact input shape `operators/ranges.py`'s
    bucketed_range_join consumes, so "join events to the graph
    version that was live when they happened" becomes one banded
    equi-join instead of a per-event as-of aggregation
    (`snapshots_at` answers point probes; this materializes ALL
    validity windows in one pass).

    One LEAD window per graph partition — the changelog is already
    hash-partitioned by graph_id for every other versioned operator,
    so the window reuses that exchange; no join, no second scan.
    Reference: the interval view a client reconstructs by walking
    `src/git.rs:61-118` commit times pairwise.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("graph_id").orderBy(
        F.col("ts"), F.col("op"), F.coalesce(F.col("content_hash"), F.lit(""))
    )
    nxt = F.lead("ts").over(w)
    return (
        changelog.select(
            "graph_id",
            "ts",
            "op",
            "payload",
            "content_hash",
            nxt.alias("valid_to"),
        )
        .filter(F.col("op") != TOMBSTONE)
        .select(
            "graph_id",
            F.col("ts").alias("valid_from"),
            "valid_to",
            "payload",
            "content_hash",
        )
    )
