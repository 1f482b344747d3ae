"""Bucketed range join (operators/ranges.py) and DSIR importance
weights (functions/text.py::dsir_weights).

Reference context: the range join generalizes the reference's
checkout-by-timestamp binary search (/root/reference/src/git.rs:131-162)
to event×interval volume; DSIR is the Xie et al. 2023 data-selection
score a 100-TB crawl pipeline runs before training. All randomness is
md5-derived — assertions are deterministic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_diff_store_spark.functions.text import dsir_weights
from rdf_diff_store_spark.operators.ranges import asof_join, bucketed_range_join


def _naive(ev, iv, key, ts, start, end):
    cond = (
        (F.col(f"e.{key}") == F.col(f"i.{key}"))
        & (F.col(f"e.{ts}") >= F.col(f"i.{start}"))
        & (F.col(f"e.{ts}") < F.col(f"i.{end}"))
    )
    cols = [f"e.{c}" for c in ev.columns] + [
        f"i.{c}" for c in iv.columns if c != key
    ]
    return ev.alias("e").join(iv.alias("i"), cond).select(*cols)


class TestBucketedRangeJoin:
    def test_matches_naive_inequality_join(self, spark):
        # md5-scattered timestamps and interval bounds; intervals span
        # 0..3 buckets at width=100 — every explode shape exercised.
        ev = spark.range(300).select(
            F.col("id").alias("eid"),
            (F.col("id") % 7).alias("k"),
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10)
             .cast("long") % 1000).alias("ts"),
        )
        iv = spark.range(60).select(
            F.col("id").alias("vid"),
            (F.col("id") % 7).alias("k"),
            (F.conv(F.substring(F.md5(F.concat(F.lit("s"), F.col("id"))), 1, 4), 16, 10)
             .cast("long") % 900).alias("s"),
        ).withColumn(
            "e",
            F.col("s")
            + 1
            + F.conv(
                F.substring(F.md5(F.concat(F.lit("l"), F.col("vid"))), 1, 3), 16, 10
            ).cast("long")
            % 250,
        )
        got = bucketed_range_join(
            ev, iv, key="k", ts_col="ts", start_col="s", end_col="e",
            bucket_width=100,
        )
        want = _naive(ev, iv, "k", "ts", "s", "e")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        assert got.count() > 0  # non-vacuous

    def test_boundary_semantics(self, spark):
        # start inclusive, end exclusive — including when ts sits
        # exactly on a bucket boundary shared with end.
        ev = spark.createDataFrame(
            [(1, 1, 100), (2, 1, 199), (3, 1, 200), (4, 1, 99)],
            ["eid", "k", "ts"],
        )
        iv = spark.createDataFrame([(9, 1, 100, 200)], ["vid", "k", "s", "e"])
        got = bucketed_range_join(
            ev, iv, key="k", ts_col="ts", start_col="s", end_col="e",
            bucket_width=100,
        )
        assert sorted(r.eid for r in got.collect()) == [1, 2]

    def test_no_duplicate_pairs_across_buckets(self, spark):
        # one interval spanning 5 buckets: each covered event matches
        # exactly once (events carry a single bucket).
        ev = spark.range(50).select(
            F.col("id").alias("eid"), F.lit(1).alias("k"),
            (F.col("id") * 10).alias("ts"),
        )
        iv = spark.createDataFrame([(9, 1, 0, 500)], ["vid", "k", "s", "e"])
        got = bucketed_range_join(
            ev, iv, key="k", ts_col="ts", start_col="s", end_col="e",
            bucket_width=100,
        )
        assert got.count() == got.select("eid").distinct().count() == 50

    def test_plan_is_equi_join_not_nested_loop(self, spark):
        # the whole point: the physical plan must be a hash/sort-merge
        # equi-join, never BroadcastNestedLoopJoin/CartesianProduct.
        ev = spark.range(100).select(
            F.col("id").alias("eid"), (F.col("id") % 5).alias("k"),
            F.col("id").alias("ts"),
        )
        iv = spark.range(20).select(
            F.col("id").alias("vid"), (F.col("id") % 5).alias("k"),
            (F.col("id") * 3).alias("s"), (F.col("id") * 3 + 40).alias("e"),
        )
        plan = (
            bucketed_range_join(
                ev, iv, key="k", ts_col="ts", start_col="s", end_col="e",
                bucket_width=32,
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "Cartesian" not in plan


class TestDsirWeights:
    def _docs(self, spark):
        # target dialect: 'alpha beta'; raw-only dialect: 'gamma delta'
        rows = []
        for i in range(20):
            rows.append((f"t{i}", "en", "alpha beta alpha beta alpha"))
        for i in range(20):
            rows.append((f"r{i}", "xx", "gamma delta gamma delta gamma"))
        rows.append(("mix", "xx", "alpha beta alpha beta alpha"))
        return spark.createDataFrame(rows, ["doc_id", "lang", "text"])

    def test_target_like_docs_score_higher(self, spark):
        docs = self._docs(spark)
        got = {
            r.doc_id: (r.n_tokens, r.logw_micro)
            for r in dsir_weights(docs, F.col("lang") == "en").collect()
        }
        assert all(n == 5 for n, _ in got.values())
        # every target-dialect doc outranks every raw-only-dialect doc
        assert min(got[f"t{i}"][1] for i in range(20)) > max(
            got[f"r{i}"][1] for i in range(20)
        )
        # the mixed doc scores identically to the target docs (same
        # bucket profile), even though it is not in the target set —
        # importance is about CONTENT, not membership
        assert got["mix"][1] == got["t0"][1]

    def test_score_is_sum_of_bucket_logratios(self, spark):
        # within ONE corpus (one log-ratio table), a doc with doubled
        # token counts scores exactly 2x a single-count doc — integer
        # micro-logs make the linearity bit-exact
        docs = self._docs(spark).unionAll(
            self._docs(spark)
            .filter(F.col("doc_id") == "mix")
            .select(
                F.lit("mix2").alias("doc_id"),
                "lang",
                F.concat(F.col("text"), F.lit(" "), F.col("text")).alias("text"),
            )
        )
        got = {
            r.doc_id: r.logw_micro
            for r in dsir_weights(docs, F.col("lang") == "en").collect()
        }
        assert got["mix2"] == 2 * got["mix"]

    def test_deterministic(self, spark):
        docs = self._docs(spark)
        a = sorted(map(tuple, dsir_weights(docs, F.col("lang") == "en").collect()))
        b = sorted(map(tuple, dsir_weights(docs, F.col("lang") == "en").collect()))
        assert a == b


class TestAsofJoin:
    def _frames(self, spark):
        from rdf_diff_store_spark.operators.ranges import asof_join

        ev = spark.createDataFrame(
            [(1, "a", 10), (2, "a", 25), (3, "a", 5), (4, "b", 100)],
            ["eid", "k", "ts"],
        )
        q = spark.createDataFrame(
            [("a", 10, "q10"), ("a", 20, "q20"), ("b", 200, "q200")],
            ["k", "qts", "val"],
        )
        return asof_join, ev, q

    def test_backward_inclusive_and_left_outer(self, spark):
        asof_join, ev, q = self._frames(spark)
        got = {
            r.eid: r.val
            for r in asof_join(
                ev, q, key="k", ts_col="ts", quote_ts_col="qts"
            ).collect()
        }
        # eid=1 ts=10 matches the EQUAL-ts quote (inclusive backward);
        # eid=3 ts=5 precedes every quote -> NULL; eid=4 likewise
        assert got == {1: "q10", 2: "q20", 3: None, 4: None}

    def test_forward_direction(self, spark):
        asof_join, ev, q = self._frames(spark)
        got = {
            r.eid: r.val
            for r in asof_join(
                ev, q, key="k", ts_col="ts", quote_ts_col="qts",
                direction="forward",
            ).collect()
        }
        assert got == {1: "q10", 2: None, 3: "q10", 4: "q200"}

    def test_null_payload_quote_is_matched_not_skipped(self, spark):
        # a quote whose payload is NULL must still win over an older
        # non-null quote (the struct trick: ignorenulls skips event
        # rows, never real quotes)
        from rdf_diff_store_spark.operators.ranges import asof_join

        ev = spark.createDataFrame([(1, "a", 30)], ["eid", "k", "ts"])
        q = spark.createDataFrame(
            [("a", 10, "old"), ("a", 20, None)], ["k", "qts", "val"]
        )
        rows = asof_join(
            ev, q, key="k", ts_col="ts", quote_ts_col="qts",
            matched_ts_alias="mts",
        ).collect()
        assert rows[0].val is None and rows[0].mts == 20

    def test_plan_has_no_join_node(self, spark):
        asof_join, ev, q = self._frames(spark)
        plan = (
            asof_join(ev, q, key="k", ts_col="ts", quote_ts_col="qts")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan  # union + one window, zero joins
        assert plan.count("Exchange") <= 2  # window shuffle (+AQE read)


class TestPagerank:
    def test_two_cycle_is_a_fixed_point(self, spark):
        # a<->b: contrib = (1e6*85) div 100 = 850000, +150000 base
        # -> every iteration reproduces exactly 1,000,000
        from rdf_diff_store_spark.operators.graph import pagerank

        e = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
        got = {r.node: r.rank_micro for r in pagerank(e, iterations=3).collect()}
        assert got == {"a": 1_000_000, "b": 1_000_000}

    def test_star_center_dominates(self, spark):
        from rdf_diff_store_spark.operators.graph import pagerank

        e = spark.createDataFrame(
            [(f"leaf{i}", "hub") for i in range(10)], ["src", "dst"]
        )
        got = {r.node: r.rank_micro for r in pagerank(e, iterations=5).collect()}
        assert got["hub"] > got["leaf0"]
        # dangling hub drops its mass; leaves get base only
        assert all(got[f"leaf{i}"] == 150_000 for i in range(10))
        # hub = base + 10 * (150000*85 div 100) after convergence
        assert got["hub"] == 150_000 + 10 * ((150_000 * 85) // 100)

    def test_deterministic_bigint(self, spark):
        from rdf_diff_store_spark.operators.graph import pagerank

        e = spark.createDataFrame(
            [(str(i % 7), str((i * 3 + 1) % 7)) for i in range(20)],
            ["src", "dst"],
        )
        a = sorted(map(tuple, pagerank(e).collect()))
        b = sorted(map(tuple, pagerank(e).collect()))
        assert a == b
        assert all(isinstance(r, int) for _, r in a)


class TestPersonalizedPagerank:
    def _ppr(self, spark, edges, seeds, iterations=3):
        from rdf_diff_store_spark.operators.graph import personalized_pagerank

        e = spark.createDataFrame(edges, ["src", "dst"])
        s = spark.createDataFrame([(x,) for x in seeds], ["node"])
        return {
            r.node: r.rank_micro
            for r in personalized_pagerank(e, s, iterations=iterations).collect()
        }

    def test_unreachable_gets_no_mass(self, spark):
        # a -> b, and a disconnected c -> d: seeding a never ranks c/d
        got = self._ppr(spark, [("a", "b"), ("c", "d")], ["a"])
        assert set(got) == {"a", "b"}
        assert "c" not in got and "d" not in got

    def test_python_integer_model(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
        seeds = ["a"]
        got = self._ppr(spark, edges, seeds, iterations=3)

        outdeg = {}
        for s_, _ in edges:
            outdeg[s_] = outdeg.get(s_, 0) + 1
        base = (1_000_000 * 15) // 100
        r = {x: 1_000_000 for x in seeds}
        for _ in range(3):
            nxt = {x: base for x in seeds}
            for u, v in edges:
                if u in r:
                    nxt[v] = nxt.get(v, 0) + (r[u] * 85) // (100 * outdeg[u])
            r = {k: v for k, v in nxt.items() if v > 0}
        assert got == r

    def test_seed_restart_dominates_near_seed(self, spark):
        # chain a -> b -> c -> d, seed a: once the initial 1e6 pulse
        # has left the chain (k > diameter), the stationary restart
        # pattern decays geometrically with distance from the seed
        got = self._ppr(spark, [("a", "b"), ("b", "c"), ("c", "d")], ["a"], iterations=8)
        assert got["a"] > got["b"] > got["c"] > got["d"]

    def test_trustrank_multi_seed(self, spark):
        # spam node links INTO trusted region but gets no trust back
        edges = [("t1", "t2"), ("t2", "t1"), ("spam", "t1")]
        got = self._ppr(spark, edges, ["t1", "t2"])
        assert "spam" not in got
        assert got["t1"] > 0 and got["t2"] > 0


class TestRangeAsofNullAndMalformed:
    def test_malformed_interval_matches_nothing(self, spark):
        # end <= start: the inequality predicate can never hold; the
        # bucket explode must not generate a descending sequence
        ev = spark.createDataFrame([(1, 1, 50)], ["eid", "k", "ts"])
        iv = spark.createDataFrame(
            [(9, 1, 1_700_000_000_000_000, 0), (8, 1, 40, 40), (7, 1, 40, 60)],
            ["vid", "k", "s", "e"],
        )
        got = bucketed_range_join(
            ev, iv, key="k", ts_col="ts", start_col="s", end_col="e",
            bucket_width=100,
        ).collect()
        assert [(r.eid, r.vid) for r in got] == [(1, 7)]

    def test_range_join_rejects_column_clash(self, spark):
        ev = spark.createDataFrame([(1, 1, 5)], ["eid", "k", "ts"])
        iv = spark.createDataFrame([(9, 1, 0, 10, 3)], ["vid", "k", "s", "e", "ts"])
        with pytest.raises(ValueError, match="share non-key columns"):
            bucketed_range_join(
                ev, iv, key="k", ts_col="ts", start_col="s", end_col="e",
                bucket_width=100,
            )

    def test_asof_null_timestamps_never_match(self, spark):
        from rdf_diff_store_spark.operators.ranges import asof_join

        ev = spark.createDataFrame(
            [(1, "a", 30), (2, "a", None)], ["eid", "k", "ts"]
        )
        q = spark.createDataFrame(
            [("a", None, "bogus"), ("a", 10, "real")], ["k", "qts", "val"]
        )
        for direction, want in (
            ("backward", {1: "real", 2: None}),
            ("forward", {1: None, 2: None}),
        ):
            got = {
                r.eid: r.val
                for r in asof_join(
                    ev, q, key="k", ts_col="ts", quote_ts_col="qts",
                    direction=direction,
                ).collect()
            }
            assert got == want, direction


from hypothesis import given, settings, strategies as st  # noqa: E402

_EV = st.lists(
    st.tuples(st.integers(0, 3), st.one_of(st.none(), st.integers(0, 300))),
    min_size=1,
    max_size=30,
)
_IV = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.one_of(st.none(), st.integers(0, 300)),
        st.integers(-50, 350),
    ),
    min_size=0,
    max_size=15,
)


class TestTemporalJoinProperties:
    """Model-based: random keys/timestamps (including NULLs and
    malformed intervals) — the operators must agree with a per-row
    Python reference implementing the SQL predicate semantics."""

    @settings(max_examples=10, deadline=None)
    @given(_EV, _IV)
    def test_range_join_matches_python_model(self, spark, ev_rows, iv_rows):
        ev = spark.createDataFrame(
            [(i, k, ts) for i, (k, ts) in enumerate(ev_rows)],
            "eid int, k int, ts int",
        )
        iv = spark.createDataFrame(
            [(100 + j, k, s, e) for j, (k, s, e) in enumerate(iv_rows)],
            "vid int, k int, s int, e int",
        )
        got = sorted(
            (r.eid, r.vid)
            for r in bucketed_range_join(
                ev, iv, key="k", ts_col="ts", start_col="s", end_col="e",
                bucket_width=64,
            ).collect()
        )
        want = sorted(
            (i, 100 + j)
            for i, (k, ts) in enumerate(ev_rows)
            for j, (k2, s, e) in enumerate(iv_rows)
            if k == k2 and ts is not None and s is not None and s <= ts < e
        )
        assert got == want

    @settings(max_examples=10, deadline=None)
    @given(_EV, _IV)
    def test_asof_matches_python_model(self, spark, ev_rows, iv_rows):
        # reuse the interval strategy's (k, ts) pairs as quotes; make
        # quotes unique per (k, ts) as the docstring requires
        seen, q_rows = set(), []
        for j, (k, qts, _) in enumerate(iv_rows):
            if (k, qts) not in seen:
                seen.add((k, qts))
                q_rows.append((k, qts, f"q{j}"))
        ev = spark.createDataFrame(
            [(i, k, ts) for i, (k, ts) in enumerate(ev_rows)],
            "eid int, k int, ts int",
        )
        q = spark.createDataFrame(q_rows, "k int, qts int, val string") if q_rows else (
            spark.createDataFrame([], "k int, qts int, val string")
        )
        got = {
            r.eid: r.val
            for r in asof_join(
                ev, q, key="k", ts_col="ts", quote_ts_col="qts"
            ).collect()
        }
        want = {}
        for i, (k, ts) in enumerate(ev_rows):
            best = None
            if ts is not None:
                for k2, qts, val in q_rows:
                    if k2 == k and qts is not None and qts <= ts:
                        if best is None or qts > best[0]:
                            best = (qts, val)
            want[i] = best[1] if best else None
        assert got == want


class TestLabelPropagation:
    def test_two_triangles_with_bridge_hand_computed(self, spark):
        """Every round below is hand-computed (count DESC, label ASC):
        the bridge node pair flips allegiance until the triangles'
        interior majority wins — final communities {0,1,2} and
        {3,4,5}."""
        from rdf_diff_store_spark.operators.graph import label_propagation

        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
            "src long, dst long",
        )
        got = {
            r.id: r.label for r in label_propagation(edges, iterations=3).collect()
        }
        assert got == {0: 0, 1: 0, 2: 0, 3: 2, 4: 2, 5: 2}

    def test_partitioning_invariance(self, spark):
        """Ties break by label, never by partition order: 64-way
        repartition gives bit-identical labels."""
        from rdf_diff_store_spark.operators.graph import label_propagation

        rows = [(i, (i * 7 + 1) % 40) for i in range(40)]
        e1 = spark.createDataFrame(rows, "src long, dst long")
        a = {r.id: r.label for r in label_propagation(e1, 3).collect()}
        b = {
            r.id: r.label
            for r in label_propagation(e1.repartition(64), 3).collect()
        }
        assert a == b

    def test_majority_beats_small_label(self, spark):
        """Count outranks the tie-break: a node whose neighbors are
        mostly high-labeled adopts the majority, not the minimum."""
        from rdf_diff_store_spark.operators.graph import label_propagation

        # node 9's neighbors after round 1: labels favor 10-cluster
        edges = spark.createDataFrame(
            [(9, 10), (9, 11), (9, 12), (9, 0)], "src long, dst long"
        )
        # round 1: 9's nbr labels {10,11,12,0} -> min 0 (all count 1)
        # 10,11,12 -> 9; 0 -> 9
        # round 2: 9's nbr labels {9,9,9,9} -> 9 ... leaf sees {0}
        got = {r.id: r.label for r in label_propagation(edges, 2).collect()}
        assert got[9] == 9 and got[10] == 0 and got[0] == 0
