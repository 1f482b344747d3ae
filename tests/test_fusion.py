"""Fact fusion / truth discovery (operators/fusion.py): provenance
rollup, Sums trust iteration (≡ HITS on the source→fact bipartite
graph), trust-weighted conflict resolution. The stage that produces the
fused RDF the reference ingests (`/root/reference/src/graphs.rs:30-61`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.fusion import (
    fact_support,
    resolve_conflicts,
    source_trust,
)


def _claims(spark, rows):
    return spark.createDataFrame(
        rows, "source string, subj string, pred string, obj string"
    )


class TestFactSupport:
    def test_counts(self, spark):
        out = {
            (r["subj"], r["obj"]): (r["n_sources"], r["n_claims"])
            for r in fact_support(
                _claims(
                    spark,
                    [
                        ("A", "e1", "p", "x"),
                        ("A", "e1", "p", "x"),  # same source, 2nd page
                        ("B", "e1", "p", "x"),
                        ("C", "e1", "p", "y"),
                    ],
                )
            ).collect()
        }
        assert out[("e1", "x")] == (2, 3)
        assert out[("e1", "y")] == (1, 1)


class TestSourceTrust:
    """Hand-computed Sums dynamics, 1 iteration:
    A,B assert f1=(e1,p,x) and f3=(e2,p,z); C asserts f2=(e1,p,y), f3.
    belief_raw: f1=2e6 f2=1e6 f3=3e6; scale 3 → 666666/333333/1000000.
    trust_raw:  A=B=1666666, C=1333333; scale 1 → unchanged."""

    ROWS = [
        ("A", "e1", "p", "x"),
        ("B", "e1", "p", "x"),
        ("C", "e1", "p", "y"),
        ("A", "e2", "p", "z"),
        ("B", "e2", "p", "z"),
        ("C", "e2", "p", "z"),
    ]

    def test_hand_computed_round(self, spark):
        trust, beliefs = source_trust(_claims(spark, self.ROWS), iterations=1)
        t = {r["source"]: r["trust_micro"] for r in trust.collect()}
        assert t == {"A": 1_666_666, "B": 1_666_666, "C": 1_333_333}
        b = {(r["subj"], r["obj"]): r["belief_micro"] for r in beliefs.collect()}
        assert b == {
            ("e1", "x"): 666_666,
            ("e1", "y"): 333_333,
            ("e2", "z"): 1_000_000,
        }

    def test_duplicate_claims_collapse(self, spark):
        rows = self.ROWS + self.ROWS  # every claim twice: same result
        trust, _ = source_trust(_claims(spark, rows), iterations=1)
        t = {r["source"]: r["trust_micro"] for r in trust.collect()}
        assert t["A"] == 1_666_666 and t["C"] == 1_333_333

    def test_repartition_determinism(self, spark):
        c = _claims(spark, self.ROWS).repartition(13)
        trust, _ = source_trust(c, iterations=2)
        t1 = sorted(map(tuple, trust.collect()))
        trust2, _ = source_trust(_claims(spark, self.ROWS), iterations=2)
        assert t1 == sorted(map(tuple, trust2.collect()))


class TestResolveConflicts:
    def test_trusted_majority_wins(self, spark):
        claims = _claims(spark, TestSourceTrust.ROWS)
        trust, _ = source_trust(claims, iterations=1)
        out = {
            (r["subj"], r["pred"]): r for r in resolve_conflicts(claims, trust).collect()
        }
        e1 = out[("e1", "p")]
        # x backed by A+B (1666666·2) beats y backed by C
        assert (e1["obj"], e1["support_micro"], e1["n_sources"]) == (
            "x",
            3_333_332,
            2,
        )
        assert out[("e2", "p")]["obj"] == "z"

    def test_uniform_trust_is_majority_vote_with_lex_ties(self, spark):
        claims = _claims(
            spark,
            [
                ("A", "e1", "p", "b"),
                ("B", "e1", "p", "a"),  # 1-1 tie → 'a' (lex smallest)
                ("C", "e2", "p", "v"),
            ],
        )
        uniform = claims.select("source").distinct().withColumn(
            "trust_micro", F.lit(1_000_000).cast("bigint")
        )
        out = {r["subj"]: r["obj"] for r in resolve_conflicts(claims, uniform).collect()}
        assert out == {"e1": "a", "e2": "v"}

    def test_window_is_partitioned(self, spark):
        claims = _claims(spark, TestSourceTrust.ROWS)
        uniform = claims.select("source").distinct().withColumn(
            "trust_micro", F.lit(1).cast("bigint")
        )
        plan = (
            resolve_conflicts(claims, uniform)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for line in plan.splitlines():
            if "Window [" in line:
                assert line.count("], [") == 2  # fns, PARTITION, order


def test_resolve_conflicts_missing_trust_source_counts_zero(spark):
    # trust frame from an earlier crawl lacks source C: C's facts must
    # stay in the output with support 0, not vanish
    claims = _claims(
        spark,
        [("A", "e1", "p", "x"), ("C", "e1", "p", "y"), ("C", "e9", "p", "z")],
    )
    trust = spark.createDataFrame(
        [("A", 1_000_000)], "source string, trust_micro long"
    )
    out = {(r["subj"], r["obj"]): r for r in resolve_conflicts(claims, trust).collect()}
    assert out[("e1", "x")]["support_micro"] == 1_000_000
    assert ("e9", "z") in out  # fact with ONLY unknown sources survives
    assert out[("e9", "z")]["support_micro"] == 0
    assert out[("e9", "z")]["n_sources"] == 1


class TestFactIntervals:
    def test_gap_splits_runs(self, spark):
        import datetime as dt

        from rdf_diff_store_spark.operators.fusion import fact_intervals

        t = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
        obs = spark.createDataFrame(
            [
                ("e1", "p", "x", t("2024-01-01 00:00:00")),
                ("e1", "p", "x", t("2024-01-02 00:00:00")),  # 1d gap: same run
                ("e1", "p", "x", t("2024-01-10 00:00:00")),  # 8d gap: NEW run
                ("e2", "p", "y", t("2024-01-05 00:00:00")),  # other fact
            ],
            "subj string, pred string, obj string, ts timestamp",
        )
        out = sorted(
            map(tuple, fact_intervals(obs, gap_seconds=3 * 86400).collect())
        )
        d0 = int(t("2024-01-01 00:00:00").timestamp() // 1)  # tz-naive local…
        # compute expected epochs portably from the known NTZ lexicals
        import calendar

        def ep(s):
            return calendar.timegm(t(s).timetuple())

        assert out == sorted(
            [
                ("e1", "p", "x", ep("2024-01-01 00:00:00"), ep("2024-01-02 00:00:00"), 2),
                ("e1", "p", "x", ep("2024-01-10 00:00:00"), ep("2024-01-10 00:00:00"), 1),
                ("e2", "p", "y", ep("2024-01-05 00:00:00"), ep("2024-01-05 00:00:00"), 1),
            ]
        )
        assert d0  # silence lint on the unused local

    def test_one_exchange_total(self, spark):
        import datetime as dt

        from rdf_diff_store_spark.operators.fusion import fact_intervals

        obs = spark.createDataFrame(
            [("e1", "p", "x", dt.datetime(2024, 1, 1))],
            "subj string, pred string, obj string, ts timestamp",
        )
        import re

        plan = (
            fact_intervals(obs, 3600)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
