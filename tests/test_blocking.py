"""Meta-blocking (operators/blocking.py::meta_blocking; Papadakis et
al. TKDE 2014) — CBS weighting and WNP pruning pinned on hand-built
block assignments with closed-form answers."""

from __future__ import annotations

from rdf_diff_store_spark.operators.blocking import meta_blocking


def _run(spark, assignments, **kw):
    df = spark.createDataFrame(assignments, "id string, block_key string")
    return {
        (r.id_a, r.id_b): r.cbs for r in meta_blocking(df, **kw).collect()
    }


def test_cbs_counts_shared_blocks(spark):
    out = _run(
        spark,
        [("A", "k1"), ("B", "k1"), ("A", "k2"), ("B", "k2"), ("B", "k3"), ("C", "k3")],
    )
    assert out == {("A", "B"): 2, ("B", "C"): 1}


def test_wnp_prunes_below_both_node_means(spark):
    # A-B:3, A-C:3, B-C:1 -> thr A=3e6, B=2e6, C=2e6; (B,C) fails both
    asg = []
    for k in ("x1", "x2", "x3"):
        asg += [("A", k), ("B", k)]
    for k in ("y1", "y2", "y3"):
        asg += [("A", k), ("C", k)]
    asg += [("B", "z"), ("C", "z")]
    # make the shared AB/AC blocks weight exactly 3 and BC weight 1
    out = _run(spark, asg)
    assert out == {("A", "B"): 3, ("A", "C"): 3}


def test_edge_survives_if_either_endpoint_keeps_it(spark):
    # A-B:3, A-C:1 -> thr A=2e6, C=1e6: (A,C) fails A but passes C
    asg = [("A", k) for k in ("x1", "x2", "x3")] + [
        ("B", k) for k in ("x1", "x2", "x3")
    ] + [("A", "y"), ("C", "y")]
    out = _run(spark, asg)
    assert out == {("A", "B"): 3, ("A", "C"): 1}


def test_block_purging_drops_oversize_and_singleton_blocks(spark):
    asg = (
        [(i, "huge") for i in ("A", "B", "C", "D")]  # purged at cap 3
        + [("A", "solo")]                             # singleton: mints nothing
        + [("A", "ok"), ("B", "ok")]
    )
    out = _run(spark, asg, max_block_size=3)
    assert out == {("A", "B"): 1}


def test_duplicate_assignments_collapse(spark):
    out = _run(spark, [("A", "k"), ("A", "k"), ("B", "k")])
    assert out == {("A", "B"): 1}


class TestSortedNeighborhood:
    def _pairs(self, spark, rows, **kw):
        from rdf_diff_store_spark.operators.blocking import sorted_neighborhood

        df = spark.createDataFrame(rows, "id string, key string")
        return sorted(
            (r.id_a, r.id_b) for r in sorted_neighborhood(df, **kw).collect()
        )

    def test_window_pairs_match_definition(self, spark):
        rows = [("r1", "aa"), ("r2", "ab"), ("r3", "ba"), ("r4", "bb")]
        # sort order r1 r2 r3 r4; window 2 pairs: 12 13 23 24 34
        assert self._pairs(spark, rows, window=2, prefix_len=1) == [
            ("r1", "r2"), ("r1", "r3"), ("r2", "r3"), ("r2", "r4"), ("r3", "r4")
        ]

    def test_pairs_cross_bucket_boundaries(self, spark):
        # prefix buckets 'a' and 'b': the (r2, r3) pair crosses them
        rows = [("r1", "a1"), ("r2", "a2"), ("r3", "b1")]
        assert ("r2", "r3") in self._pairs(spark, rows, window=1, prefix_len=1)

    def test_key_ties_break_by_id(self, spark):
        rows = [("rB", "k"), ("rA", "k"), ("rC", "k")]
        assert self._pairs(spark, rows, window=1, prefix_len=1) == [
            ("rA", "rB"), ("rB", "rC")
        ]

    def test_no_duplicate_pairs_across_band_shifts(self, spark):
        rows = [(f"r{i:02d}", f"k{i:02d}") for i in range(20)]
        pairs = self._pairs(spark, rows, window=3, prefix_len=2)
        assert len(pairs) == len(set(pairs))
        assert len(pairs) == 3 * 20 - (1 + 2 + 3)  # band-edge exactness


class TestContainmentScores:
    def _run(self, spark, assignments, max_df=20):
        from rdf_diff_store_spark.operators.dedup import containment_scores

        df = spark.createDataFrame(assignments, "doc_id long, fp string")
        return {
            (r.doc_a, r.doc_b): (
                r.inter, r.size_a, r.size_b, r.containment_pct
            )
            for r in containment_scores(df, max_df=max_df).collect()
        }

    def test_subset_copy_scores_100_where_jaccard_is_low(self, spark):
        # doc 2 (big) fully contains doc 1 (small): containment 100,
        # while Jaccard would be 3/10 = 30
        asg = [(1, f"f{i}") for i in range(3)] + [(2, f"f{i}") for i in range(10)]
        out = self._run(spark, asg)
        assert out[(1, 2)] == (3, 3, 10, 100)

    def test_denominator_counts_uncapped_fps(self, spark):
        # 'stop' is in 3 docs > max_df=2: purged from the intersection
        # but still counted in every set size (conservative undercount)
        asg = [
            (1, "stop"), (1, "x"),
            (2, "stop"), (2, "x"),
            (3, "stop"),
        ]
        out = self._run(spark, asg, max_df=2)
        assert out == {(1, 2): (1, 2, 2, 50)}

    def test_no_shared_fp_no_row(self, spark):
        out = self._run(spark, [(1, "a"), (2, "b")])
        assert out == {}
