"""Degree-orientation triangle counting (operators/graph.py::
triangle_count) — model-pinned on hand graphs where the census is
known in closed form."""

from __future__ import annotations

from rdf_diff_store_spark.operators.graph import triangle_count


def _count(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r.node: (r.degree, r.n_triangles) for r in triangle_count(df).collect()}


def test_single_triangle(spark):
    out = _count(spark, [(1, 2), (2, 3), (3, 1)])
    assert out == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


def test_k4_every_node_in_three(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = _count(spark, k4)
    assert out == {n: (3, 3) for n in range(4)}


def test_square_has_none(spark):
    out = _count(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert all(t == 0 for _, t in out.values())


def test_direction_duplicates_selfloops_ignored(spark):
    messy = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (2, 2)]
    out = _count(spark, messy)
    assert out == {1: (2, 1), 2: (2, 1), 3: (2, 1)}


def test_hub_star_plus_one_closing_edge(spark):
    # star 0-{1..6} has no triangles; closing (1,2) makes exactly one
    star = [(0, i) for i in range(1, 7)]
    out = _count(spark, star)
    assert all(t == 0 for _, t in out.values())
    out2 = _count(spark, star + [(1, 2)])
    assert out2[0] == (6, 1) and out2[1] == (2, 1) and out2[2] == (2, 1)
    assert out2[3] == (1, 0)


def test_two_disjoint_triangles(spark):
    out = _count(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10)])
    assert sum(t for _, t in out.values()) == 6  # each triangle counted at 3 nodes


class TestKcore:
    """kcore_peel (operators/graph.py) — peel dynamics pinned by hand."""

    def _core(self, spark, pairs, k, rounds=None):
        from rdf_diff_store_spark.operators.graph import kcore_peel

        df = spark.createDataFrame(pairs, "src long, dst long")
        return {r.node: r.degree for r in kcore_peel(df, k, rounds=rounds).collect()}

    def test_triangle_is_its_own_2core(self, spark):
        out = self._core(spark, [(1, 2), (2, 3), (3, 1)], 2)
        assert out == {1: 2, 2: 2, 3: 2}

    def test_pendant_chain_needs_two_rounds(self, spark):
        # K4 core; mid 10 has degree 2 (= k) via core + leaf 20:
        # round 1 peels leaf 20, round 2 peels mid 10 (degree fell to 1)
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        g = k4 + [(0, 10), (10, 20)]
        one_round = self._core(spark, g, 2, rounds=1)
        assert 10 in one_round and 20 not in one_round
        converged = self._core(spark, g, 2)
        assert converged == {n: 3 for n in range(4)}

    def test_k_too_high_empties_graph(self, spark):
        out = self._core(spark, [(1, 2), (2, 3), (3, 1)], 3)
        assert out == {}

    def test_extra_rounds_are_noops(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        assert self._core(spark, k4, 2, rounds=5) == self._core(spark, k4, 2)


class TestWlGraphHash:
    """Blank-node-robust graph hashing (operators/graph.py::
    wl_graph_hash, 1-WL color refinement)."""

    def _hash(self, spark, rows, rounds=2):
        df = spark.createDataFrame(rows, "graph_id string, subj string, pred string, obj string")
        from rdf_diff_store_spark.operators.graph import wl_graph_hash

        return {r["graph_id"]: r["graph_hash"] for r in wl_graph_hash(df, rounds).collect()}

    def test_blank_relabel_invariant(self, spark):
        rows = [
            ("g1", "s", "p", "_:a"),
            ("g1", "_:a", "q", "lit"),
            ("g2", "s", "p", "_:zzz"),  # same structure, different label
            ("g2", "_:zzz", "q", "lit"),
        ]
        h = self._hash(spark, rows)
        assert h["g1"] == h["g2"]

    def test_ground_term_change_detected(self, spark):
        rows = [
            ("g1", "s", "p", "_:a"),
            ("g1", "_:a", "q", "lit"),
            ("g2", "s", "p", "_:a"),
            ("g2", "_:a", "q", "DIFFERENT"),
        ]
        h = self._hash(spark, rows)
        assert h["g1"] != h["g2"]

    def test_structural_change_detected(self, spark):
        rows = [
            ("g1", "s", "p", "_:a"),
            ("g1", "_:a", "q", "lit"),
            ("g2", "s", "p", "_:a"),
            ("g2", "_:a", "q", "lit"),
            ("g2", "_:a", "q", "lit2"),  # extra edge on the blank
        ]
        h = self._hash(spark, rows)
        assert h["g1"] != h["g2"]

    def test_two_distinguishable_blanks(self, spark):
        # blank chain _:a -> _:b needs round 2 to separate from the
        # relabeled mirror where the chain direction flips
        rows = [
            ("g1", "_:a", "p", "_:b"),
            ("g1", "_:b", "q", "x"),
            ("g2", "_:u", "p", "_:v"),
            ("g2", "_:v", "q", "x"),
            ("g3", "_:u", "p", "_:v"),
            ("g3", "_:u", "q", "x"),  # q hangs off the OTHER blank
        ]
        h = self._hash(spark, rows)
        assert h["g1"] == h["g2"]
        assert h["g1"] != h["g3"]

    def test_duplicate_rows_are_set(self, spark):
        rows = [
            ("g1", "s", "p", "_:a"),
            ("g1", "s", "p", "_:a"),  # duplicate collapses
            ("g1", "_:a", "q", "lit"),
            ("g2", "s", "p", "_:a"),
            ("g2", "_:a", "q", "lit"),
        ]
        h = self._hash(spark, rows)
        assert h["g1"] == h["g2"]

    def test_ground_only_graph(self, spark):
        rows = [("g1", "s", "p", "o"), ("g2", "s", "p", "o")]
        h = self._hash(spark, rows)
        assert h["g1"] == h["g2"]

    def test_automorphic_blanks_agree(self, spark):
        # two parallel indistinguishable blanks: 1-WL keeps them the
        # same color — isomorphic graphs must STILL hash equal
        rows = [
            ("g1", "s", "p", "_:a"),
            ("g1", "s", "p", "_:b"),
            ("g2", "s", "p", "_:x"),
            ("g2", "s", "p", "_:y"),
        ]
        h = self._hash(spark, rows)
        assert h["g1"] == h["g2"]


class TestClusteringCoefficient:
    def test_triangle_is_fully_clustered(self, spark):
        from rdf_diff_store_spark.operators.graph import clustering_coefficient

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "src long, dst long"
        )
        out = {r.node: r.cc_micro for r in clustering_coefficient(df).collect()}
        assert out == {1: 1_000_000, 2: 1_000_000, 3: 1_000_000}

    def test_star_center_and_leaves_score_zero(self, spark):
        from rdf_diff_store_spark.operators.graph import clustering_coefficient

        df = spark.createDataFrame(
            [(0, i) for i in (1, 2, 3)], "src long, dst long"
        )
        out = {r.node: r.cc_micro for r in clustering_coefficient(df).collect()}
        assert out == {0: 0, 1: 0, 2: 0, 3: 0}

    def test_partial_wedge_closure(self, spark):
        from rdf_diff_store_spark.operators.graph import clustering_coefficient

        # K3 plus pendant on node 1: node 1 has deg 3, 1 triangle ->
        # 2*1e6 // (3*2) = 333333
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (1, 4)], "src long, dst long"
        )
        out = {r.node: r.cc_micro for r in clustering_coefficient(df).collect()}
        assert out[1] == 333333 and out[4] == 0
        assert out[2] == out[3] == 1_000_000
