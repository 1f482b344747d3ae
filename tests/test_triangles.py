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
