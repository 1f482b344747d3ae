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
