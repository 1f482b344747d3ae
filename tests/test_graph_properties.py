"""Property-based invariants of the session-19 graph-structure and
blocking operators over randomized graphs (hypothesis) — the same
robustness net test_versioned_properties.py gives the store ops.

Invariants:

  G1 scc is idempotent: contracting each SCC to its representative
     and re-running yields only singleton components (a condensation
     is a DAG).
  G2 scc labels are a partition refinement of connected_components
     (every SCC lies inside one weakly connected component).
  G3 wedge_overlap: jaccard_micro <= 1e6, cn >= 1, ra_micro <= cn*1e6,
     and pairs are canonical (leaf_a < leaf_b).
  G4 sorted_neighborhood emits exactly sum(min(window, n-1-i)) pairs
     — the definitional count for a window over any total order.
  G5 meta_blocking WNP-pruned edges are a subset of the unpruned CBS
     block graph, and every node keeps its max-weight edge.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rdf_diff_store_spark.operators.blocking import (
    meta_blocking,
    sorted_neighborhood,
)
from rdf_diff_store_spark.operators.graph import (
    connected_components,
    scc,
    wedge_overlap,
)

_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=7)
    ),
    min_size=1,
    max_size=14,
)


@pytest.fixture(scope="module")
def sparksession(spark):
    return spark


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=_edges)
def test_scc_condensation_and_refinement(sparksession, pairs):
    spark = sparksession
    rows = [(f"n{a}", f"n{b}") for a, b in pairs]
    e = spark.createDataFrame(rows, "src string, dst string")
    comp = {r.id: r.scc_id for r in scc(e).collect()}

    # G1: condensation has no nontrivial SCC
    cond = [
        (comp[a], comp[b])
        for a, b in ((f"n{x}", f"n{y}") for x, y in pairs)
        if comp[a] != comp[b]
    ]
    if cond:
        e2 = spark.createDataFrame(cond, "src string, dst string")
        comp2 = {r.id: r.scc_id for r in scc(e2).collect()}
        assert all(k == v for k, v in comp2.items())

    # G2: SCC refines weak connectivity
    wcc = {r.id: r.component for r in connected_components(e).collect()}
    by_scc: dict[str, set] = {}
    for node, s in comp.items():
        by_scc.setdefault(s, set()).add(wcc[node])
    assert all(len(ws) == 1 for ws in by_scc.values())


_bipartite = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4), st.integers(min_value=0, max_value=5)
    ),
    min_size=1,
    max_size=16,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=_bipartite)
def test_wedge_overlap_bounds(sparksession, pairs):
    spark = sparksession
    rows = [(f"c{c}", f"l{x}") for c, x in pairs]
    df = spark.createDataFrame(rows, "center string, leaf string")
    for r in wedge_overlap(df, max_center_degree=100).collect():
        assert r.leaf_a < r.leaf_b
        assert r.cn >= 1
        assert 0 < r.jaccard_micro <= 1_000_000
        assert r.ra_micro <= r.cn * 1_000_000


_keys = st.lists(st.text(alphabet="abc", min_size=1, max_size=3), min_size=1, max_size=9)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=_keys, window=st.integers(min_value=1, max_value=4))
def test_sorted_neighborhood_pair_count(sparksession, keys, window):
    spark = sparksession
    rows = [(f"r{i}", k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id string, key string")
    n = len(rows)
    expect = sum(min(window, n - 1 - i) for i in range(n))
    got = sorted_neighborhood(df, window=window, prefix_len=1).count()
    assert got == expect


_assignments = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4), st.integers(min_value=0, max_value=4)
    ),
    min_size=1,
    max_size=14,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(asg=_assignments)
def test_meta_blocking_pruning_invariants(sparksession, asg):
    spark = sparksession
    rows = [(f"p{i}", f"k{k}") for i, k in asg]
    df = spark.createDataFrame(rows, "id string, block_key string")
    pruned = {(r.id_a, r.id_b): r.cbs for r in meta_blocking(df).collect()}

    # unpruned CBS graph, recomputed in python
    blocks: dict[str, set] = {}
    for i, k in rows:
        blocks.setdefault(k, set()).add(i)
    full: dict[tuple, int] = {}
    for members in blocks.values():
        if len(members) < 2:
            continue
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1 :]:
                full[(a, b)] = full.get((a, b), 0) + 1
    # G5a: subset with identical weights
    assert all(full.get(p) == w for p, w in pruned.items())
    # G5b: every node keeps its max-weight incident edge (>= its own
    # mean, hence WNP keeps it through that endpoint)
    best: dict[str, tuple] = {}
    for (a, b), w in full.items():
        for nd in (a, b):
            if nd not in best or w > best[nd][1]:
                best[nd] = ((a, b), w)
    for nd, (p, _) in best.items():
        assert p in pruned
