"""Property-based equivalence: randomly generated SPARQL SELECT
strings must produce the same bindings as the hand-built algebra plan
for the same (patterns, filters) — the parser can't silently drop or
reorder semantics."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rdf_diff_store_spark.plans.algebra import Var, bgp
from rdf_diff_store_spark.plans.sparql_text import sparql_select

PREDS = ["p", "q", "r"]
NODES = [f"n{i}" for i in range(6)]


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("g", NODES[i], PREDS[(i * 7 + j) % 3], NODES[(i + j) % 6])
        for i in range(6)
        for j in range(4)
    ]
    return spark.createDataFrame(
        sorted(set(rows)), ["graph_id", "subj", "pred", "obj"]
    ).localCheckpoint()


# a pattern: (s, p, o) where s/o are var indices or constants
_pattern = st.tuples(
    st.one_of(st.sampled_from(["?a", "?b", "?c"]), st.sampled_from(NODES)),
    st.sampled_from(PREDS),
    st.one_of(st.sampled_from(["?a", "?b", "?c"]), st.sampled_from(NODES)),
)


def _term(t):
    return Var(t[1:]) if t.startswith("?") else t


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_pattern, min_size=1, max_size=3))
def test_text_query_matches_algebra(triples, patterns):
    # require at least one variable so SELECT has a projection, and
    # ensure pattern connectivity isn't required (cross joins are legal)
    vars_ = sorted({t[1:] for p in patterns for t in (p[0], p[2]) if t.startswith("?")})
    if not vars_:
        patterns = [("?a", patterns[0][1], patterns[0][2])] + list(patterns[1:])
        vars_ = ["a"]
    body = " . ".join(
        f"{s if s.startswith('?') else f'<{s}>'} <{p}> {o if o.startswith('?') else f'<{o}>'}"
        for s, p, o in patterns
    )
    q = f"SELECT {' '.join('?' + v for v in vars_)} WHERE {{ {body} }}"
    got = sparql_select(triples, q)

    expected = bgp(triples, [(_term(s), p, _term(o)) for s, p, o in patterns])
    # project to the same columns; _match appears when a pattern binds
    # nothing — the text form can't produce that (vars_ is non-empty)
    expected = expected.select(*[F.col(v) for v in vars_])

    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
