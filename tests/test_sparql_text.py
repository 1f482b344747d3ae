"""SPARQL SELECT text front-end: query strings (the reference's actual
interface — /api/sparql?query=...) compiled onto the algebra layer."""

from __future__ import annotations

import pytest

from rdf_diff_store_spark.plans.sparql_text import SparqlParseError, sparql_select
from rdf_diff_store_spark.sources.relational import triples_from_tpch


@pytest.fixture(scope="module")
def triples(spark, sf_dir):
    return triples_from_tpch(spark, sf_dir).localCheckpoint()


def test_bgp_with_prefix_and_literal(spark, triples):
    q = """
    SELECT ?c ?n WHERE {
      ?c <inNation> ?n .
      ?n <inRegion> ?r .
      ?r <name> "ASIA" .
    }
    """
    # our triple view uses bare strings for preds; IRI brackets strip to them
    rows = sparql_select(triples, q).collect()
    assert len(rows) > 0
    assert all(r.n.startswith("nation:") for r in rows)
    # parity with the hand-built query
    import __spark_entry__ as e

    expect = e.queries()["sparql_bgp_join"](spark, "/root/testdata/sf0.001").count()
    got = sparql_select(triples, q)
    assert got.filter(got.c.startswith("customer:")).count() == expect


def test_predicate_object_lists_and_filter(triples):
    q = """
    SELECT ?n ?name WHERE {
      ?n <inRegion> ?r ; <name> ?name .
      FILTER (REGEX(?name, "^NATION_1[0-9]$") && ?r != "region:0")
    }
    ORDER BY ?name LIMIT 5
    """
    rows = sparql_select(triples, q).collect()
    assert 0 < len(rows) <= 5
    assert all(r.name.startswith("NATION_1") for r in rows)
    names = [r.name for r in rows]
    assert names == sorted(names)


def test_optional_block(triples):
    q = """
    SELECT ?n ?next WHERE {
      ?n <inRegion> ?r .
      OPTIONAL { ?n <nextNation> ?next }
    }
    """
    rows = sparql_select(triples, q).collect()
    assert len(rows) == 25  # every nation kept
    unmatched = [r for r in rows if r.next is None]
    assert len(unmatched) == 5  # one chain tail per region
    # FILTER inside OPTIONAL: restricts the optional side only
    q2 = """
    SELECT ?n ?s WHERE {
      ?n <inRegion> ?r .
      OPTIONAL { ?s <inNation> ?n . FILTER (STRSTARTS(?s, "supplier:")) }
    }
    """
    rows2 = sparql_select(triples, q2).collect()
    matched = [r for r in rows2 if r.s is not None]
    assert all(r.s.startswith("supplier:") for r in matched)
    assert {r.n for r in rows2} == {r.n for r in rows}  # all nations kept


def test_union_groups(triples):
    q = """
    SELECT ?who ?n WHERE {
      { ?who <inNation> ?n . FILTER (STRSTARTS(?who, "supplier:")) }
      UNION
      { ?who <inRegion> ?n }
    }
    """
    rows = sparql_select(triples, q).collect()
    kinds = {r.who.split(":")[0] for r in rows}
    assert kinds == {"supplier", "nation"}
    assert len(rows) > 25


def test_numeric_filter_and_distinct(triples):
    q = """
    SELECT DISTINCT ?c WHERE {
      ?c <acctbalCents> ?b .
      FILTER (?b >= 900000)
    }
    """
    df = sparql_select(triples, q)
    assert df.columns == ["c"]
    n_rich = df.count()
    q_all = "SELECT DISTINCT ?c WHERE { ?c <acctbalCents> ?b }"
    assert 0 < n_rich < sparql_select(triples, q_all).count()


def test_order_offset_limit(triples):
    q = """
    SELECT ?name WHERE { ?r <name> ?name . FILTER (STRSTARTS(?name, "NATION_")) }
    ORDER BY ASC(?name) LIMIT 3 OFFSET 2
    """
    rows = [r.name for r in sparql_select(triples, q).collect()]
    all_sorted = sorted(
        r.name
        for r in sparql_select(
            triples, 'SELECT ?name WHERE { ?r <name> ?name . FILTER (STRSTARTS(?name, "NATION_")) }'
        ).collect()
    )
    assert rows == all_sorted[2:5]


def test_prefixed_names(spark):
    rows = [("http://ex.org/a", "http://ex.org/knows", "http://ex.org/b")]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    q = """
    PREFIX ex: <http://ex.org/>
    SELECT ?x WHERE { ?x ex:knows ex:b }
    """
    assert [r.x for r in sparql_select(t, q).collect()] == ["http://ex.org/a"]


def test_parse_errors_are_clean(triples):
    for bad in [
        "SELECT WHERE { ?a ?b ?c }",
        "SELECT ?x WHERE { ?x <p> }",
        "SELECT ?x WHERE { ?x <p> ?y } GARBAGE",
        "SELECT ?missing WHERE { ?x <p> ?y }",
    ]:
        with pytest.raises(SparqlParseError):
            sparql_select(triples, bad).collect()
