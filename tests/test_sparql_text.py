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


# ---------------------------------------------------------------------------
# round-2 surface: GROUP BY / BIND / VALUES / MINUS / EXISTS / paths /
# ASK / CONSTRUCT / nested groups — the rest of the algebra in TEXT form


def test_group_by_count_having(triples):
    q = """
    SELECT ?n (COUNT(?c) AS ?cnt) WHERE {
      ?c <inNation> ?n . FILTER (STRSTARTS(?c, "customer:"))
    } GROUP BY ?n HAVING (COUNT(?c) >= 2)
    """
    rows = sparql_select(triples, q).collect()
    assert rows and all(r.cnt >= 2 for r in rows)
    assert set(sparql_select(triples, q).columns) == {"n", "cnt"}


def test_group_concat_and_sample(triples):
    q = """
    SELECT ?r (GROUP_CONCAT(?name ; SEPARATOR = ",") AS ?members) WHERE {
      ?n <inRegion> ?r ; <name> ?name .
    } GROUP BY ?r
    """
    rows = sparql_select(triples, q).collect()
    assert len(rows) == 5
    members = rows[0].members.split(",")
    assert members == sorted(members)  # deterministic order
    q2 = """
    SELECT ?r (SAMPLE(?name) AS ?one) WHERE {
      ?n <inRegion> ?r ; <name> ?name .
    } GROUP BY ?r
    """
    assert sparql_select(triples, q2).count() == 5


def test_bind_and_projection_expr(triples):
    q = """
    SELECT ?name ?len WHERE {
      ?r <name> ?name . FILTER (STRSTARTS(?r, "region:"))
      BIND (STRLEN(?name) AS ?len)
    }
    """
    rows = sparql_select(triples, q).collect()
    assert all(r.len == len(r.name) for r in rows)


def test_values_inline_data(triples):
    q = """
    SELECT ?r ?name WHERE {
      ?r <name> ?name .
      VALUES ?name { "ASIA" "EUROPE" }
    }
    """
    rows = sparql_select(triples, q).collect()
    assert sorted(r.name for r in rows) == ["ASIA", "EUROPE"]


def test_minus_group(triples):
    q = """
    SELECT ?n WHERE {
      ?n <inRegion> ?r .
      MINUS { ?s <inNation> ?n . FILTER (STRSTARTS(?s, "supplier:")) }
    }
    """
    df = sparql_select(triples, q)
    # parity with the hand-built anti-join query
    import __spark_entry__ as e

    expect = e.queries()["sparql_minus"](df.sparkSession, "/root/testdata/sf0.001").count()
    assert df.count() == expect


def test_filter_exists_and_not_exists(triples):
    q_e = """
    SELECT ?n WHERE {
      ?n <inRegion> ?r .
      FILTER EXISTS { ?c <inNation> ?n . FILTER (STRSTARTS(?c, "customer:")) }
    }
    """
    q_ne = """
    SELECT ?n WHERE {
      ?n <inRegion> ?r .
      FILTER NOT EXISTS { ?c <inNation> ?n . FILTER (STRSTARTS(?c, "customer:")) }
    }
    """
    n_all = sparql_select(triples, "SELECT ?n WHERE { ?n <inRegion> ?r }").count()
    n_e = sparql_select(triples, q_e).count()
    n_ne = sparql_select(triples, q_ne).count()
    assert n_e + n_ne == n_all and n_e > 0


def test_property_path_sequence_and_alt(triples):
    # seq: customer --inNation/inRegion--> region
    q = "SELECT ?c ?r WHERE { ?c <inNation>/<inRegion> ?r . FILTER (STRSTARTS(?c, \"customer:\")) }"
    rows = sparql_select(triples, q).collect()
    assert rows and all(r.r.startswith("region:") for r in rows)
    # alt + inverse
    q2 = "SELECT ?a ?b WHERE { ?a (<nextNation>|^<nextNation>) ?b }"
    n_alt = sparql_select(triples, q2).count()
    n_fwd = sparql_select(triples, "SELECT ?a ?b WHERE { ?a <nextNation> ?b }").count()
    assert n_alt == 2 * n_fwd


def test_property_path_plus_and_star(triples):
    n_plus = sparql_select(
        triples, "SELECT ?a ?b WHERE { ?a <nextNation>+ ?b }"
    ).count()
    n_star = sparql_select(
        triples, "SELECT ?a ?b WHERE { ?a <nextNation>* ?b }"
    ).count()
    n_edges = sparql_select(
        triples, "SELECT ?a ?b WHERE { ?a <nextNation> ?b }"
    ).count()
    assert n_plus > n_edges  # closure found multi-hop pairs
    # zero-length path matches EVERY term in the graph (W3C 18.4),
    # not just the chain nodes
    n_terms = sparql_select(
        triples,
        "SELECT DISTINCT ?t WHERE { { ?t ?p ?o } UNION { ?s ?p2 ?t } }",
    ).count()
    assert n_star == n_plus + n_terms
    # a term with NO p-edges still matches itself through p?
    n_opt = sparql_select(
        triples, "SELECT ?a ?b WHERE { ?a <nextNation>? ?b }"
    ).count()
    assert n_opt == n_edges + n_terms


def test_ask_and_construct(triples):
    from rdf_diff_store_spark.plans.sparql_text import sparql_query

    assert sparql_query(triples, 'ASK { ?r <name> "ASIA" }').first().ask is True
    assert sparql_query(triples, 'ASK { ?r <name> "ATLANTIS" }').first().ask is False
    out = sparql_query(
        triples,
        """
        CONSTRUCT { ?c <inRegionT> ?r } WHERE {
          ?c <inNation> ?n . ?n <inRegion> ?r .
          FILTER (STRSTARTS(?c, "customer:"))
        }
        """,
    )
    assert out.columns == ["subj", "pred", "obj"]
    rows = out.collect()
    assert rows and all(r.pred == "inRegionT" for r in rows)


def test_nested_group_and_union_inside(triples):
    q = """
    SELECT ?who WHERE {
      { ?who <inNation> ?n . FILTER (STRSTARTS(?who, "supplier:")) }
      UNION
      { ?who <inRegion> ?n }
    }
    """
    kinds = {r.who.split(":")[0] for r in sparql_select(triples, q).collect()}
    assert kinds == {"supplier", "nation"}


def test_offset_uses_global_limit_not_window(triples):
    q = """
    SELECT ?name WHERE { ?r <name> ?name . FILTER (STRSTARTS(?name, "NATION_")) }
    ORDER BY ASC(?name) LIMIT 3 OFFSET 2
    """
    df = sparql_select(triples, q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    rows = [r.name for r in df.collect()]
    assert len(rows) == 3 and rows == sorted(rows)


def test_arithmetic_filter_and_if(triples):
    q = """
    SELECT ?c ?flag WHERE {
      ?c <acctbalCents> ?b .
      FILTER (?b / 100 > 9000)
      BIND (IF(?b > 950000, "rich", "ok") AS ?flag)
    }
    """
    rows = sparql_select(triples, q).collect()
    assert rows and all(r.flag in ("rich", "ok") for r in rows)


def test_subquery_in_group(triples):
    """SPARQL 1.1 subquery: aggregate inside, joined to the outer
    pattern on the shared variable."""
    q = """
    SELECT ?nation_name ?n_cust WHERE {
      ?n <name> ?nation_name .
      { SELECT ?n (COUNT(?c) AS ?n_cust) WHERE {
          ?c <inNation> ?n . FILTER (STRSTARTS(?c, "customer:"))
        } GROUP BY ?n }
    }
    """
    rows = sparql_select(triples, q).collect()
    assert rows and all(r.n_cust >= 1 for r in rows)
    assert all(r.nation_name.startswith("NATION_") for r in rows)


def test_describe_text_form(triples):
    from rdf_diff_store_spark.plans.sparql_text import sparql_query

    out = sparql_query(triples, "DESCRIBE <nation:0>")
    rows = out.collect()
    assert rows and all(r.subj == "nation:0" or r.obj == "nation:0" for r in rows)
    import __spark_entry__ as e

    expect = e.queries()["sparql_describe"](out.sparkSession, "/root/testdata/sf0.001").count()
    assert len(rows) == expect


def test_graph_clause_var_and_const(spark):
    """GRAPH ?g binds graph_id; GRAPH <iri> scopes (and pushes the
    filter into the scan)."""
    from rdf_diff_store_spark.plans.sparql_text import sparql_query

    rows = [
        ("g1", "http://e/a", "http://e/p", "1"),
        ("g1", "http://e/b", "http://e/p", "2"),
        ("g2", "http://e/a", "http://e/p", "3"),
    ]
    t = spark.createDataFrame(rows, ["graph_id", "subj", "pred", "obj"])
    q_var = "SELECT ?g ?s ?v WHERE { GRAPH ?g { ?s <http://e/p> ?v } }"
    got = {(r.g, r.s, r.v) for r in sparql_query(t, q_var).collect()}
    assert got == {("g1", "http://e/a", "1"), ("g1", "http://e/b", "2"), ("g2", "http://e/a", "3")}
    q_const = "SELECT ?s ?v WHERE { GRAPH <g2> { ?s <http://e/p> ?v } }"
    got2 = {(r.s, r.v) for r in sparql_query(t, q_const).collect()}
    assert got2 == {("http://e/a", "3")}
    # graph var unifies across patterns in the scope
    q_join = """
    SELECT ?g WHERE { GRAPH ?g { <http://e/a> <http://e/p> ?x .
                                 <http://e/b> <http://e/p> ?y } }
    """
    assert [r.g for r in sparql_query(t, q_join).collect()] == ["g1"]


def test_negated_property_set(spark):
    from rdf_diff_store_spark.plans.sparql_text import sparql_query

    rows = [
        ("g", "a", "knows", "b"),
        ("g", "a", "hates", "c"),
        ("g", "b", "likes", "a"),
    ]
    t = spark.createDataFrame(rows, ["graph_id", "subj", "pred", "obj"])
    got = {(r.s, r.o) for r in sparql_query(t, "SELECT ?s ?o WHERE { ?s !<hates> ?o }").collect()}
    assert got == {("a", "b"), ("b", "a")}
    # !(p|^q): forward not-p plus reversed not-q
    got2 = {
        (r.s, r.o)
        for r in sparql_query(
            t, "SELECT ?s ?o WHERE { ?s !(<hates>|^<likes>) ?o }"
        ).collect()
    }
    assert got2 == {("a", "b"), ("b", "a"), ("b", "a"), ("c", "a")} - {("x", "x")}


def test_sparql_json_response_format(spark, triples):
    import json as _json

    from rdf_diff_store_spark.plans.sparql_text import sparql_json

    doc = _json.loads(
        sparql_json(triples, 'SELECT ?n WHERE { ?n <name> "ASIA" }')
    )
    assert doc["head"]["vars"] == ["n"]
    assert doc["results"]["bindings"][0]["n"]["value"] == "region:2" or doc[
        "results"
    ]["bindings"][0]["n"]["value"].startswith("region:")
    ask = _json.loads(sparql_json(triples, 'ASK { ?r <name> "ASIA" }'))
    assert ask == {"head": {}, "boolean": True}


def test_from_and_from_named_dataset_clause(spark):
    from rdf_diff_store_spark.plans.sparql_text import sparql_query

    rows = [
        ("g1", "a", "p", "1"),
        ("g2", "a", "p", "2"),
        ("g3", "a", "p", "3"),
    ]
    t = spark.createDataFrame(rows, ["graph_id", "subj", "pred", "obj"])
    # FROM merges only the listed graphs into the default graph
    q = "SELECT ?v FROM <g1> FROM <g3> WHERE { ?s <p> ?v }"
    assert sorted(r.v for r in sparql_query(t, q).collect()) == ["1", "3"]
    # FROM NAMED restricts what GRAPH ranges over
    q2 = "SELECT ?g ?v FROM NAMED <g2> WHERE { GRAPH ?g { ?s <p> ?v } }"
    assert [(r.g, r.v) for r in sparql_query(t, q2).collect()] == [("g2", "2")]


def test_substr_replace_builtins(triples):
    q = """
    SELECT ?name ?abbr ?spaced WHERE {
      ?r <name> ?name . FILTER (STRSTARTS(?r, "region:"))
      BIND (SUBSTR(?name, 1, 3) AS ?abbr)
      BIND (REPLACE(?name, "A", "@") AS ?spaced)
    }
    """
    rows = sparql_select(triples, q).collect()
    assert rows and all(r.abbr == r.name[:3] for r in rows)
    assert all(r.spaced == r.name.replace("A", "@") for r in rows)


def test_review_fixes_minus_values_graph_having(spark):
    """Round-2 review regressions: disjoint MINUS keeps rows; VALUES
    UNDEF leaves vars unconstrained; GRAPH after triples parses;
    HAVING with aggregates nested in functions; sparql_json on a var
    named ?ask; REGEX flags."""
    from rdf_diff_store_spark.plans.sparql_text import sparql_json, sparql_query

    rows = [
        ("g1", "a", "p", "x"),
        ("g1", "b", "p", "y"),
        ("g1", "c", "q", "z"),
    ]
    t = spark.createDataFrame(rows, ["graph_id", "subj", "pred", "obj"])
    # MINUS with no shared vars: nothing removed
    q = "SELECT ?s WHERE { ?s <p> ?o . MINUS { ?x <q> ?y } }"
    assert sorted(r.s for r in sparql_query(t, q).collect()) == ["a", "b"]
    # NOT EXISTS with no shared vars: removes everything (inner matches)
    q2 = "SELECT ?s WHERE { ?s <p> ?o . FILTER NOT EXISTS { ?x <q> ?y } }"
    assert sparql_query(t, q2).count() == 0
    # VALUES with UNDEF: unconstrained column
    q3 = 'SELECT ?s ?o WHERE { ?s <p> ?o . VALUES (?s ?o) { ("a" UNDEF) } }'
    assert [(r.s, r.o) for r in sparql_query(t, q3).collect()] == [("a", "x")]
    # GRAPH clause after triple patterns in the same group
    q4 = "SELECT ?s ?v WHERE { ?s <p> ?v . GRAPH <g1> { ?s <q> ?z } }"
    assert sparql_query(t, q4).count() == 0  # no subj has both p and q
    q4b = "SELECT ?s WHERE { ?s <q> ?v . GRAPH <g1> { ?s <q> ?v } }"
    assert [r.s for r in sparql_query(t, q4b).collect()] == ["c"]
    # HAVING with an aggregate inside a function call
    q5 = """
    SELECT ?p (COUNT(?s) AS ?n) WHERE { ?s ?p ?o }
    GROUP BY ?p HAVING (ABS(COUNT(?s)) >= 2)
    """
    got = sparql_query(t, q5).collect()
    assert [(r.p, r.n) for r in got] == [("p", 2)]
    # sparql_json with a variable literally named ?ask
    import json as _json

    doc = _json.loads(sparql_json(t, "SELECT ?ask WHERE { ?ask <p> ?o }"))
    assert "results" in doc and len(doc["results"]["bindings"]) == 2
    # REGEX case-insensitive flag
    q6 = 'SELECT ?s WHERE { ?s <p> ?o . FILTER (REGEX(?o, "^X$", "i")) }'
    assert [r.s for r in sparql_query(t, q6).collect()] == ["a"]
    # REGEX with a variable pattern is SUPPORTED since r03 (regexp_like
    # with a Column pattern) — here ?s never matches ?o so 0 rows, but
    # it evaluates instead of raising
    q7 = "SELECT ?s WHERE { ?s <p> ?o . FILTER (REGEX(?o, ?s)) }"
    assert sparql_query(t, q7).count() == 0
    # flags on a variable pattern stay literal-only (loud otherwise)
    import pytest as _pytest

    from rdf_diff_store_spark.plans.sparql_text import SparqlParseError

    with _pytest.raises(SparqlParseError, match="flags"):
        sparql_query(t, "SELECT ?s WHERE { ?s <p> ?o . FILTER (REGEX(?o, ?s, ?o)) }")


def test_lang_datatype_builtins_and_reduced(spark):
    from rdf_diff_store_spark.plans.sparql_text import sparql_query

    rows = [
        ("g", "s1", "p", "hello", None, "en"),
        ("g", "s2", "p", "hallo", None, "de"),
        ("g", "s3", "p", "42", "http://www.w3.org/2001/XMLSchema#integer", None),
    ]
    t = spark.createDataFrame(
        rows, ["graph_id", "subj", "pred", "obj", "obj_dt", "obj_lang"]
    )
    q = """
    SELECT ?s ?l ?dt WHERE {
      ?s <p> ?o . BIND (LANG(?o) AS ?l) BIND (DATATYPE(?o) AS ?dt)
    }
    """
    got = {(r.s, r.l, r.dt) for r in sparql_query(t, q).collect()}
    assert got == {
        ("s1", "en", None),
        ("s2", "de", None),
        ("s3", "", "http://www.w3.org/2001/XMLSchema#integer"),
    }
    # FILTER on LANG
    q2 = 'SELECT ?s WHERE { ?s <p> ?o . FILTER (LANG(?o) = "en") }'
    assert [r.s for r in sparql_query(t, q2).collect()] == ["s1"]
    # SELECT * strips hidden typing columns
    star = sparql_query(t, "SELECT * WHERE { ?s <p> ?o }")
    assert all(not c.startswith("_") for c in star.columns)
    # REDUCED accepted (deduplicates)
    q3 = "SELECT REDUCED ?p WHERE { ?s ?p ?o }"
    assert sparql_query(t, q3).count() == 1
