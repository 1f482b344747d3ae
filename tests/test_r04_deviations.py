"""Round-4 deviation closures: term-level sameTerm and constant-arg
STRLANG/STRDT typed-literal constructors in scalar expressions.

Closes two of the three r03 "documented deviations" (VERDICT r03
§What's-missing #3): sameTerm now compares the lang/datatype tags, and
STRLANG/STRDT with constant args fold to typed-literal constants usable
in FILTER =/!=, sameTerm, and (numeric datatypes) ordering/arithmetic.
Reference surface: oxigraph's SPARQL 1.1 §17.4.1.8 sameTerm and
§17.4.2.8-9 STRLANG/STRDT (exposed via rdf-diff-store's query endpoint,
/root/reference/src/lib.rs:331-372).
"""

from __future__ import annotations

import pytest

TYPED_SCHEMA = (
    "graph_id string, subj string, pred string, obj string, "
    "obj_lang string, obj_dt string"
)
XSD = "http://www.w3.org/2001/XMLSchema#"
PFX = f"PREFIX xsd: <{XSD[:-1]}#> "


@pytest.fixture(scope="module")
def term_triples(spark):
    rows = [
        ("g", "b1", "label", "hi", "en", None),
        ("g", "b2", "label", "hi", "de", None),
        # parse_triples normalizes SIMPLE literals to explicit
        # xsd:string (functions/turtle.py:156) — on a typed view
        # NULL/NULL typing means IRI/bnode, never a literal
        # (TestSameTermIriness pins that contract)
        ("g", "c1", "label", "hi", None, XSD + "string"),  # simple literal
        ("g", "d1", "label", "hi", None, XSD + "string"),  # ≡ simple (RDF 1.1)
        ("g", "n1", "count", "42", None, XSD + "integer"),
        ("g", "n2", "count", "7", None, XSD + "integer"),
    ]
    return spark.createDataFrame(rows, TYPED_SCHEMA)


def _q(t, q):
    from rdf_diff_store_spark.plans.sparql_text import sparql_query

    return sparql_query(t, q)


class TestSameTermTermLevel:
    def test_lang_tag_distinguishes(self, term_triples):
        rows = _q(
            term_triples,
            'SELECT ?s WHERE { ?s <label> ?o . FILTER(sameTerm(?o, "hi"@en)) }',
        ).collect()
        assert {r.s for r in rows} == {"b1"}

    def test_simple_and_xsd_string_are_same_term(self, term_triples):
        """RDF 1.1: "hi" and "hi"^^xsd:string are the SAME term."""
        rows = _q(
            term_triples,
            'SELECT ?s WHERE { ?s <label> ?o . FILTER(sameTerm(?o, "hi")) }',
        ).collect()
        assert {r.s for r in rows} == {"c1", "d1"}

    def test_var_var_sameterm_compares_tags(self, term_triples):
        rows = _q(
            term_triples,
            "SELECT ?a ?b WHERE { ?a <label> ?x . ?b <label> ?y . "
            "FILTER(sameTerm(?x, ?y) && ?a < ?b) }",
        ).collect()
        # identical lexical "hi" everywhere; only the simple/xsd:string
        # pair is term-identical (lang-tagged b1/b2 differ from all)
        assert {(r.a, r.b) for r in rows} == {("c1", "d1")}

    def test_typed_literal_arg(self, term_triples):
        rows = _q(
            term_triples,
            PFX
            + 'SELECT ?s WHERE { ?s <count> ?o . '
            '  FILTER(sameTerm(?o, "42"^^xsd:integer)) }',
        ).collect()
        assert {r.s for r in rows} == {"n1"}


class TestTypedCtorConstants:
    def test_strlang_constant_in_sameterm(self, term_triples):
        rows = _q(
            term_triples,
            'SELECT ?s WHERE { ?s <label> ?o . '
            '  FILTER(sameTerm(?o, STRLANG("hi", "en"))) }',
        ).collect()
        assert {r.s for r in rows} == {"b1"}

    def test_strdt_constant_in_equality(self, term_triples):
        rows = _q(
            term_triples,
            PFX
            + 'SELECT ?s WHERE { ?s <count> ?o . '
            '  FILTER(?o = STRDT("42", xsd:integer)) }',
        ).collect()
        assert {r.s for r in rows} == {"n1"}

    def test_strdt_numeric_ordering(self, term_triples):
        rows = _q(
            term_triples,
            PFX
            + 'SELECT ?s WHERE { ?s <count> ?o . '
            '  FILTER(?o > STRDT("10", xsd:decimal)) }',
        ).collect()
        assert {r.s for r in rows} == {"n1"}

    def test_strdt_in_arithmetic(self, term_triples):
        rows = _q(
            term_triples,
            PFX
            + 'SELECT ?s WHERE { ?s <count> ?o . '
            '  FILTER(?o + STRDT("3", xsd:integer) = 10) }',
        ).collect()
        assert {r.s for r in rows} == {"n2"}

    def test_dynamic_strlang_in_sameterm_now_works(self, term_triples):
        """r04 session 5 closed the old "dynamic ctor only in BIND"
        deviation for term comparisons: sameTerm(?o, STRLANG(?o, "en"))
        keeps exactly the en-tagged literals (value trivially equal,
        constructed lang "en", dt NULL). TestDynamicCtorComparisons in
        test_typed_literals.py pins the remaining raise (ORDER BY /
        nested scalar positions)."""
        rows = _q(
            term_triples,
            "SELECT ?s WHERE { ?s <label> ?o . "
            '  FILTER(sameTerm(?o, STRLANG(?o, "en"))) }',
        ).collect()
        assert {r.s for r in rows} == {"b1"}


class TestXsdStringEqualityNormalized:
    def test_explicit_xsd_string_matches_simple(self, term_triples):
        rows = _q(
            term_triples,
            PFX
            + 'SELECT ?s WHERE { ?s <label> ?o . '
            '  FILTER(?o = "hi"^^xsd:string) }',
        ).collect()
        assert {r.s for r in rows} == {"c1", "d1"}
