"""RDFS entailment materialization: each ρdf rule pinned on a
hand-built graph (operators/entailment.py::rdfs_entailment).

The reference evaluates SPARQL over asserted triples only
(/root/reference/src/query.rs:102); this operator is the load-time
closure that makes inherited types visible without per-query
reasoning.
"""

from __future__ import annotations

import pytest

from rdf_diff_store_spark.operators.entailment import (
    ifp_resolve,
    ifp_sameas,
    rdfs_entailment,
    sameas_canonicalize,
    sameas_mapping,
)


def _entail(spark, rows):
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    return {tuple(r) for r in rdfs_entailment(df).collect()}


@pytest.fixture(scope="module")
def closed(spark):
    rows = [
        # T-box: class chain A ⊑ B ⊑ C, property chain p ⊑ q ⊑ r
        ("A", "rdfs:subClassOf", "B"),
        ("B", "rdfs:subClassOf", "C"),
        ("p", "rdfs:subPropertyOf", "q"),
        ("q", "rdfs:subPropertyOf", "r"),
        ("p", "rdfs:domain", "D"),
        ("q", "rdfs:range", "R"),
        ("D", "rdfs:subClassOf", "E"),
        # A-box
        ("x", "p", "y"),
        ("z", "rdf:type", "A"),
    ]
    return _entail(spark, rows)


class TestRdfsRules:
    def test_rdfs11_subclass_transitive(self, closed):
        assert ("A", "rdfs:subClassOf", "C") in closed

    def test_rdfs5_subproperty_transitive(self, closed):
        assert ("p", "rdfs:subPropertyOf", "r") in closed

    def test_rdfs7_property_inheritance(self, closed):
        assert ("x", "q", "y") in closed
        assert ("x", "r", "y") in closed

    def test_rdfs2_domain_types_subject(self, closed):
        assert ("x", "rdf:type", "D") in closed

    def test_rdfs3_range_fires_on_inherited_predicate(self, closed):
        # x q y exists only via rdfs7; range(q)=R must still type y —
        # pins the stratification (rdfs7 widens BEFORE domain/range)
        assert ("y", "rdf:type", "R") in closed

    def test_rdfs9_type_inheritance(self, closed):
        assert ("z", "rdf:type", "B") in closed
        assert ("z", "rdf:type", "C") in closed

    def test_rdfs9_fires_on_domain_minted_type(self, closed):
        # x:D came from rdfs2; D ⊑ E must lift it — pins that rdfs9
        # runs AFTER domain/range minting
        assert ("x", "rdf:type", "E") in closed

    def test_asserted_triples_survive(self, closed):
        assert ("x", "p", "y") in closed
        assert ("z", "rdf:type", "A") in closed

    def test_output_is_distinct(self, spark):
        rows = [
            ("A", "rdfs:subClassOf", "B"),
            ("x", "rdf:type", "A"),
            ("x", "rdf:type", "B"),  # asserted AND derivable
        ]
        df = spark.createDataFrame(rows, ["s", "p", "o"])
        out = rdfs_entailment(df)
        assert out.count() == out.distinct().count()

    def test_cycle_terminates(self, spark):
        # subClassOf cycle: closure must converge, not loop forever
        rows = [
            ("A", "rdfs:subClassOf", "B"),
            ("B", "rdfs:subClassOf", "A"),
            ("x", "rdf:type", "A"),
        ]
        got = _entail(spark, rows)
        assert ("x", "rdf:type", "B") in got
        assert ("A", "rdfs:subClassOf", "A") in got  # cycle closes on itself

    def test_no_schema_is_identity(self, spark):
        rows = [("x", "likes", "y"), ("y", "likes", "z")]
        assert _entail(spark, rows) == set(map(tuple, rows))


def _smush(spark, rows):
    df = spark.createDataFrame(rows, ["s", "p", "o"])
    return {tuple(r) for r in sameas_canonicalize(df).collect()}


class TestSameasCanonicalize:
    def test_chain_converges_on_min_id(self, spark):
        # c sameAs b sameAs a: all facts land on 'a' (the min id)
        rows = [
            ("c", "owl:sameAs", "b"),
            ("b", "owl:sameAs", "a"),
            ("a", "name", "n1"),
            ("b", "email", "e1"),
            ("c", "phone", "t1"),
        ]
        assert _smush(spark, rows) == {
            ("a", "name", "n1"),
            ("a", "email", "e1"),
            ("a", "phone", "t1"),
        }

    def test_object_side_rewritten(self, spark):
        rows = [
            ("b", "owl:sameAs", "a"),
            ("x", "knows", "b"),
        ]
        assert _smush(spark, rows) == {("x", "knows", "a")}

    def test_symmetric_assertions_not_doubled(self, spark):
        # both directions asserted — one class, one representative
        rows = [
            ("a", "owl:sameAs", "b"),
            ("b", "owl:sameAs", "a"),
            ("b", "fact", "v"),
        ]
        assert _smush(spark, rows) == {("a", "fact", "v")}

    def test_sameas_edges_consumed(self, spark):
        rows = [("b", "owl:sameAs", "a"), ("b", "fact", "v")]
        got = _smush(spark, rows)
        assert not any(p == "owl:sameAs" for _, p, _ in got)

    def test_reflexive_sameas_ignored(self, spark):
        rows = [("a", "owl:sameAs", "a"), ("a", "fact", "v")]
        assert _smush(spark, rows) == {("a", "fact", "v")}

    def test_duplicate_facts_collapse(self, spark):
        # same fact asserted about alias AND canonical → one row
        rows = [
            ("b", "owl:sameAs", "a"),
            ("a", "fact", "v"),
            ("b", "fact", "v"),
        ]
        assert _smush(spark, rows) == {("a", "fact", "v")}

    def test_untouched_entities_pass_through(self, spark):
        rows = [
            ("b", "owl:sameAs", "a"),
            ("b", "fact", "v"),
            ("x", "likes", "y"),
        ]
        assert _smush(spark, rows) == {("a", "fact", "v"), ("x", "likes", "y")}

    def test_ifp_shared_value_links_star(self, spark):
        # three accounts share one email: star to the min id, 2 edges
        rows = [
            ("a", "p:email", "m1"),
            ("b", "p:email", "m1"),
            ("c", "p:email", "m1"),
        ]
        df = spark.createDataFrame(rows, ["s", "p", "o"])
        got = {tuple(r) for r in ifp_sameas(df, ["p:email"]).collect()}
        assert got == {("b", "a"), ("c", "a")}

    def test_ifp_non_ifp_predicates_ignored(self, spark):
        rows = [
            ("a", "p:label", "x"),
            ("b", "p:label", "x"),
        ]
        df = spark.createDataFrame(rows, ["s", "p", "o"])
        assert ifp_sameas(df, ["p:email"]).isEmpty()

    def test_ifp_same_value_different_property_no_link(self, spark):
        # value grouping is PER-PROPERTY: email "x" and phone "x" differ
        rows = [
            ("a", "p:email", "x"),
            ("b", "p:phone", "x"),
        ]
        df = spark.createDataFrame(rows, ["s", "p", "o"])
        assert ifp_sameas(df, ["p:email", "p:phone"]).isEmpty()

    def test_ifp_resolve_chains_across_properties(self, spark):
        # a—b share email, b—c share phone → one entity (min id a)
        rows = [
            ("a", "p:email", "m1"),
            ("b", "p:email", "m1"),
            ("b", "p:phone", "t1"),
            ("c", "p:phone", "t1"),
            ("c", "p:label", "L"),
        ]
        df = spark.createDataFrame(rows, ["s", "p", "o"])
        got = {tuple(r) for r in ifp_resolve(df, ["p:email", "p:phone"]).collect()}
        assert got == {
            ("a", "p:email", "m1"),
            ("a", "p:phone", "t1"),
            ("a", "p:label", "L"),
        }

    def test_ifp_resolve_composes_with_asserted_sameas(self, spark):
        # identity via IFP (a—b) AND asserted sameAs (b—z) compose
        rows = [
            ("z", "owl:sameAs", "b"),
            ("a", "p:email", "m1"),
            ("b", "p:email", "m1"),
            ("z", "p:fact", "v"),
        ]
        df = spark.createDataFrame(rows, ["s", "p", "o"])
        got = {tuple(r) for r in ifp_resolve(df, ["p:email"]).collect()}
        assert got == {("a", "p:email", "m1"), ("a", "p:fact", "v")}

    def test_mapping_excludes_identity_rows(self, spark):
        rows = [
            ("c", "owl:sameAs", "b"),
            ("b", "owl:sameAs", "a"),
        ]
        df = spark.createDataFrame(rows, ["s", "p", "o"])
        got = {tuple(r) for r in sameas_mapping(df).collect()}
        assert got == {("b", "a"), ("c", "a")}  # no ('a','a') row


class TestOwlPropertyEntailment:
    """OWL 2 RL prp-inv1/2, prp-symp, prp-trp
    (entailment.py::owl_property_entailment), rule by rule."""

    AXIOMS = [
        ("partOf", "rdf:type", "owl:TransitiveProperty"),
        ("hasPart", "owl:inverseOf", "partOf"),
        ("adj", "rdf:type", "owl:SymmetricProperty"),
    ]

    def _entail(self, spark, rows):
        from rdf_diff_store_spark.operators.entailment import (
            owl_property_entailment,
        )

        df = spark.createDataFrame(rows, ["s", "p", "o"])
        return {tuple(r) for r in owl_property_entailment(df).collect()}

    def test_transitive_closure(self, spark):
        out = self._entail(
            spark, self.AXIOMS + [("a", "partOf", "b"), ("b", "partOf", "c")]
        )
        assert ("a", "partOf", "c") in out

    def test_inverse_both_directions(self, spark):
        out = self._entail(
            spark, self.AXIOMS + [("a", "partOf", "b"), ("c", "hasPart", "d")]
        )
        assert ("b", "hasPart", "a") in out  # prp-inv1
        assert ("d", "partOf", "c") in out  # prp-inv2

    def test_inverse_feeds_closure(self, spark):
        # chain split across the two directions: a partOf b, c hasPart b
        # (i.e. b partOf c) — closure must span the reconstructed chain
        out = self._entail(
            spark, self.AXIOMS + [("a", "partOf", "b"), ("c", "hasPart", "b")]
        )
        assert ("a", "partOf", "c") in out
        assert ("c", "hasPart", "a") in out  # inverse of the closure edge

    def test_symmetric(self, spark):
        out = self._entail(spark, self.AXIOMS + [("x", "adj", "y")])
        assert ("y", "adj", "x") in out
        # adj is NOT transitive: no self-loop from x adj y adj x
        assert ("x", "adj", "x") not in out

    def test_undeclared_property_untouched(self, spark):
        out = self._entail(
            spark, self.AXIOMS + [("a", "likes", "b"), ("b", "likes", "c")]
        )
        assert ("a", "likes", "c") not in out
        assert ("b", "likes", "a") not in out

    def test_fixpoint_idempotent(self, spark):
        from rdf_diff_store_spark.operators.entailment import (
            owl_property_entailment,
        )

        rows = self.AXIOMS + [
            ("a", "partOf", "b"),
            ("c", "hasPart", "b"),
            ("x", "adj", "y"),
        ]
        df = spark.createDataFrame(rows, ["s", "p", "o"])
        once = owl_property_entailment(df)
        twice = owl_property_entailment(once)
        assert {tuple(r) for r in once.collect()} == {
            tuple(r) for r in twice.collect()
        }

    def test_asserted_survive_and_distinct(self, spark):
        rows = self.AXIOMS + [("a", "partOf", "b"), ("a", "partOf", "b")]
        out_df_rows = self._entail(spark, rows)
        assert ("a", "partOf", "b") in out_df_rows
        assert ("partOf", "rdf:type", "owl:TransitiveProperty") in out_df_rows


class TestEntailDelta:
    """Semi-naive incremental maintenance
    (entailment.py::rdfs_entail_delta)."""

    SCHEMA = [
        ("p", "rdfs:domain", "C"),
        ("C", "rdfs:subClassOf", "D"),
    ]

    def _frames(self, spark, old_rows, delta_rows):
        from rdf_diff_store_spark.operators.entailment import rdfs_entailment

        old = spark.createDataFrame(self.SCHEMA + old_rows, ["s", "p", "o"])
        delta = spark.createDataFrame(
            delta_rows, "s string, p string, o string"
        )
        return rdfs_entailment(old), delta

    def test_union_equals_full_closure(self, spark):
        from rdf_diff_store_spark.operators.entailment import (
            rdfs_entail_delta,
            rdfs_entailment,
        )

        old_rows = [("a", "p", "x")]
        delta_rows = [("b", "p", "y")]
        closure, delta = self._frames(spark, old_rows, delta_rows)
        new = rdfs_entail_delta(closure, delta)
        combined = {tuple(r) for r in closure.unionByName(new).collect()}
        full = spark.createDataFrame(
            self.SCHEMA + old_rows + delta_rows, ["s", "p", "o"]
        )
        assert combined == {tuple(r) for r in rdfs_entailment(full).collect()}

    def test_only_new_rows_returned(self, spark):
        from rdf_diff_store_spark.operators.entailment import rdfs_entail_delta

        closure, delta = self._frames(spark, [("a", "p", "x")], [("b", "p", "y")])
        new = {tuple(r) for r in rdfs_entail_delta(closure, delta).collect()}
        assert new == {
            ("b", "p", "y"),
            ("b", "rdf:type", "C"),
            ("b", "rdf:type", "D"),
        }

    def test_redundant_delta_appends_nothing(self, spark):
        from rdf_diff_store_spark.operators.entailment import rdfs_entail_delta

        closure, _ = self._frames(spark, [("a", "p", "x")], [])
        delta = spark.createDataFrame([("a", "p", "x")], ["s", "p", "o"])
        assert rdfs_entail_delta(closure, delta).count() == 0
