"""SDType type inference (operators/type_inference.py): integer
confidence weights from the typed population, weighted vote with
deterministic argmax for untyped entities."""

from __future__ import annotations

from rdf_diff_store_spark.operators.structured import RDF_TYPE
from rdf_diff_store_spark.operators.type_inference import (
    infer_types,
    predicate_class_weights,
)

# typed population: a, b are Person (both use knows; a also name);
# c is Org (uses name and locatedIn)
ROWS = [
    ("a", RDF_TYPE, "Person"),
    ("b", RDF_TYPE, "Person"),
    ("c", RDF_TYPE, "Org"),
    ("a", "knows", "b"),
    ("a", "name", "ada"),
    ("b", "knows", "a"),
    ("c", "name", "acme"),
    ("c", "locatedIn", "oslo"),
    # untyped entities to infer
    ("d", "knows", "a"),
    ("e", "locatedIn", "bergen"),
    ("f", "name", "thing"),
]


def _t(spark, rows=None):
    return spark.createDataFrame(
        rows or ROWS, "subj string, pred string, obj string"
    )


def test_weights_hand_computed(spark):
    w = {
        (r["pred"], r["cls"]): (r["w_micro"], r["n_support"])
        for r in predicate_class_weights(_t(spark)).collect()
    }
    # knows used by a,b,d (3 entities), typed users: a,b Person → 2/3
    assert w[("knows", "Person")] == (666_666, 2)
    # name used by a,c,f (3), Person:a → 1/3, Org:c → 1/3
    assert w[("name", "Person")] == (333_333, 1)
    assert w[("name", "Org")] == (333_333, 1)
    # locatedIn used by c,e (2), Org:c → 1/2
    assert w[("locatedIn", "Org")] == (500_000, 1)
    assert ("knows", "Org") not in w


def test_inference_and_deterministic_ties(spark):
    out = {r["subj"]: r for r in infer_types(_t(spark)).collect()}
    assert out["d"]["inferred_type"] == "Person"
    assert out["d"]["score_micro"] == 666_666
    assert out["e"]["inferred_type"] == "Org"
    # f uses only 'name': Person vs Org tie at 333333 → 'Org' (lex)
    assert out["f"]["inferred_type"] == "Org"
    # typed entities never appear in the output
    assert set(out) == {"d", "e", "f"}


def test_min_support_drops_rare_pairs(spark):
    w = predicate_class_weights(_t(spark), min_support=2).collect()
    assert {(r["pred"], r["cls"]) for r in w} == {("knows", "Person")}


def test_window_partitioned_and_weights_broadcast(spark):
    df = infer_types(_t(spark))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert line.count("], [") == 2
