"""VoID dataset statistics (operators/void_stats.py): summary counts,
property partitions, class partitions over a triple set."""

from __future__ import annotations

from rdf_diff_store_spark.operators.structured import RDF_TYPE
from rdf_diff_store_spark.operators.void_stats import (
    class_partitions,
    property_partitions,
    void_summary,
)

ROWS = [
    ("e1", RDF_TYPE, "C1"),
    ("e1", RDF_TYPE, "C2"),  # multi-typed entity
    ("e2", RDF_TYPE, "C1"),
    ("e1", "p", "x"),
    ("e1", "p", "x"),  # duplicate row: a graph is a SET
    ("e2", "p", "y"),
    ("e3", "q", "x"),  # untyped subject: not an entity
]


def _t(spark):
    return spark.createDataFrame(ROWS, "subj string, pred string, obj string")


def test_summary(spark):
    r = void_summary(_t(spark)).collect()[0]
    assert r["n_triples"] == 6  # dupe collapsed
    assert r["n_distinct_subjects"] == 3
    assert r["n_properties"] == 3  # rdf:type, p, q
    assert r["n_distinct_objects"] == 4  # C1 C2 x y (x shared by p and q)
    assert r["n_classes"] == 2
    assert r["n_entities"] == 2  # e3 is untyped


def test_property_partitions(spark):
    parts = {r["pred"]: r for r in property_partitions(_t(spark)).collect()}
    assert parts[RDF_TYPE]["n_triples"] == 3
    assert parts[RDF_TYPE]["n_distinct_subjects"] == 2
    assert parts["p"]["n_triples"] == 2  # dupe collapsed
    assert parts["p"]["n_distinct_objects"] == 2
    assert parts["q"]["n_distinct_subjects"] == 1


def test_class_partitions(spark):
    parts = {r["class_iri"]: r["n_entities"] for r in class_partitions(_t(spark)).collect()}
    assert parts == {"C1": 2, "C2": 1}


def test_summary_types_are_long(spark):
    assert all(f.dataType.simpleString() == "bigint" for f in void_summary(_t(spark)).schema)
