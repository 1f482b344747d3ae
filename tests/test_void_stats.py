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


def test_characteristic_sets(spark):
    from rdf_diff_store_spark.operators.void_stats import characteristic_sets

    rows = [
        # e1: {a, b} with two b-values (multiplicity)
        ("e1", "b", "x"),
        ("e1", "a", "x"),
        ("e1", "b", "y"),
        ("e1", "b", "y"),  # duplicate row: a graph is a SET
        # e2: {a, b} single each — same CS as e1
        ("e2", "a", "x"),
        ("e2", "b", "x"),
        # e3: {a} alone — its own CS
        ("e3", "a", "z"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    cs = {r["cs_props"]: r for r in characteristic_sets(t).collect()}
    assert set(cs) == {"a b", "a"}  # sorted, space-joined
    assert cs["a b"]["n_subjects"] == 2
    assert cs["a b"]["n_triples"] == 5  # e1: a,b,b(dupe collapsed)=3; e2: 2
    assert cs["a"]["n_subjects"] == 1
    assert cs["a"]["n_triples"] == 1


def test_summary_graph(spark):
    from rdf_diff_store_spark.operators.void_stats import summary_graph

    rows = [
        ("e1", RDF_TYPE, "Person"),
        ("e2", RDF_TYPE, "Person"),
        ("e3", RDF_TYPE, "City"),
        ("e1", "knows", "e2"),
        ("e2", "knows", "e1"),
        ("e1", "livesIn", "e3"),
        ("e2", "livesIn", "e3"),
        ("e2", "livesIn", "e3"),  # duplicate row collapses
        ("e1", "name", "Alice"),  # literal object: drops (untyped)
        ("x9", "knows", "e1"),  # untyped subject: drops
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    s = {(r["src_class"], r["pred"], r["dst_class"]): r for r in summary_graph(t).collect()}
    assert set(s) == {("Person", "knows", "Person"), ("Person", "livesIn", "City")}
    assert s[("Person", "knows", "Person")]["n_edges"] == 2
    assert s[("Person", "knows", "Person")]["n_src_entities"] == 2
    assert s[("Person", "livesIn", "City")]["n_edges"] == 2
    assert s[("Person", "livesIn", "City")]["n_dst_entities"] == 1


def test_summary_graph_multi_typed(spark):
    from rdf_diff_store_spark.operators.void_stats import summary_graph

    rows = [
        ("e1", RDF_TYPE, "A"),
        ("e1", RDF_TYPE, "B"),
        ("e2", RDF_TYPE, "C"),
        ("e1", "p", "e2"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r["src_class"], r["dst_class"]) for r in summary_graph(t).collect()}
    # one summary edge per type combination (quotient-by-type)
    assert got == {("A", "C"), ("B", "C")}


def test_characteristic_sets_rdf_type_included(spark):
    from rdf_diff_store_spark.operators.void_stats import characteristic_sets

    rows = [("e1", RDF_TYPE, "C1"), ("e1", "p", "x")]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    (r,) = characteristic_sets(t).collect()
    # rdf:type participates in the set (the paper keeps it: type is
    # the most selective star predicate)
    assert r["cs_props"] == f"{RDF_TYPE} p"


def test_entity_facts_topk(spark):
    from rdf_diff_store_spark.operators.void_stats import entity_facts_topk

    rows = [
        # pred 'common' appears 4x (rarity 7//4=1), 'rare' once (7//1=7),
        # 'mid' twice (7//2=3)
        ("e1", "common", "a"),
        ("e1", "common", "b"),
        ("e2", "common", "a"),
        ("e3", "common", "a"),
        ("e1", "rare", "x"),
        ("e1", "mid", "m"),
        ("e2", "mid", "m"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = [
        (r["subj"], r["pred"], r["obj"], r["rarity"], r["rank"])
        for r in entity_facts_topk(t, k=2).orderBy("subj", "rank").collect()
    ]
    assert got == [
        ("e1", "rare", "x", 7, 1),  # rarest predicate wins the card
        ("e1", "mid", "m", 3, 2),   # common facts fall off the top-2
        ("e2", "mid", "m", 3, 1),
        ("e2", "common", "a", 1, 2),
        ("e3", "common", "a", 1, 1),
    ]


def test_entity_facts_ties_lexicographic(spark):
    from rdf_diff_store_spark.operators.void_stats import entity_facts_topk

    rows = [("e1", "p", "b"), ("e1", "p", "a")]  # same pred, obj tie-break
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = [(r["obj"], r["rank"]) for r in entity_facts_topk(t, k=2).orderBy("rank").collect()]
    assert got == [("a", 1), ("b", 2)]


def test_star_subject_count_exact(spark):
    from pyspark.sql import functions as F

    from rdf_diff_store_spark.operators.void_stats import (
        characteristic_sets,
        star_subject_count,
    )

    rows = [
        ("e1", "a", "x"), ("e1", "b", "y"),
        ("e2", "a", "x"), ("e2", "b", "y"), ("e2", "c", "z"),
        ("e3", "a", "x"),
        ("e4", "b", "y"), ("e4", "c", "z"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    cs = characteristic_sets(t).localCheckpoint()
    # {a,b} stars: e1 (set ab) + e2 (set abc) = 2 — and NEVER touches t
    assert star_subject_count(cs, ["a", "b"]).first()["n_subjects"] == 2
    assert star_subject_count(cs, ["a"]).first()["n_subjects"] == 3
    assert star_subject_count(cs, ["b", "c"]).first()["n_subjects"] == 2
    assert star_subject_count(cs, ["a", "b", "c"]).first()["n_subjects"] == 1
    assert star_subject_count(cs, ["zzz"]).first()["n_subjects"] == 0
    # ground truth from the data agrees (the ICDE §4.2 exactness claim)
    truth = (
        t.filter(F.col("pred").isin("a", "b"))
        .groupBy("subj").agg(F.countDistinct("pred").alias("k"))
        .filter(F.col("k") == 2).count()
    )
    assert truth == 2
