"""Property-table pivot + vertical partitions (operators/layout.py)."""

from __future__ import annotations

from rdf_diff_store_spark.operators.layout import property_table, vertical_partitions

ROWS = [
    ("e1", "name", "Alice"),
    ("e1", "email", "a@x"),
    ("e1", "email", "b@x"),  # multi-valued
    ("e2", "name", "Bob"),
]


def test_pivot_shape_and_multivalue(spark):
    df = spark.createDataFrame(ROWS, ["s", "p", "o"])
    out = {r.s: r for r in property_table(df, ["email", "name"]).collect()}
    assert out["e1"].email == "a@x,b@x"  # sorted, deterministic
    assert out["e1"].name == "Alice"
    assert out["e2"].email is None  # absent predicate is NULL, not ''
    assert out["e2"].name == "Bob"


def test_pivot_discovers_vocabulary(spark):
    df = spark.createDataFrame(ROWS, ["s", "p", "o"])
    cols = property_table(df).columns
    assert cols == ["s", "email", "name"]  # discovered, sorted


def test_multivalue_order_is_input_order_proof(spark):
    df1 = spark.createDataFrame(ROWS, ["s", "p", "o"])
    df2 = spark.createDataFrame(list(reversed(ROWS)), ["s", "p", "o"]).repartition(7)
    a = sorted(map(tuple, property_table(df1, ["email", "name"]).collect()))
    b = sorted(map(tuple, property_table(df2, ["email", "name"]).collect()))
    assert a == b


def test_vertical_partitions(spark):
    df = spark.createDataFrame(ROWS, ["s", "p", "o"])
    parts = vertical_partitions(df)
    assert set(parts) == {"email", "name"}
    assert sorted(map(tuple, parts["email"].collect())) == [
        ("e1", "a@x"),
        ("e1", "b@x"),
    ]


def test_pivot_single_exchange(spark):
    df = spark.createDataFrame(ROWS, ["s", "p", "o"])
    plan = (
        property_table(df, ["email", "name"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
