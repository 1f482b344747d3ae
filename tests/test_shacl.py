"""SHACL-lite validation: each constraint kind pinned on a hand-built
graph (operators/shacl.py::shacl_validate).

The reference's only ingest gate is the Turtle parser
(/root/reference/src/rdf.rs:87-92); shape validation is the load-time
quality gate a web-scale KG adds.
"""

from __future__ import annotations

import pytest

from rdf_diff_store_spark.operators.shacl import shacl_validate

TRIPLES = [
    # alice: conforming Person
    ("alice", "rdf:type", "Person"),
    ("alice", "p:email", "mail:alice"),
    ("alice", "p:in_nation", "nat:1"),
    # bob: missing email (minCount), TWO phones (maxCount)
    ("bob", "rdf:type", "Person"),
    ("bob", "p:phone", "tel:1"),
    ("bob", "p:phone", "tel:2"),
    ("bob", "p:in_nation", "nat:1"),
    # carol: email fails the pattern, nation not typed (class)
    ("carol", "rdf:type", "Person"),
    ("carol", "p:email", "bad email"),
    ("carol", "p:in_nation", "nat:999"),
    # dave: not a Person — never a focus node, violates nothing
    ("dave", "rdf:type", "Robot"),
    ("dave", "p:phone", "tel:3"),
    ("dave", "p:phone", "tel:4"),
    # the typed nation
    ("nat:1", "rdf:type", "Nation"),
]

SHAPES = [
    ("sh1", "Person", "p:email", "minCount", "1"),
    ("sh1", "Person", "p:phone", "maxCount", "1"),
    ("sh1", "Person", "p:in_nation", "class", "Nation"),
    ("sh1", "Person", "p:email", "pattern", "^mail:[a-z]+$"),
]


@pytest.fixture(scope="module")
def report(spark):
    t = spark.createDataFrame(TRIPLES, ["s", "p", "o"])
    sh = spark.createDataFrame(
        SHAPES, ["shape_id", "target_class", "path", "constraint", "value"]
    )
    rows = shacl_validate(t, sh).collect()
    return {tuple(r) for r in rows}


class TestShaclValidate:
    def test_report_is_exactly_the_violations(self, report):
        # carol HAS an email ("bad email"), so her minCount=1 is
        # satisfied — she fails pattern, not cardinality
        assert report == {
            ("bob", "sh1", "p:email", "minCount", "1", "0"),
            ("bob", "sh1", "p:phone", "maxCount", "1", "2"),
            ("carol", "sh1", "p:in_nation", "class", "Nation", "nat:999"),
            ("carol", "sh1", "p:email", "pattern", "^mail:[a-z]+$", "bad email"),
        }

    def test_non_target_nodes_ignored(self, report):
        assert not any(f == "dave" for f, *_ in report)

    def test_conforming_graph_empty_report(self, spark):
        t = spark.createDataFrame(
            [
                ("a", "rdf:type", "Person"),
                ("a", "p:email", "mail:a"),
                ("a", "p:in_nation", "nat:1"),
                ("nat:1", "rdf:type", "Nation"),
            ],
            ["s", "p", "o"],
        )
        sh = spark.createDataFrame(
            SHAPES, ["shape_id", "target_class", "path", "constraint", "value"]
        )
        assert shacl_validate(t, sh).isEmpty()

    def test_no_constraints_empty_report_with_schema(self, spark):
        t = spark.createDataFrame([("a", "p", "b")], ["s", "p", "o"])
        sh = spark.createDataFrame(
            [], "shape_id string, target_class string, path string, "
            "constraint string, value string"
        )
        out = shacl_validate(t, sh)
        assert out.columns == [
            "focus", "shape_id", "path", "constraint", "expected", "actual"
        ]
        assert out.isEmpty()


class TestValidateLiterals:
    """XSD datatype validation + canonicalization
    (shacl.py::validate_literals)."""

    XSD = "http://www.w3.org/2001/XMLSchema#"

    def _run(self, spark, rows):
        from rdf_diff_store_spark.operators.shacl import validate_literals

        df = spark.createDataFrame(
            [("s", "p", o, self.XSD + t) for o, t in rows],
            ["s", "p", "obj", "obj_dt"],
        )
        out = validate_literals(df).collect()
        return {(r.obj, r.obj_dt.split("#")[1]): (r.dt_valid, r.canonical) for r in out}

    def test_integer_canonicalization(self, spark):
        got = self._run(
            spark,
            [("42", "integer"), ("007", "integer"), ("+13", "integer"),
             ("-0", "integer"), ("-042", "integer"), ("4a", "integer"),
             ("99999999999999999999999", "integer")],
        )
        assert got[("42", "integer")] == (True, "42")
        assert got[("007", "integer")] == (True, "7")
        assert got[("+13", "integer")] == (True, "13")
        assert got[("-0", "integer")] == (True, "0")
        assert got[("-042", "integer")] == (True, "-42")
        assert got[("4a", "integer")] == (False, None)
        # beyond 64-bit: string surgery, no numeric cast
        assert got[("99999999999999999999999", "integer")] == (
            True, "99999999999999999999999",
        )

    def test_decimal_canonicalization(self, spark):
        got = self._run(
            spark,
            [("5.10", "decimal"), ("00.50", "decimal"), (".5", "decimal"),
             ("5.", "decimal"), ("-.50", "decimal"), ("1..2", "decimal"),
             ("10", "decimal"), ("0.000", "decimal")],
        )
        assert got[("5.10", "decimal")] == (True, "5.1")
        assert got[("00.50", "decimal")] == (True, "0.5")
        assert got[(".5", "decimal")] == (True, "0.5")
        assert got[("5.", "decimal")] == (True, "5")
        assert got[("-.50", "decimal")] == (True, "-0.5")
        assert got[("1..2", "decimal")] == (False, None)
        assert got[("10", "decimal")] == (True, "10")
        assert got[("0.000", "decimal")] == (True, "0")

    def test_boolean_and_date(self, spark):
        got = self._run(
            spark,
            [("1", "boolean"), ("0", "boolean"), ("maybe", "boolean"),
             ("2024-02-29", "date"), ("2023-02-29", "date"),
             ("2024-13-01", "date"), ("24-1-2", "date")],
        )
        assert got[("1", "boolean")] == (True, "true")
        assert got[("0", "boolean")] == (True, "false")
        assert got[("maybe", "boolean")] == (False, None)
        assert got[("2024-02-29", "date")] == (True, "2024-02-29")  # leap year
        assert got[("2023-02-29", "date")] == (False, None)  # not a leap year
        assert got[("2024-13-01", "date")] == (False, None)
        assert got[("24-1-2", "date")] == (False, None)  # loose form rejected

    def test_unvalidated_types_pass_through_loudly(self, spark):
        got = self._run(spark, [("x", "string"), ("P1D", "duration")])
        assert got[("x", "string")] == (None, None)
        assert got[("P1D", "duration")] == (None, None)
