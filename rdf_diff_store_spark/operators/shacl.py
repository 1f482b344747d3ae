"""SHACL-lite shape validation over a (s, p, o) triple frame.

Reference context: rdf-diff-store accepts any syntactically valid
Turtle and stores it verbatim — the only gate is the parser
(`/root/reference/src/rdf.rs:87-92` dumps the store back out
unchanged; `/root/reference/src/query.rs:136` re-parses per query).
There is no shape-level quality gate, so malformed entities (missing
required properties, dangling class references) flow straight through
to every downstream consumer. A web-scale KG-construction pipeline
(north_star: "materialization of quads into partitioned tables")
validates shapes ONCE at load time instead; this module is that gate,
covering the SHACL core constraints that don't need full node-shape
recursion: sh:minCount, sh:maxCount, sh:class, sh:pattern
(https://www.w3.org/TR/shacl/ §4).

Data model
----------
`shapes` is a tiny declarative frame — one row per constraint:

    (shape_id, target_class, path, constraint, value)

where `constraint` ∈ {minCount, maxCount, class, pattern} and `value`
is the constraint parameter as a string (count, class IRI, or regex).
Focus nodes are the subjects typed `rdf:type target_class` (SHACL
targetClass semantics, instances-of only — no rdfs:subClassOf
widening; compose with `rdfs_entailment` first when inheritance
should count).

The report frame lists VIOLATIONS only:

    (focus, shape_id, path, constraint, expected, actual)

`expected` is the constraint value; `actual` is the measured count
(minCount/maxCount) or the offending object value (class/pattern).
Conforming graphs produce an empty frame — the cheap "is it clean"
predicate is `shacl_validate(...).isEmpty()`.

Scale shape
-----------
The shapes frame is human-authored (dozens to thousands of rows) and
is BROADCAST into every join; the triple stream is only ever filtered
by constrained predicate before it shuffles, so each cardinality
check costs one partial-agg count shuffle over the *constrained*
facts, not the corpus, and the value checks (class/pattern) are a
broadcast join plus one anti-join against the rdf:type slice. Nothing
in the plan scales with shapes × triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "rdf:type"

_REPORT_COLS = ("focus", "shape_id", "path", "constraint", "expected", "actual")


def _targets(triples: DataFrame, shapes: DataFrame) -> DataFrame:
    """(shape_id, target_class, focus) — instances of each shape's
    target class. Shapes side broadcast; one row per (shape, focus)."""
    typed = triples.filter(F.col("p") == RDF_TYPE).select(
        F.col("s").alias("focus"), F.col("o").alias("_cls")
    )
    shape_targets = shapes.select("shape_id", "target_class").distinct()
    return typed.join(
        F.broadcast(shape_targets),
        typed["_cls"] == shape_targets["target_class"],
    ).select("shape_id", "target_class", "focus")


def shacl_validate(triples: DataFrame, shapes: DataFrame) -> DataFrame:
    """Validate `triples` against `shapes`; return the violation report.

    Constraint semantics (SHACL core, path = one direct predicate):
      minCount n — focus must have ≥ n values of path (absent = 0).
      maxCount n — focus must have ≤ n values of path.
      class C    — every value of path at focus must be typed
                   `rdf:type C` in the same graph.
      pattern re — every value of path at focus must fully or
                   partially match `re` (SHACL pattern = partial
                   match, anchor explicitly for full match).
    """
    targets = _targets(triples, shapes).localCheckpoint(eager=True)

    card = shapes.filter(F.col("constraint").isin("minCount", "maxCount"))
    value_class = shapes.filter(F.col("constraint") == "class")
    value_pattern = shapes.filter(F.col("constraint") == "pattern")

    reports = []

    # --- cardinality: count constrained facts per (focus, path) -----
    card_rows = card.count()
    if card_rows:
        paths = [r[0] for r in card.select("path").distinct().collect()]
        counts = (
            triples.filter(F.col("p").isin(paths))
            .groupBy(F.col("s").alias("focus"), F.col("p").alias("path"))
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        # left join: a focus with NO fact of the path still violates minCount
        per_focus = (
            targets.join(F.broadcast(card), "shape_id")
            .join(counts, ["focus", "path"], "left")
            .withColumn("_cnt", F.coalesce(F.col("_cnt"), F.lit(0)))
        )
        bad = per_focus.filter(
            F.when(
                F.col("constraint") == "minCount",
                F.col("_cnt") < F.col("value").cast("long"),
            ).otherwise(F.col("_cnt") > F.col("value").cast("long"))
        )
        reports.append(
            bad.select(
                "focus",
                "shape_id",
                "path",
                "constraint",
                F.col("value").alias("expected"),
                F.col("_cnt").cast("string").alias("actual"),
            )
        )

    # --- facts at focus nodes, per value-constraint row -------------
    def _constrained_facts(constraint_rows: DataFrame) -> DataFrame:
        facts = triples.join(
            F.broadcast(constraint_rows.select("shape_id", "path", "value")),
            triples["p"] == F.col("path"),
        ).select(
            F.col("s").alias("focus"), "shape_id", "path", "value",
            F.col("o").alias("actual"),
        )
        return facts.join(targets.select("shape_id", "focus"), ["shape_id", "focus"])

    # --- class: object must carry rdf:type <value> -------------------
    if value_class.count():
        typed = triples.filter(F.col("p") == RDF_TYPE).select(
            F.col("s").alias("_onode"), F.col("o").alias("_ocls")
        )
        facts = _constrained_facts(value_class)
        bad = facts.join(
            typed,
            (F.col("actual") == F.col("_onode")) & (F.col("_ocls") == F.col("value")),
            "left_anti",
        )
        reports.append(
            bad.select(
                "focus", "shape_id", "path",
                F.lit("class").alias("constraint"),
                F.col("value").alias("expected"),
                "actual",
            )
        )

    # --- pattern: object must match the regex ------------------------
    if value_pattern.count():
        facts = _constrained_facts(value_pattern)
        bad = facts.filter(~F.regexp_like(F.col("actual"), F.col("value")))
        reports.append(
            bad.select(
                "focus", "shape_id", "path",
                F.lit("pattern").alias("constraint"),
                F.col("value").alias("expected"),
                "actual",
            )
        )

    if not reports:
        # no applicable constraints — empty report with the full schema
        empty = triples.sparkSession.createDataFrame([], schema=", ".join(
            f"{c} string" for c in _REPORT_COLS
        ))
        return empty

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
