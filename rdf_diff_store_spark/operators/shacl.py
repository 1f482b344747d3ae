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


_XSD = "http://www.w3.org/2001/XMLSchema#"

# lexical-space regexes for the validated types — kept inside the
# Java∩RE2 common subset (NO lookaround: RE2 has none), so the DuckDB
# oracle runs the identical patterns
INTEGER_LEX = "^[+-]?[0-9]+$"
DECIMAL_LEX = "^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$"
BOOLEAN_LEX = "^(true|false|1|0)$"
DATE_LEX = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"


def _canon_int(o):
    x = F.regexp_replace(o, "^\\+", "")
    x = F.regexp_replace(x, "^(-?)0+([0-9])", "$1$2")
    return F.when(x == "-0", F.lit("0")).otherwise(x)


def _canon_dec(o):
    x = F.regexp_replace(o, "^\\+", "")
    x = F.regexp_replace(x, "^\\.", "0.")
    x = F.regexp_replace(x, "^-\\.", "-0.")
    x = F.regexp_replace(x, "^(-?)0+([0-9])", "$1$2")
    # trailing fraction zeros, then a bare trailing point (minimal /
    # XSD 1.1-style canonical form)
    x = F.when(
        x.contains("."), F.regexp_replace(x, "(\\.[0-9]*?)0+$", "$1")
    ).otherwise(x)
    x = F.regexp_replace(x, "\\.$", "")
    return F.when(x == "-0", F.lit("0")).otherwise(x)


def validate_literals(
    triples: DataFrame, dt_col: str = "obj_dt", obj_col: str = "obj"
) -> DataFrame:
    """Load-time XSD datatype validation + lexical canonicalization —
    the datatype half of the ingest quality gate (`shacl_validate` is
    the shape half; the reference round-trips literals verbatim and
    never checks them, src/rdf.rs:87-92). Typed-literal corpora arrive
    with non-canonical lexical forms ("007", "+5", "5.10", "1" for true)
    that break exact-match joins and dedup hashes downstream exactly
    like un-normalized Unicode does for text — canonicalize once at
    load.

    Adds two columns: `dt_valid` (lexical form ∈ the datatype's
    lexical space — cast-verified for dates, so 2023-02-29 fails) and
    `canonical` (minimal canonical form; NULL when invalid or when the
    datatype isn't one of integer/decimal/boolean/date — unvalidated
    types pass through with dt_valid = NULL, loud and filterable).

    Map-only JVM projection: regex checks + replace chains in
    whole-stage codegen, zero shuffles at any corpus size. Integer
    canonicalization is pure string surgery (no numeric cast), so
    values beyond 64-bit range canonicalize correctly."""
    o, dt = F.col(obj_col), F.col(dt_col)
    is_int = dt == f"{_XSD}integer"
    is_dec = dt == f"{_XSD}decimal"
    is_bool = dt == f"{_XSD}boolean"
    is_date = dt == f"{_XSD}date"
    date_ok = o.rlike(DATE_LEX) & o.try_cast("date").isNotNull()
    valid = (
        F.when(is_int, o.rlike(INTEGER_LEX))
        .when(is_dec, o.rlike(DECIMAL_LEX))
        .when(is_bool, o.rlike(BOOLEAN_LEX))
        .when(is_date, date_ok)
    )
    canon = (
        F.when(is_int, _canon_int(o))
        .when(is_dec, _canon_dec(o))
        .when(is_bool, F.when(o.isin("true", "1"), F.lit("true")).otherwise(F.lit("false")))
        .when(is_date, o)
    )
    return triples.withColumn("dt_valid", valid).withColumn(
        "canonical", F.when(valid, canon)
    )
