"""N-Quads source/sink — the line-oriented RDF dataset dump format
(W3C N-Quads, RDF 1.1). This is the format web-scale KG corpora
actually ship in: Web Data Commons publishes its Common-Crawl
structured-data extraction as N-Quads, and a versioned graph store's
"whole dataset" export (every named graph in one file set) needs the
4th (graph-label) term the reference's per-graph Turtle files
(reference: src/git.rs:24-41, one file per graph id) encode in the
FILENAME instead.

Why line-oriented matters at 100 TB: one statement per line means the
format splits on newlines — Spark's text source assigns arbitrary
byte ranges to tasks and every split is a valid parse boundary, so a
multi-TB dump parallelizes with NO container index (contrast WARC's
Content-Length framing, sources/warc.py). That property drives the
design here:

* ``nquad_line(...)`` — the SINK is a pure JVM expression (escape
  chain + term formation in whole-stage codegen, map-only, zero
  Python at any scale).
* ``parse_nquads(...)`` — the SOURCE is one Arrow hop
  (``mapInPandas`` over a strict per-line regex), the same shape as
  the Turtle bulk parser (functions/turtle.py::parse_triples);
  numeric ``\\uXXXX`` unescaping keeps it out of pure-JVM reach.

Terms follow the same conventions as functions/turtle.py: IRIs
bare-expanded, blank nodes ``_:label``, literal lexical values with
datatype/lang carried in separate columns, xsd:string elided.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_diff_store_spark.functions.turtle import _unescape

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _escape_jvm(col: Column) -> Column:
    """N-Triples string-literal escaping as a JVM literal-replace
    chain (backslash FIRST — it is the escape introducer)."""
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def _iri_or_bnode(col: Column) -> Column:
    return F.when(col.startswith("_:"), col).otherwise(
        F.concat(F.lit("<"), col, F.lit(">"))
    )


def nquad_line(
    subj: Column,
    pred: Column,
    obj: Column,
    obj_dt: Column,
    obj_lang: Column,
    graph: Column,
) -> Column:
    """One N-Quads statement line (no trailing newline) as a pure JVM
    expression. NULL graph → triple in the default graph (the graph
    term is simply omitted, per spec §2). The object is a literal
    iff obj_dt or obj_lang is set (turtle.py::serialize_triple's
    contract, reference src/rdf.rs:29-84); xsd:string is elided."""
    lit_term = F.concat(F.lit('"'), _escape_jvm(obj), F.lit('"'))
    lit_term = F.when(obj_lang.isNotNull(), F.concat(lit_term, F.lit("@"), obj_lang)).otherwise(
        F.when(
            obj_dt.isNotNull() & (obj_dt != XSD_STRING),
            F.concat(lit_term, F.lit("^^<"), obj_dt, F.lit(">")),
        ).otherwise(lit_term)
    )
    o = F.when(obj_dt.isNotNull() | obj_lang.isNotNull(), lit_term).otherwise(
        _iri_or_bnode(obj)
    )
    head = F.concat(
        _iri_or_bnode(subj), F.lit(" <"), pred, F.lit("> "), o
    )
    return F.when(
        graph.isNotNull(),
        F.concat(head, F.lit(" "), _iri_or_bnode(graph), F.lit(" .")),
    ).otherwise(F.concat(head, F.lit(" .")))


def serialize_nquads(triples: DataFrame, graph_col: str = "graph_id") -> DataFrame:
    """(graph_id, subj, pred, obj, obj_dt, obj_lang) → one `line` per
    statement, ready for ``df.write.text`` (the whole sink is map-only
    whole-stage codegen)."""
    return triples.select(
        nquad_line(
            F.col("subj"),
            F.col("pred"),
            F.col("obj"),
            F.col("obj_dt"),
            F.col("obj_lang"),
            F.col(graph_col),
        ).alias("line")
    )


# one statement per line: subject, predicate, object term, optional
# graph label, terminating dot
_LINE_RE = re.compile(
    r"^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+"
    r"(<[^>]*>|_:\S+|\"(?:[^\"\\]|\\.)*\"(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)"
    r"(?:\s+(<[^>]*>|_:\S+))?\s*\.\s*$"
)
_LIT_RE = re.compile(
    r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?$'
)


def parse_nquad_line(line: str) -> tuple | None:
    """(graph, subj, pred, obj, obj_dt, obj_lang) for one statement
    line; None for blank/comment lines; ValueError on a malformed
    statement (loud, like parse_turtle)."""
    if not line.strip() or line.lstrip().startswith("#"):
        return None
    m = _LINE_RE.match(line)
    if not m:
        raise ValueError(f"not an N-Quads statement: {line[:80]!r}")
    s_raw, pred, o_raw, g_raw = m.groups()
    subj = s_raw[1:-1] if s_raw.startswith("<") else s_raw
    graph = None
    if g_raw is not None:
        graph = g_raw[1:-1] if g_raw.startswith("<") else g_raw
    if o_raw.startswith('"'):
        lm = _LIT_RE.match(o_raw)
        if not lm:
            raise ValueError(f"bad literal term: {o_raw[:80]!r}")
        obj, lang, dt = _unescape(lm.group(1)), lm.group(2), lm.group(3)
        # plain literal → xsd:string, matching parse_turtle's convention
        # (functions/turtle.py::_literal_parts)
        if dt is None and lang is None:
            dt = XSD_STRING
        return (graph, subj, pred, obj, dt, lang)
    obj = o_raw[1:-1] if o_raw.startswith("<") else o_raw
    return (graph, subj, pred, obj, None, None)


_PARSED_SCHEMA = (
    "graph_id string, subj string, pred string, obj string, "
    "obj_dt string, obj_lang string"
)


def parse_nquads(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Bulk-parse a column of N-Quads text (one statement per row, or
    whole multi-line chunks — both split identically because the
    format is line-delimited) into triple rows. ONE Arrow hop, the
    parse_triples shape; compose with ``spark.read.text(path)`` for
    the file source, where Spark's newline splits give parallelism
    for free."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("graph_id", "subj", "pred", "obj", "obj_dt", "obj_lang")
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for chunk in pdf[line_col]:
                if chunk is None:
                    continue
                for line in chunk.split("\n"):
                    t = parse_nquad_line(line)
                    if t is None:
                        continue
                    for k, v in zip(cols, t):
                        out[k].append(v)
            yield pd.DataFrame(out)

    return df.select(line_col).mapInPandas(_parse, _PARSED_SCHEMA)
