"""Deterministic Turtle-subset parse / canonicalize / serialize.

The reference delegates RDF handling to oxigraph and an external
"prettifier" HTTP canonicalizer; the *canonical form* of a document is
its deduplication key — a write is a no-op iff the prettified text is
byte-identical to the stored file (reference: src/graphs.rs:52-61,
src/rdf.rs:29-84). We reproduce that contract with a pure, versioned,
locale-independent function: parse a pragmatic Turtle subset into
triples and re-serialize as sorted N-Triples. Same input → same bytes,
every time, on every executor (the input_hint invariant).

The parser covers what the reference's own tests exercise
(reference: tests/integration_test.rs:21-31 — @prefix lines, one
subject, predicate lists with ';', string literals) plus IRIs,
prefixed names, blank nodes, @lang tags, ^^ datatypes, ',' object
lists, and multi-statement documents. It is intentionally NOT a full
Turtle grammar (no collections, no multiline literals) — the engine's
relational core never depends on it; it only feeds ingest.

Execution model: the per-document work runs inside Arrow-batched
pandas UDFs (see `canonicalize_udf` / `parse_triples`), so Python cost
is amortized per batch, mirroring the reference's own lesson that one
bulk load beats per-graph parsing (reference: src/query.rs:132-134).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CANONICALIZER_VERSION = "1"

_PREFIX_RE = re.compile(r"^@prefix\s+([A-Za-z0-9_\-]*):\s*<([^>]*)>\s*\.\s*$")
_TOKEN_RE = re.compile(
    r"""
    (?P<iri><[^>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^<[^>]*>|\^\^[A-Za-z0-9_\-]*:[^\s;,.]+)?)
  | (?P<bnode>_:[A-Za-z0-9_\-]+)
  | (?P<pname>[A-Za-z0-9_\-]*:[^\s;,."]*)
  | (?P<kw>\ba\b)
  | (?P<punct>[;,.])
    """,
    re.VERBOSE,
)

_ESCAPES = {"\\n": "\n", "\\t": "\t", "\\r": "\r", '\\"': '"', "\\\\": "\\"}
_UNESCAPE_RE = re.compile(r"\\[ntr\"\\]")


def _unescape(s: str) -> str:
    return _UNESCAPE_RE.sub(lambda m: _ESCAPES[m.group(0)], s)


def _escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )


def parse_turtle(doc: str) -> list[tuple[str, str, str, str | None, str | None]]:
    """Parse a Turtle-subset document into triples.

    Returns tuples ``(subj, pred, obj, obj_dt, obj_lang)`` with IRIs in
    expanded ``<...>``-stripped form, blank nodes as ``_:label``, and
    literals as their lexical value (datatype/lang carried separately).
    Raises ValueError on text outside the supported subset.
    """
    prefixes: dict[str, str] = {}
    triples: list[tuple[str, str, str, str | None, str | None]] = []
    # Statements are '.'-terminated but '.' can occur inside IRIs and
    # literals, so tokenize line-wise first for @prefix, then stream
    # tokens for the triple statements.
    body_lines = []
    for line in doc.split("\n"):
        stripped = line.strip()
        if not stripped or stripped.startswith("#"):
            continue
        m = _PREFIX_RE.match(stripped)
        if m:
            prefixes[m.group(1)] = m.group(2)
        else:
            body_lines.append(stripped)
    body = "\n".join(body_lines)

    def expand(pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in prefixes:
            raise ValueError(f"unknown prefix {pfx!r}")
        return prefixes[pfx] + local

    def term(tok: re.Match) -> tuple[str, str | None, str | None]:
        """→ (value, datatype, lang); datatype None for IRIs/bnodes."""
        if tok.lastgroup == "iri":
            return tok.group("iri")[1:-1], None, None
        if tok.lastgroup == "bnode":
            return tok.group("bnode"), None, None
        if tok.lastgroup == "pname":
            return expand(tok.group("pname")), None, None
        if tok.lastgroup == "kw":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", None, None
        if tok.lastgroup == "literal":
            lit = tok.group("literal")
            m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9\-]+)|\^\^<([^>]*)>|\^\^([A-Za-z0-9_\-]*:[^\s;,.]+))?$', lit)
            if not m:
                raise ValueError(f"bad literal {lit!r}")
            value = _unescape(m.group(1))
            lang = m.group(2)
            dt = m.group(3) or (expand(m.group(4)) if m.group(4) else None)
            return value, dt or ("__literal__" if not lang else None), lang
        raise ValueError(f"unsupported token {tok.group(0)!r}")

    toks = [t for t in _TOKEN_RE.finditer(body)]
    # Reject documents with unlexable content — silently dropping text
    # would break the byte-identical canonical-form contract.
    covered = bytearray(len(body))
    for t in toks:
        for i in range(t.start(), t.end()):
            covered[i] = 1
    leftover = "".join(ch for ch, c in zip(body, covered) if not c and not ch.isspace())
    if leftover:
        raise ValueError(f"unparseable Turtle content: {leftover[:80]!r}")
    i, n = 0, len(toks)
    while i < n:
        subj, _, _ = term(toks[i])
        i += 1
        while True:  # predicate groups separated by ';'
            if i >= n:
                raise ValueError("truncated statement (expected predicate)")
            pred, _, _ = term(toks[i])
            i += 1
            while True:  # object list separated by ','
                if i >= n:
                    raise ValueError("truncated statement (expected object)")
                obj, dt, lang = term(toks[i])
                i += 1
                is_literal = dt is not None or lang is not None
                if dt == "__literal__":
                    dt = "http://www.w3.org/2001/XMLSchema#string"
                triples.append((subj, pred, obj if not is_literal else obj, dt, lang))
                if i < n and toks[i].lastgroup == "punct" and toks[i].group(0) == ",":
                    i += 1
                    continue
                break
            if i < n and toks[i].lastgroup == "punct" and toks[i].group(0) == ";":
                i += 1
                # trailing ';' before '.' is legal Turtle
                if i < n and toks[i].lastgroup == "punct" and toks[i].group(0) == ".":
                    i += 1
                    break
                continue
            if i < n and toks[i].lastgroup == "punct" and toks[i].group(0) == ".":
                i += 1
                break
            raise ValueError("expected ';' ',' or '.'")
    return triples


def serialize_triple(subj: str, pred: str, obj: str, obj_dt: str | None, obj_lang: str | None) -> str:
    """One N-Triples line, deterministic."""
    s = subj if subj.startswith("_:") else f"<{subj}>"
    p = f"<{pred}>"
    if obj_dt is None and obj_lang is None:
        o = obj if obj.startswith("_:") else f"<{obj}>"
    else:
        o = f'"{_escape(obj)}"'
        if obj_lang:
            o += f"@{obj_lang}"
        elif obj_dt and obj_dt != "http://www.w3.org/2001/XMLSchema#string":
            o += f"^^<{obj_dt}>"
    return f"{s} {p} {o} ."


def canonicalize(doc: str | None) -> str | None:
    """Canonical byte form of a Turtle document: parse → sort → emit
    sorted N-Triples. This is the prettifier analog (reference:
    src/rdf.rs:29-84) and the idempotence key (src/graphs.rs:52-61):
    pure function of the payload, byte-identical across runs.
    """
    if doc is None:
        return None
    lines = sorted(serialize_triple(*t) for t in parse_turtle(doc))
    return "\n".join(lines) + ("\n" if lines else "")


@F.pandas_udf(T.StringType())
def canonicalize_udf(docs: pd.Series) -> pd.Series:
    """Arrow-vectorized canonicalizer (no per-row Python at the Spark
    API level; the regex work is amortized per Arrow batch)."""
    return docs.map(lambda d: canonicalize(d) if d is not None else None)


_TRIPLES_OUT_SCHEMA = (
    "graph_id string, ts timestamp, subj string, pred string, "
    "obj string, obj_dt string, obj_lang string"
)


def parse_triples(changelog: DataFrame) -> DataFrame:
    """Explode canonical payloads into triple rows.

    mapInPandas bulk parse — the Spark translation of the reference's
    "combine then bulk-load beats per-graph parsing" tactic
    (reference: src/query.rs:128-139): each Arrow batch of documents
    is parsed in one Python call, output is columnar.

    Input: changelog-like rows (graph_id, ts, payload[, ...]).
    Output: (graph_id, ts, subj, pred, obj, obj_dt, obj_lang).
    """

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in ("graph_id", "ts", "subj", "pred", "obj", "obj_dt", "obj_lang")}
            for gid, ts, payload in zip(pdf["graph_id"], pdf["ts"], pdf["payload"]):
                if payload is None:
                    continue
                for s, p, o, dt, lang in parse_turtle(payload):
                    out["graph_id"].append(gid)
                    out["ts"].append(ts)
                    out["subj"].append(s)
                    out["pred"].append(p)
                    out["obj"].append(o)
                    out["obj_dt"].append(dt)
                    out["obj_lang"].append(lang)
            pdf_out = pd.DataFrame(out)
            # all-null ts infers float64, which Arrow can't cast to
            # timestamp — coerce explicitly
            pdf_out["ts"] = pd.to_datetime(pdf_out["ts"])
            yield pdf_out

    return changelog.select("graph_id", "ts", "payload").mapInPandas(_parse, _TRIPLES_OUT_SCHEMA)


def serialize_graph(triples: DataFrame) -> DataFrame:
    """Per-graph canonical Turtle text — the snapshot-as-document path
    (reference: src/rdf.rs:87-92 to_turtle + prettify). Deterministic:
    lines are built JVM-side with concat and sorted inside the group.

    Input: triples (graph_id, subj, pred, obj, obj_dt, obj_lang).
    Output: (graph_id, doc string).
    """
    line = F.concat(
        F.when(F.col("subj").startswith("_:"), F.col("subj")).otherwise(F.concat(F.lit("<"), F.col("subj"), F.lit(">"))),
        F.lit(" <"),
        F.col("pred"),
        F.lit("> "),
        F.when(
            F.col("obj_dt").isNull() & F.col("obj_lang").isNull(),
            F.when(F.col("obj").startswith("_:"), F.col("obj")).otherwise(
                F.concat(F.lit("<"), F.col("obj"), F.lit(">"))
            ),
        ).otherwise(
            F.concat(
                F.lit('"'),
                # escape set must match _escape byte-for-byte (\\ " \n \r \t)
                # or the canonical-form/content-hash contract breaks
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.regexp_replace(
                                F.regexp_replace(F.col("obj"), r"\\", r"\\\\"), '"', '\\\\"'
                            ),
                            "\n",
                            r"\\n",
                        ),
                        "\r",
                        r"\\r",
                    ),
                    "\t",
                    r"\\t",
                ),
                F.lit('"'),
                F.when(F.col("obj_lang").isNotNull(), F.concat(F.lit("@"), F.col("obj_lang")))
                .when(
                    F.col("obj_dt").isNotNull()
                    & (F.col("obj_dt") != "http://www.w3.org/2001/XMLSchema#string"),
                    F.concat(F.lit("^^<"), F.col("obj_dt"), F.lit(">")),
                )
                .otherwise(F.lit("")),
            )
        ),
        F.lit(" ."),
    )
    return (
        triples.select("graph_id", line.alias("line"))
        .groupBy("graph_id")
        .agg(F.array_join(F.array_sort(F.collect_list("line")), "\n").alias("doc"))
    )
