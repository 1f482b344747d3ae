"""Pin the r06 vectorized N-Triples fast path in parse_triples to the
full parse_turtle tokenizer: every document shape — strict canonical
lines, escapes, directives, multiline literals, typed/lang literals,
blank/None payloads — must produce the identical triple multiset the
tokenizer produces, because diff()/snapshot_triples() results (and
their DuckDB oracles) ride on it.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from rdf_diff_store_spark.functions.turtle import parse_triples, parse_turtle

TS = datetime.datetime(2024, 1, 5, 12, 0, 0)

DOCS = [
    # strict canonical lines (the fast path)
    '<http://ex.org/user/1> <http://ex.org/value> "123" .',
    "<http://a> <http://b> <http://c> .",
    '<http://a> <http://b> <http://c> .\n<http://a> <http://d> "x y z" .\n',
    '<http://e> <http://f> "" .',  # empty literal
    '<http://g> <http://h> "x> <y" .',  # '>' inside a literal
    "<> <http://p> <relative/iri> .",  # empty/schemeless IRIs, no @base
    # fallback shapes: escapes, lang, datatype, directives, bnodes,
    # multiline literals (incl. a strict-looking inner line), comments
    '<http://a> <http://b> "caf\\u00e9" .',
    '<http://a> <http://b> "hi"@en .',
    '<http://a> <http://b> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '@prefix ex: <http://ex.org/> .\nex:s ex:p "v" .',
    '_:b1 <http://p> "v" .',
    '<http://a> <http://b> """line1 .\n<http://c> <http://d> "inner" .\nline3""" .',
    "# just a comment\n<http://a> <http://b> <http://c> .",
    "<http://a>   <http://b>\t<http://c> .",  # odd whitespace
    "",  # empty payload
    None,  # tombstone
]


def _reference_rows(docs):
    ref = []
    for i, doc in enumerate(docs):
        if doc is None:
            continue
        for s, p, o, dt, lang in parse_turtle(doc):
            ref.append((f"g{i}", TS, s, p, o, dt, lang))
    return sorted(ref, key=lambda r: tuple("" if v is None else str(v) for v in r))


@pytest.fixture(scope="module")
def changelog(spark):
    rows = [(f"g{i}", TS, doc) for i, doc in enumerate(DOCS)]
    return spark.createDataFrame(rows, "graph_id string, ts timestamp, payload string")


def test_fast_path_matches_tokenizer(spark, changelog):
    got = sorted(
        (tuple(r) for r in parse_triples(changelog).collect()),
        key=lambda r: tuple("" if v is None else str(v) for v in r),
    )
    assert got == _reference_rows(DOCS)


def test_fast_path_passthrough(spark, changelog):
    tagged = changelog.withColumn("_side", (F.length("graph_id") % 2).cast("int"))
    got = parse_triples(tagged, passthrough="_side").collect()
    assert all(r["_side"] == len(r["graph_id"]) % 2 for r in got)
    # row multiset unchanged by the passthrough
    assert sorted(
        ((r.graph_id, r.subj, r.pred, r.obj, r.obj_dt, r.obj_lang) for r in got)
    ) == sorted(
        (r[0], r[2], r[3], r[4], r[5], r[6]) for r in _reference_rows(DOCS)
    )


def test_all_null_batch(spark):
    empty = spark.createDataFrame(
        [("g0", TS, None), ("g1", TS, None)],
        "graph_id string, ts timestamp, payload string",
    )
    assert parse_triples(empty).count() == 0
