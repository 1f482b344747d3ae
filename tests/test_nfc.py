"""Unicode NFC normalization + control scrub (functions/text.py).

The UDF must agree byte-for-byte with stdlib unicodedata (the same
UAX #15 tables DuckDB's nfc_normalize implements — that parity is what
the doc_nfc_normalize oracle rests on).
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import functions as F

from rdf_diff_store_spark.functions.text import clean_text, nfc_normalize_udf

CASES = [
    "Café du monde",  # combining acute -> é
    "naïve Ångström",  # diaeresis + ANGSTROM singleton
    "Ǻ stacked",  # two stacked marks -> U+01FA
    "déjà ﬁxé clean",  # already NFC; fi-ligature kept
    "",  # empty
    "plain ascii",
]


def _run(spark, vals):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, t string")
    rows = df.select("i", nfc_normalize_udf("t").alias("n")).orderBy("i").collect()
    return [r.n for r in rows]


def test_nfc_matches_stdlib(spark):
    got = _run(spark, CASES)
    want = [unicodedata.normalize("NFC", c) for c in CASES]
    assert got == want
    # the composed cases actually shrank / changed
    assert got[0] == "Café du monde"
    assert got[1] == "naïve Ångström"
    assert got[2] == "Ǻ stacked"
    # NFC keeps compatibility characters (it is not NFKC)
    assert "ﬁ" in got[3]


def test_nfc_none_and_idempotent(spark):
    df = spark.createDataFrame([(1, None), (2, CASES[0])], "i int, t string")
    out = df.select(
        "i",
        nfc_normalize_udf("t").alias("n1"),
        nfc_normalize_udf(nfc_normalize_udf("t")).alias("n2"),
    ).collect()
    by_i = {r.i: r for r in out}
    assert by_i[1].n1 is None and by_i[1].n2 is None
    assert by_i[2].n1 == by_i[2].n2  # idempotent


def test_clean_text_strips_controls_and_collapses(spark):
    df = spark.createDataFrame(
        [(1, "a\x00b\x07c"), (2, "  x \t\n y\r\n  "), (3, "keep del\x7fgone")],
        "i int, t string",
    )
    rows = df.select("i", clean_text("t").alias("c")).collect()
    by_i = {r.i: r.c for r in rows}
    assert by_i[1] == "abc"
    assert by_i[2] == "x y"
    assert by_i[3] == "keep delgone"
