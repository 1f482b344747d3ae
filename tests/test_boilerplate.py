"""Statistical boilerplate removal (operators/boilerplate.py).

Model: a line is template iff it appears in >= share_pct% of its
host's pages AND in >= min_docs pages. A brute-force Python model
over the same rows pins the operator.
"""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.boilerplate import (
    strip_boilerplate,
    template_lines,
)

ROWS = [
    (1, "a.org", "NAV\nunique one\nFOOTER"),
    (2, "a.org", "NAV\nunique two\nFOOTER"),
    (3, "a.org", "NAV\nunique three"),
    (4, "b.org", "NAV\nother host unique\nFOOTER"),
    (5, "b.org", "body only"),
    (6, "c.org", "solo page\nNAV"),
]


def _model(rows, share_pct=50, min_docs=2):
    host_pages = defaultdict(int)
    seen = defaultdict(set)
    for doc, host, text in rows:
        host_pages[host] += 1
        for line in text.split("\n"):
            if line.strip():
                seen[(host, line.strip())].add(doc)
    tpl = {
        (h, ln)
        for (h, ln), docs in seen.items()
        if len(docs) * 100 >= share_pct * host_pages[h] and len(docs) >= min_docs
    }
    out = {}
    for doc, host, text in rows:
        lines = text.split("\n")
        kept = [l for l in lines if (host, l.strip()) not in tpl]
        removed = len(lines) - len(kept)
        out[doc] = ("\n".join(kept), len(lines), removed)
    return out


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(ROWS, "doc_id long, host string, text string")


class TestStripBoilerplate:
    def test_matches_model(self, spark, pages):
        want = _model(ROWS)
        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
            for r in strip_boilerplate(pages).collect()
        }
        assert got == want

    def test_single_page_host_never_self_templates(self, spark, pages):
        got = {r["doc_id"]: r["n_removed"] for r in strip_boilerplate(pages).collect()}
        assert got[5] == 0 and got[6] == 0

    def test_share_threshold_integer_boundary(self, spark):
        # 2 of 4 pages = exactly 50% -> template at share_pct=50,
        # not at 51 (integer arithmetic, no float rounding).
        rows = [
            (1, "h", "COMMON\na"),
            (2, "h", "COMMON\nb"),
            (3, "h", "c"),
            (4, "h", "d"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, host string, text string")
        at50 = {r["host"] for r in template_lines(df, share_pct=50).collect()}
        at51 = template_lines(df, share_pct=51).count()
        assert at50 == {"h"} and at51 == 0

    def test_blank_lines_survive_and_are_never_template(self, spark):
        rows = [
            (1, "h", "NAV\n\nbody one\n"),
            (2, "h", "NAV\n\nbody two\n"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = {r["doc_id"]: r["clean_text"] for r in strip_boilerplate(df).collect()}
        assert got == {1: "\nbody one\n", 2: "\nbody two\n"}

    def test_repeated_line_in_one_doc_counts_once(self, spark):
        # The line appears 3x in doc 1 but only doc 1 has it: distinct
        # doc count is 1 < min_docs, so it stays.
        rows = [
            (1, "h", "dup\ndup\ndup"),
            (2, "h", "other"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = {r["doc_id"]: r["n_removed"] for r in strip_boilerplate(df).collect()}
        assert got == {1: 0, 2: 0}

    def test_all_template_page_yields_empty_text(self, spark):
        rows = [
            (1, "h", "NAV"),
            (2, "h", "NAV"),
            (3, "h", "NAV\nreal body"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_removed"])
            for r in strip_boilerplate(df).collect()
        }
        assert got[1] == ("", 1) and got[2] == ("", 1) and got[3] == ("real body", 1)

    def test_deterministic_under_repartition(self, spark, pages):
        a = {r["doc_id"]: r["clean_text"] for r in strip_boilerplate(pages).collect()}
        b = {
            r["doc_id"]: r["clean_text"]
            for r in strip_boilerplate(pages.repartition(16)).collect()
        }
        assert a == b

    def test_checkpoint_lines_mode_identical(self, spark, pages):
        plain = {
            tuple(r) for r in strip_boilerplate(pages).collect()
        }
        ckpt = {
            tuple(r)
            for r in strip_boilerplate(pages, checkpoint_lines=True).collect()
        }
        assert plain == ckpt

    def test_null_text_page_survives_as_empty(self, spark):
        rows = [(1, "h", "NAV"), (2, "h", "NAV"), (3, "h", None)]
        df = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
            for r in strip_boilerplate(df).collect()
        }
        assert set(got) == {1, 2, 3}
        assert got[3] == ("", 1, 0)
