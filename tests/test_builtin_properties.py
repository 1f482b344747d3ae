"""Property-based hardening for the r03 builtin implementations:
Spark expression trees compared against plain-Python reference
semantics on randomized inputs (hypothesis). Each example evaluates
ONE Spark job over a batched column of inputs — never a job per
string."""

from __future__ import annotations

from urllib.parse import quote

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=40
)
# SPARQL string literals in our test queries can't carry every
# codepoint through the Spark-side LITERAL path — these properties
# evaluate the COLUMN expressions directly, so full unicode is fine.


def _eval(spark, values, expr_fn, n_cols=1):
    df = spark.createDataFrame(
        [(i, *v) for i, v in enumerate(values)],
        "i long, " + ", ".join(f"c{k} string" for k in range(n_cols)),
    )
    out = df.select("i", expr_fn(df).alias("out")).collect()
    return [r.out for r in sorted(out, key=lambda r: r.i)]


class TestStrBeforeAfter:
    @staticmethod
    def _ref_before(s, n):
        if n == "":
            return ""
        i = s.find(n)
        return s[:i] if i >= 0 else ""

    @staticmethod
    def _ref_after(s, n):
        if n == "":
            return s
        i = s.find(n)
        return s[i + len(n):] if i >= 0 else ""

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=25))
    def test_matches_python_reference(self, spark, pairs):
        def before(df):
            pos = F.instr(df.c0, df.c1)
            return F.when(pos > 0, F.substring(df.c0, F.lit(1), pos - 1)).otherwise("")

        def after(df):
            pos = F.instr(df.c0, df.c1)
            return F.when(
                pos > 0, F.substring(df.c0, pos + F.length(df.c1), F.lit(2_147_483_647))
            ).otherwise("")

        got_b = _eval(spark, pairs, before, n_cols=2)
        got_a = _eval(spark, pairs, after, n_cols=2)
        assert got_b == [self._ref_before(s, n) for s, n in pairs]
        assert got_a == [self._ref_after(s, n) for s, n in pairs]


class TestEncodeForUri:
    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.tuples(TEXT), min_size=1, max_size=25))
    def test_matches_rfc3986_quote(self, spark, rows):
        def enc(df):
            e = F.url_encode(df.c0)
            e = F.replace(e, F.lit("+"), F.lit("%20"))
            e = F.replace(e, F.lit("*"), F.lit("%2A"))
            return F.replace(e, F.lit("%7E"), F.lit("~"))

        got = _eval(spark, rows, enc)
        want = [quote(s, safe="") for (s,) in rows]
        assert got == want


class TestChunkingProperty:
    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(["tok", "a", "bb", "ccc"]), min_size=0, max_size=60),
            min_size=1,
            max_size=10,
        ),
        st.integers(min_value=2, max_value=12),
        st.integers(min_value=0, max_value=6),
    )
    def test_reconstruction_and_coverage(self, spark, docs, chunk_tokens, overlap):
        """Every token appears in some chunk; stripping the overlap
        from non-first chunks reconstructs the document exactly."""
        from rdf_diff_store_spark.functions.text import chunk_documents

        if overlap >= chunk_tokens:
            overlap = chunk_tokens - 1
        step = chunk_tokens - overlap
        df = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id long, text string",
        )
        out = chunk_documents(df, chunk_tokens=chunk_tokens, overlap=overlap).collect()
        by_doc: dict[int, dict[int, list[str]]] = {}
        for r in out:
            by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = (
                r.chunk_text.split() if r.chunk_text else []
            )
        for i, toks in enumerate(docs):
            chunks = [by_doc[i][k] for k in sorted(by_doc[i])]
            # chunk k starts at k*step and has ≤ chunk_tokens tokens
            rebuilt = list(chunks[0])
            for k, ch in enumerate(chunks[1:], start=1):
                assert ch == toks[k * step : k * step + chunk_tokens]
                rebuilt.extend(ch[overlap:] if len(ch) >= overlap else [])
            if toks:
                assert rebuilt == toks, (toks, chunks)
            else:
                assert chunks == [[""]] or chunks == [[]]


class TestNormalizeUrlProperty:
    @staticmethod
    def _ref(u: str) -> str:
        import re as _re

        u = _re.sub(r"#.*$", "", u)
        m = _re.match(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", u)
        if m:
            u = m.group(1).lower() + u[m.end():]
        u = _re.sub(r"^(http://[^/?#:]*):80([/?#].*)?$", lambda g: g.group(1) + (g.group(2) or ""), u)
        u = _re.sub(r"^(https://[^/?#:]*):443([/?#].*)?$", lambda g: g.group(1) + (g.group(2) or ""), u)
        return u

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"]),
                st.sampled_from(["Example.COM", "a.b", "X.y.Z"]),
                st.sampled_from(["", ":80", ":443", ":8080"]),
                st.sampled_from(["", "/", "/Path/Sub", "/p?q=UPPER&x=1"]),
                st.sampled_from(["", "#frag", "#A#B"]),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def test_matches_reference(self, spark, parts):
        from rdf_diff_store_spark.functions.text import normalize_url

        urls = [(f"{s}://{h}{p}{path}{frag}",) for s, h, p, path, frag in parts]
        got = _eval(spark, urls, lambda df: normalize_url(df.c0))
        assert got == [self._ref(u) for (u,) in urls]


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
