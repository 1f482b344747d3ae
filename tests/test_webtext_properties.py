"""Property tests (hypothesis) for the webtext operators added in
round 4 session 11: phrase_search and strip_boilerplate against
brute-force Python models on randomized small inputs.

Few examples per property (each evaluates a Spark job); the
deterministic model tests in test_crawl_ops.py / test_boilerplate.py
cover the named edge cases — these sweep the input space.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling files)

from rdf_diff_store_spark.operators.boilerplate import strip_boilerplate
from rdf_diff_store_spark.operators.index import phrase_search

WORD = st.sampled_from(["a", "b", "c", "ab", "x"])
TEXT = st.lists(WORD, min_size=0, max_size=12).map(" ".join)
PHRASE = st.lists(WORD, min_size=1, max_size=3).map(" ".join)

LINE = st.sampled_from(["nav", "footer", "body one", "body two", "", "  "])
PAGE = st.lists(LINE, min_size=1, max_size=5).map("\n".join)
HOST = st.sampled_from(["h1", "h2"])


def _phrase_model(rows, phrase):
    words = phrase.split()
    out = {}
    for doc, text in rows:
        toks = [t for t in text.lower().split()]
        starts = [
            p
            for p in range(len(toks) - len(words) + 1)
            if toks[p : p + len(words)] == words
        ]
        if starts:
            out[doc] = (len(starts), starts[0])
    return out


def _strip_model(rows, share_pct=50, min_docs=2):
    from collections import defaultdict

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
        out[doc] = ("\n".join(kept), len(lines), len(lines) - len(kept))
    return out


class TestPhraseSearchProperty:
    @settings(max_examples=6, deadline=None)
    @given(st.lists(TEXT, min_size=1, max_size=12), PHRASE)
    def test_matches_model(self, spark, texts, phrase):
        rows = list(enumerate(texts))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(df, phrase).collect()
        }
        # model uses the whitespace-collapsed token list; Spark's
        # posexplode positions index the \s+ split of the trimmed
        # text, which is the same sequence for these inputs
        assert got == _phrase_model(rows, phrase)


class TestStripBoilerplateProperty:
    @settings(max_examples=6, deadline=None)
    @given(st.lists(st.tuples(HOST, PAGE), min_size=1, max_size=10))
    def test_matches_model(self, spark, pages):
        rows = [(i, h, t) for i, (h, t) in enumerate(pages)]
        df = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = {
            r["doc_id"]: (r["clean_text"], r["n_lines"], r["n_removed"])
            for r in strip_boilerplate(df).collect()
        }
        assert got == _strip_model(rows)


class TestHearstPairs:
    """Hearst-pattern hypernym extraction (functions/text.py::
    hearst_pairs, Hearst COLING 1992)."""

    def _run(self, spark, text):
        from rdf_diff_store_spark.functions.text import hearst_pairs

        df = spark.createDataFrame([(text,)], "t string")
        rows = df.select(F.explode(hearst_pairs(F.col("t"))).alias("p")).select(
            "p.hyponym", "p.hypernym", "p.pattern"
        ).collect()
        return [(r["hyponym"], r["hypernym"], r["pattern"]) for r in rows]

    def test_such_as_list(self, spark):
        got = self._run(spark, "Animals such as cats, dogs and foxes. They roam.")
        assert got == [
            ("cats", "Animals", "such_as"),
            ("dogs", "Animals", "such_as"),
            ("foxes", "Animals", "such_as"),
        ]

    def test_or_other(self, spark):
        got = self._run(spark, "bronze, silver or other metals.")
        assert got == [
            ("bronze", "metals", "other"),
            ("silver", "metals", "other"),
        ]

    def test_and_other(self, spark):
        got = self._run(spark, "cars and other vehicles.")
        assert got == [("cars", "vehicles", "other")]

    def test_including(self, spark):
        got = self._run(spark, "Cities including rome, oslo.")
        assert got == [
            ("rome", "Cities", "including"),
            ("oslo", "Cities", "including"),
        ]

    def test_two_word_np(self, spark):
        got = self._run(spark, "large mammals such as blue whales.")
        assert got == [("blue whales", "large mammals", "such_as")]

    def test_no_match_is_empty(self, spark):
        assert self._run(spark, "Nothing patterned lives here.") == []

    def test_multiset_preserved(self, spark):
        got = self._run(spark, "Pets such as cats. Pets such as cats.")
        assert got == [("cats", "Pets", "such_as")] * 2


class TestPldOfHosts:
    """Pay-level-domain extraction (functions/text.py::pld_of_hosts,
    Public Suffix List longest-match algorithm)."""

    def _pld(self, spark, hosts):
        from rdf_diff_store_spark.functions.text import pld_of_hosts

        df = spark.createDataFrame([(h,) for h in hosts], ["host"])
        return {r["host"]: r["pld"] for r in pld_of_hosts(df).collect()}

    def test_simple_tld(self, spark):
        got = self._pld(spark, ["www.example.com", "example.com", "a.b.example.com"])
        assert got == {
            "www.example.com": "example.com",
            "example.com": "example.com",
            "a.b.example.com": "example.com",
        }

    def test_multi_label_suffix_wins_longest(self, spark):
        # co.uk is a rule AND uk-ish single labels are not: longest match
        got = self._pld(spark, ["www.example.co.uk", "a.b.shop.co.uk"])
        assert got == {
            "www.example.co.uk": "example.co.uk",
            "a.b.shop.co.uk": "shop.co.uk",
        }

    def test_host_that_is_a_suffix_has_no_pld(self, spark):
        got = self._pld(spark, ["co.uk", "com"])
        assert got == {"co.uk": None, "com": None}

    def test_unknown_tld_falls_back_to_last_two(self, spark):
        # the PSL implicit '*' rule
        got = self._pld(spark, ["cdn.foo.unknowntld", "foo.unknowntld"])
        assert got == {
            "cdn.foo.unknowntld": "foo.unknowntld",
            "foo.unknowntld": "foo.unknowntld",
        }

    def test_single_label_host(self, spark):
        got = self._pld(spark, ["localhost"])
        assert got == {"localhost": None}

    def test_custom_rule_table(self, spark):
        from rdf_diff_store_spark.functions.text import pld_of_hosts

        df = spark.createDataFrame([("x.blogspot.com",), ("y.example.com",)], ["host"])
        rules = spark.createDataFrame([("com",), ("blogspot.com",)], ["suffix"])
        got = {r["host"]: r["pld"] for r in pld_of_hosts(df, rules).collect()}
        # blogspot.com as a rule: each blog is its own PLD
        assert got == {"x.blogspot.com": "x.blogspot.com", "y.example.com": "example.com"}
