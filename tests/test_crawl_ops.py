"""Crawl-analytics operators (operators/crawl.py, operators/index.py,
graph.py::hits, text.py::extract_anchors): semantics pinned on
hand-built frames, cycle/chain edge cases, and model checks against
naive Python implementations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _pages(spark, rows):
    df = spark.createDataFrame(rows, "url string, warc_ts string, content_hash string")
    return df.withColumn("warc_ts", F.col("warc_ts").cast("timestamp_ntz"))


C1, C2 = "2024-01-01 00:00:00", "2024-01-08 00:00:00"


class TestCrawlDelta:
    def test_classification(self, spark):
        from rdf_diff_store_spark.operators.crawl import crawl_delta

        pages = _pages(
            spark,
            [
                ("u/keep", C1, "h1"), ("u/keep", C2, "h1"),        # unchanged → dropped
                ("u/edit", C1, "h1"), ("u/edit", C2, "h2"),        # changed
                ("u/old", C1, "h1"),                                # removed
                ("u/new", C2, "h9"),                                # added
            ],
        )
        got = {
            r["url"]: (r["change"], r["hash1"], r["hash2"])
            for r in crawl_delta(
                pages,
                F.lit(C1).cast("timestamp_ntz"),
                F.lit(C2).cast("timestamp_ntz"),
            ).collect()
        }
        assert got == {
            "u/edit": ("changed", "h1", "h2"),
            "u/old": ("removed", "h1", None),
            "u/new": ("added", None, "h9"),
        }

    def test_other_crawls_ignored(self, spark):
        from rdf_diff_store_spark.operators.crawl import crawl_delta

        pages = _pages(
            spark,
            [
                ("u/a", C1, "h1"),
                ("u/a", "2024-01-04 00:00:00", "mid-crawl-noise"),
                ("u/a", C2, "h1"),
            ],
        )
        assert (
            crawl_delta(
                pages,
                F.lit(C1).cast("timestamp_ntz"),
                F.lit(C2).cast("timestamp_ntz"),
            ).count()
            == 0
        )


class TestChangeRate:
    def test_buckets(self, spark):
        from rdf_diff_store_spark.operators.crawl import change_rate

        ts = [f"2024-01-0{k} 00:00:00" for k in (1, 2, 3, 4)]
        pages = _pages(
            spark,
            # hot: changes every crawl (3/3)
            [("u/hot", ts[k], f"h{k}") for k in range(4)]
            # warm: one change (1/3 = 33%)
            + [("u/warm", ts[0], "a"), ("u/warm", ts[1], "a"),
               ("u/warm", ts[2], "b"), ("u/warm", ts[3], "b")]
            # cold: never changes
            + [("u/cold", t, "same") for t in ts]
            # new: single fetch
            + [("u/new", ts[0], "x")],
        )
        got = {
            r["url"]: (r["n_crawls"], r["n_changes"], r["change_pct"], r["priority"])
            for r in change_rate(pages).collect()
        }
        assert got == {
            "u/hot": (4, 3, 100, "hot"),
            "u/warm": (4, 1, 33, "warm"),
            "u/cold": (4, 0, 0, "cold"),
            "u/new": (1, 0, 0, "new"),
        }


class TestResolveRedirects:
    def _run(self, spark, urls, edges, log2=3):
        from rdf_diff_store_spark.operators.crawl import resolve_redirects

        u = spark.createDataFrame([(x,) for x in urls], "url string")
        m = spark.createDataFrame(edges, "src string, dst string")
        return {
            r["url"]: (r["final_url"], r["redirected"])
            for r in resolve_redirects(u, m, max_hops_log2=log2).collect()
        }

    def test_chain_and_untouched(self, spark):
        got = self._run(
            spark, ["a", "b", "c", "d", "z"], [("a", "b"), ("b", "c"), ("c", "d")]
        )
        assert got["a"] == ("d", True)
        assert got["b"] == ("d", True)
        assert got["c"] == ("d", True)
        assert got["d"] == ("d", False)  # chain end: no outgoing redirect
        assert got["z"] == ("z", False)

    def test_cycle_terminates_deterministically(self, spark):
        # 2-cycle: 8 hops (even) from either member lands back on itself
        got = self._run(spark, ["p", "q", "in"], [("p", "q"), ("q", "p"), ("in", "p")])
        assert got["p"] == ("p", True)
        assert got["q"] == ("q", True)
        # entering the cycle: 8 hops from 'in' = in→p then 7 toggles → q
        assert got["in"] == ("q", True)

    def test_matches_naive_follow(self, spark):
        # model check: doubling == naive 8-step follow on a pseudo-random
        # functional graph (every node has at most one outgoing edge)
        nodes = [f"n{i}" for i in range(60)]
        edges = [
            (f"n{i}", f"n{(i * 13 + 7) % 60}") for i in range(60) if i % 3 != 0
        ]
        m = dict(edges)

        def follow(u, hops=8):
            for _ in range(hops):
                u = m.get(u, u)
            return u

        got = self._run(spark, nodes, edges)
        for n in nodes:
            assert got[n] == (follow(n), n in m), n


class TestInvertedIndex:
    def test_small_corpus(self, spark):
        from rdf_diff_store_spark.operators.index import inverted_index

        docs = spark.createDataFrame(
            [
                (3, "the cat sat"),
                (1, "the the dog"),
                (2, "cat cat the"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["term"]: (r["df"], r["cf"], r["postings"])
            for r in inverted_index(docs, postings_cap=2).collect()
        }
        assert got["the"] == (3, 4, "1,2")  # cap=2 keeps the two smallest ids
        assert got["cat"] == (2, 3, "2,3")
        assert got["sat"] == (1, 1, "3")
        assert got["dog"] == (1, 1, "1")

    def test_min_df_prunes(self, spark):
        from rdf_diff_store_spark.operators.index import inverted_index

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a c")], "doc_id long, text string"
        )
        terms = {r["term"] for r in inverted_index(docs, min_df=2).collect()}
        assert terms == {"a"}


class TestAnchors:
    def test_extract_pairs_and_relative(self, spark):
        from rdf_diff_store_spark.functions.text import extract_anchors

        html = (
            '<a class="x" href="https://h1.org/p">  One  </a>'
            '<a href="/rel">Rel</a><a href="https://h2.org">Two<b>!</b></a>'
        )
        df = spark.createDataFrame([(html,)], "html string")
        rows = df.select(F.explode(extract_anchors(F.col("html"))).alias("a")).collect()
        pairs = [(r["a"]["href"], r["a"]["anchor"]) for r in rows]
        # the <b>-nested body does NOT match ([^<]* body only) — the
        # extractor is attribute-level by design, plain-text bodies only
        assert pairs == [("https://h1.org/p", "One"), ("/rel", "Rel")]


class TestHits:
    def test_matches_python_model(self, spark):
        from rdf_diff_store_spark.operators.graph import hits

        edges = [(f"n{i}", f"n{(i * 7 + 3) % 15}") for i in range(15)] + [
            ("n0", "n5"),
            ("n1", "n5"),
            ("n2", "n5"),
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["node"]: (r["hub_micro"], r["auth_micro"])
            for r in hits(df, iterations=3).collect()
        }

        # integer model with identical div-by-max rescale
        e = sorted(set(edges))
        nodes = sorted({x for p in e for x in p})
        hub = {n: 1_000_000 for n in nodes}
        auth = {}
        for _ in range(3):
            raw = {n: 0 for n in nodes}
            for s, d in e:
                raw[d] += hub[s]
            sc = max(1, max(raw.values()) // 1_000_000)
            auth = {n: v // sc for n, v in raw.items()}
            raw = {n: 0 for n in nodes}
            for s, d in e:
                raw[s] += auth[d]
            sc = max(1, max(raw.values()) // 1_000_000)
            hub = {n: v // sc for n, v in raw.items()}
        assert got == {n: (hub[n], auth[n]) for n in nodes}

    def test_sink_and_source_scores(self, spark):
        from rdf_diff_store_spark.operators.graph import hits

        # star: s1,s2,s3 → t ; t has no out-edges → pure authority
        df = spark.createDataFrame(
            [("s1", "t"), ("s2", "t"), ("s3", "t")], "src string, dst string"
        )
        got = {r["node"]: r for r in hits(df, iterations=2).collect()}
        assert got["t"]["hub_micro"] == 0
        assert got["t"]["auth_micro"] > 0
        assert got["s1"]["auth_micro"] == 0
        assert got["s1"]["hub_micro"] == got["s2"]["hub_micro"] > 0


class TestRobots:
    def _prefixes(self, spark, txt):
        from rdf_diff_store_spark.operators.crawl import robots_disallow_prefixes

        df = spark.createDataFrame([(txt,)], "robots_txt string")
        return df.select(robots_disallow_prefixes(F.col("robots_txt")).alias("p")).first()["p"]

    def test_star_group_only(self, spark):
        txt = (
            "User-agent: megabot\nDisallow: /\n\n"
            "User-agent: *\nDisallow: /private/\nDisallow: /tmp/\n\n"
            "User-agent: other\nDisallow: /other/\n"
        )
        assert self._prefixes(spark, txt) == ["/private/", "/tmp/"]

    def test_stacked_user_agents_share_group(self, spark):
        # RFC 9309 §2.2.1: consecutive UA lines form ONE group
        txt = "User-agent: a\nUser-agent: *\nDisallow: /s/\n"
        assert self._prefixes(spark, txt) == ["/s/"]
        # a rule line ENDS the group: the next UA starts a fresh one
        txt2 = "User-agent: *\nDisallow: /s/\nUser-agent: b\nDisallow: /t/\n"
        assert self._prefixes(spark, txt2) == ["/s/"]

    def test_empty_disallow_comments_case(self, spark):
        txt = "USER-AGENT: *\nDisallow:   # no rule\nDISALLOW: /X/  # comment\n"
        assert self._prefixes(spark, txt) == ["/X/"]

    def test_filter_allows_hosts_without_policy(self, spark):
        from rdf_diff_store_spark.operators.crawl import robots_filter

        urls = spark.createDataFrame(
            [
                ("https://a.org/d/1",),
                ("https://a.org/p/1",),
                ("https://b.org/d/1",),   # no robots row → allowed
                ("https://a.org/",),      # empty path → '/'
            ],
            "url string",
        )
        robots = spark.createDataFrame(
            [("a.org", "User-agent: *\nDisallow: /d/")], "host string, robots_txt string"
        )
        got = {r["url"]: (r["allowed"], r["path"]) for r in robots_filter(urls, robots).collect()}
        assert got == {
            "https://a.org/d/1": (False, "/d/1"),
            "https://a.org/p/1": (True, "/p/1"),
            "https://b.org/d/1": (True, "/d/1"),
            "https://a.org/": (True, "/"),
        }


class TestFrontierSchedule:
    def test_politeness_spacing_and_order(self, spark):
        from rdf_diff_store_spark.operators.crawl import frontier_schedule

        rows = [(f"u{i}", f"h{i % 3}", (i * 7) % 10) for i in range(30)]
        df = spark.createDataFrame(rows, "url string, host string, priority long")
        out = frontier_schedule(df, n_lanes=8).collect()
        by_host: dict[str, list] = {}
        for r in out:
            by_host.setdefault(r["host"], []).append(r)
        for host, rs in by_host.items():
            rs.sort(key=lambda r: r["fetch_slot"])
            # same-host fetches are exactly n_lanes apart
            slots = [r["fetch_slot"] for r in rs]
            assert all(b - a == 8 for a, b in zip(slots, slots[1:])), host
            # all in one lane, slot ≡ lane (mod n_lanes)
            assert {r["lane"] for r in rs} == {slots[0] % 8}
            # ordered by priority desc then url
            keys = [(-r["priority"], r["url"]) for r in rs]
            assert keys == sorted(keys), host

    def test_deterministic_under_repartition(self, spark):
        from rdf_diff_store_spark.operators.crawl import frontier_schedule

        rows = [(f"u{i}", f"h{i % 5}", 1) for i in range(40)]
        df = spark.createDataFrame(rows, "url string, host string, priority long")
        a = {(r["url"], r["fetch_slot"]) for r in frontier_schedule(df).collect()}
        b = {
            (r["url"], r["fetch_slot"])
            for r in frontier_schedule(df.repartition(16)).collect()
        }
        assert a == b


class TestCanonicalSitemap:
    def test_extract_canonical_both_orders(self, spark):
        from rdf_diff_store_spark.functions.text import extract_canonical

        df = spark.createDataFrame(
            [
                ('<head><link rel="canonical" href="https://m.org/1"></head>',),
                ('<head><link href="https://m.org/2" rel="canonical"></head>',),
                ("<head><link rel=\"stylesheet\" href=\"/css\"></head>",),
                ("<head></head>",),
            ],
            "html string",
        )
        got = [r[0] for r in df.select(extract_canonical(F.col("html"))).collect()]
        assert got == ["https://m.org/1", "https://m.org/2", None, None]

    def test_sitemap_locs_trimmed(self, spark):
        from rdf_diff_store_spark.functions.text import extract_sitemap_urls

        xml = (
            '<?xml version="1.0"?><urlset><url><loc> https://a.org/1 </loc></url>'
            "<url><loc>https://a.org/2</loc></url></urlset>"
        )
        df = spark.createDataFrame([(xml,)], "xml string")
        got = df.select(extract_sitemap_urls(F.col("xml")).alias("u")).first()["u"]
        assert got == ["https://a.org/1", "https://a.org/2"]

    def test_canonical_chain_composes_with_resolver(self, spark):
        from rdf_diff_store_spark.operators.crawl import resolve_redirects

        # mirror → edition → master collapses to master
        urls = spark.createDataFrame(
            [("mirror",), ("edition",), ("master",)], "url string"
        )
        mapping = spark.createDataFrame(
            [("mirror", "edition"), ("edition", "master")], "src string, dst string"
        )
        got = {
            r["url"]: r["final_url"]
            for r in resolve_redirects(urls, mapping).collect()
        }
        assert got == {"mirror": "master", "edition": "master", "master": "master"}


class TestPhraseSearch:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                (1, "the quick brown fox"),
                (2, "quick brown quick brown fox"),
                (3, "batch batch batch batch"),
                (4, "no match here"),
                (5, "Quick  Brown fox"),
                (6, "brown quick"),
            ],
            "doc_id long, text string",
        )

    def test_two_word_phrase(self, spark):
        from rdf_diff_store_spark.operators.index import phrase_search

        got = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(self._df(spark), "quick brown").collect()
        }
        # order matters: doc 6 has the words but reversed
        assert got == {1: (1, 1), 2: (2, 0), 5: (1, 0)}

    def test_overlapping_repeated_word_phrase(self, spark):
        from rdf_diff_store_spark.operators.index import phrase_search

        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_search(self._df(spark), "batch batch batch").collect()
        }
        assert got == {3: 2}

    def test_single_word_and_case_fold(self, spark):
        from rdf_diff_store_spark.operators.index import phrase_search

        got = {
            r["doc_id"]: r["first_pos"]
            for r in phrase_search(self._df(spark), "FOX").collect()
        }
        assert got == {1: 3, 2: 4, 5: 2}

    def test_matches_python_model(self, spark):
        from rdf_diff_store_spark.operators.index import phrase_search

        rows = [(i, " ".join(
            ["a", "b", "c", "a", "b"][(i + j) % 5] for j in range(12)
        )) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        phrase = "a b c"
        want = {}
        for doc, text in rows:
            toks = text.lower().split()
            starts = [
                p for p in range(len(toks) - 2)
                if toks[p : p + 3] == phrase.split()
            ]
            if starts:
                want[doc] = (len(starts), starts[0])
        got = {
            r["doc_id"]: (r["n_matches"], r["first_pos"])
            for r in phrase_search(df, phrase).collect()
        }
        assert got == want

    def test_empty_phrase_raises(self, spark):
        import pytest as _pytest

        from rdf_diff_store_spark.operators.index import phrase_search

        with _pytest.raises(ValueError):
            phrase_search(self._df(spark), "   ")


class TestMirrorHosts:
    """mirror_hosts (crawl.py) — set-similarity pair detection."""

    def _run(self, spark, rows, **kw):
        from rdf_diff_store_spark.operators.crawl import mirror_hosts

        df = spark.createDataFrame(rows, ["host", "content_hash"])
        return {
            (r.host_a, r.host_b): (r.shared, r.size_a, r.size_b, r.jaccard_pct)
            for r in mirror_hosts(df, **kw).collect()
        }

    def test_exact_mirror_is_100(self, spark):
        rows = [("a", "x1"), ("a", "x2"), ("b", "x1"), ("b", "x2"), ("c", "y")]
        out = self._run(spark, rows, min_jaccard_pct=50)
        assert out == {("a", "b"): (2, 2, 2, 100)}

    def test_partial_overlap_floor(self, spark):
        # shared 1, sizes 2 and 2 -> 100*1/3 = 33 (floored)
        rows = [("a", "x"), ("a", "u1"), ("b", "x"), ("b", "u2")]
        out = self._run(spark, rows, min_jaccard_pct=0)
        assert out[("a", "b")] == (1, 2, 2, 33)
        assert not self._run(spark, rows, min_jaccard_pct=34)

    def test_df_cap_suppresses_boilerplate_hash(self, spark):
        # 'bp' lives on 4 hosts; with max_hash_df=3 it mints no pairs
        rows = [(h, "bp") for h in "abcd"] + [("a", "x"), ("b", "x")]
        out = self._run(spark, rows, min_jaccard_pct=0, max_hash_df=3)
        assert set(out) == {("a", "b")}
        assert out[("a", "b")][0] == 1  # only 'x' counted as shared

    def test_duplicate_pages_one_vote(self, spark):
        rows = [("a", "x"), ("a", "x"), ("b", "x")]
        out = self._run(spark, rows, min_jaccard_pct=0)
        assert out[("a", "b")] == (1, 1, 1, 100)


class TestDustRules:
    def _rules(self, spark, rows, **kw):
        from rdf_diff_store_spark.operators.crawl import dust_rules

        df = spark.createDataFrame(rows, "url string, content_hash string")
        return {
            (r.tok_a, r.tok_b): r.support for r in dust_rules(df, **kw).collect()
        }

    def test_single_token_rule_with_support(self, spark):
        rows = [
            ("https://h/p/1", "c1"), ("https://h/print/1", "c1"),
            ("https://h/p/2", "c2"), ("https://h/print/2", "c2"),
        ]
        assert self._rules(spark, rows) == {("p", "print"): 2}

    def test_multi_token_diff_and_length_mismatch_mint_nothing(self, spark):
        rows = [
            # two tokens differ
            ("https://h/a/1", "c1"), ("https://x/b/1", "c1"),
            # token counts differ
            ("https://h/p/2", "c2"), ("https://h/p/2/index.html", "c2"),
        ]
        assert self._rules(spark, rows, min_support=1) == {}

    def test_rule_directions_canonicalize(self, spark):
        rows = [
            ("https://h/aa/1", "c1"), ("https://h/bb/1", "c1"),
            ("https://h/bb/2", "c2"), ("https://h/aa/2", "c2"),
        ]
        assert self._rules(spark, rows) == {("aa", "bb"): 2}

    def test_hash_df_cap_suppresses_boilerplate(self, spark):
        rows = [(f"https://h/p/{i}", "empty") for i in range(12)] + [
            ("https://h/p/x", "c1"), ("https://h/print/x", "c1"),
        ]
        assert self._rules(spark, rows, max_hash_df=10, min_support=1) == {
            ("p", "print"): 1
        }

    def test_same_pair_across_hashes_counts_once(self, spark):
        # A and B serve identical content in TWO crawls (two hashes):
        # the pair must contribute support 1, not 2
        rows = [
            ("https://h/p/1", "c1"), ("https://h/print/1", "c1"),
            ("https://h/p/1", "c2"), ("https://h/print/1", "c2"),
        ]
        assert self._rules(spark, rows, min_support=2) == {}
        assert self._rules(spark, rows, min_support=1) == {("p", "print"): 1}
