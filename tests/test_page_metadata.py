"""Head-metadata extraction (functions/text.py::page_metadata and
friends): pure whole-stage-codegen title / meta / robots-gate columns."""

from __future__ import annotations

from pyspark.sql import functions as F

from rdf_diff_store_spark.functions.text import (
    extract_meta_content,
    extract_title,
    page_metadata,
    robots_noindex,
)


def _one(spark, html, col):
    return (
        spark.createDataFrame([(html,)], "html string")
        .select(col(F.col("html")).alias("v"))
        .collect()[0]["v"]
    )


class TestTitle:
    def test_collapse_and_dotall(self, spark):
        assert (
            _one(spark, "<html><head><title>\n  A   B\n</title></head>", extract_title)
            == "A B"
        )

    def test_absent_and_empty_are_null(self, spark):
        assert _one(spark, "<html><body>x</body></html>", extract_title) is None
        assert _one(spark, "<title>  </title>", extract_title) is None


class TestMetaContent:
    def test_both_attribute_orders_and_case(self, spark):
        fn = lambda c: extract_meta_content(c, "description")  # noqa: E731
        a = '<meta name="description" content="first desc">'
        b = '<meta content="second desc" name="Description">'
        assert _one(spark, a, fn) == "first desc"
        assert _one(spark, b, fn) == "second desc"
        assert _one(spark, a + b, fn) == "first desc"  # first match wins
        assert _one(spark, "<meta name='keywords' content='x'>", fn) is None


class TestRobotsNoindex:
    def test_directives(self, spark):
        fn = robots_noindex
        assert _one(spark, '<meta name="robots" content="noindex, follow">', fn)
        assert _one(spark, '<meta name="ROBOTS" content="NONE">', fn)
        assert not _one(spark, '<meta name="robots" content="index, nofollow">', fn)
        # substring must not match: 'noindexing' is not a directive
        assert not _one(spark, '<meta name="robots" content="noindexing">', fn)
        assert not _one(spark, "<html></html>", fn)  # missing → FALSE, not NULL


class TestPageMetadata:
    def test_frame_and_plan(self, spark):
        pages = spark.createDataFrame(
            [
                (
                    "u1",
                    "<html><head><title>T1</title>"
                    '<meta name="description" content="d1">'
                    '<meta name="robots" content="noindex"></head></html>',
                ),
                ("u2", "<html><head></head><body>plain</body></html>"),
            ],
            "url string, html string",
        )
        df = page_metadata(pages)
        rows = {r["url"]: r for r in df.collect()}
        assert (rows["u1"]["title"], rows["u1"]["description"], rows["u1"]["noindex"]) == (
            "T1",
            "d1",
            True,
        )
        assert (rows["u2"]["title"], rows["u2"]["description"], rows["u2"]["noindex"]) == (
            None,
            None,
            False,
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan and "InPandas" not in plan


class TestFeedEntries:
    RSS = (
        "<rss><channel><title>chan</title>"
        "<item><title><![CDATA[First  post]]></title>"
        "<link>https://x.org/1</link>"
        "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
        "<item><title>Second</title><link>https://x.org/2</link></item>"
        "</channel></rss>"
    )
    ATOM = (
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        "<title>chan</title>"
        "<entry><title>A1</title>"
        '<link rel="alternate" href="https://y.org/a1"/>'
        "<updated>2024-02-01T00:00:00Z</updated></entry>"
        "</feed>"
    )

    def _feeds(self, spark, rows):
        from rdf_diff_store_spark.functions.text import feed_entries

        return feed_entries(
            spark.createDataFrame(rows, "feed_url string, xml string")
        )

    def test_rss_items(self, spark):
        rows = self._feeds(spark, [("f1", self.RSS)]).collect()
        assert [tuple(r) for r in rows] == [
            ("f1", "First post", "https://x.org/1", "Mon, 01 Jan 2024 00:00:00 GMT"),
            ("f1", "Second", "https://x.org/2", None),
        ]

    def test_atom_entries_and_channel_title_not_leaked(self, spark):
        rows = self._feeds(spark, [("f2", self.ATOM)]).collect()
        assert [tuple(r) for r in rows] == [
            ("f2", "A1", "https://y.org/a1", "2024-02-01T00:00:00Z")
        ]

    def test_mixed_and_empty(self, spark):
        rows = self._feeds(
            spark, [("f1", self.RSS), ("f2", self.ATOM), ("f3", "<rss/>")]
        ).collect()
        assert len(rows) == 3
        assert not any(r["feed_url"] == "f3" for r in rows)

    def test_jvm_only_plan(self, spark):
        df = self._feeds(spark, [("f1", self.RSS)])
        plan = df._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan =="
        )[0]
        # the only exchange is the explicit parse-parallelism repartition
        assert "Exchange hashpartitioning" not in plan
        assert "Python" not in plan and "InPandas" not in plan

    def test_atom_rel_alternate_preferred(self, spark):
        entry = (
            "<feed><entry><title>E</title>"
            '<link rel="self" href="https://h/e.atom"/>'
            '<link href="https://h/posts/1" rel="alternate"/>'
            "</entry></feed>"
        )
        rows = self._feeds(spark, [("f", entry)]).collect()
        assert rows[0]["link"] == "https://h/posts/1"
