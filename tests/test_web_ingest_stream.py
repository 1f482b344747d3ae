"""Streaming web→KG ingest (streaming/web_ingest_stream.py): pages per
micro-batch → extraction → versioned changelog, with the writer's
skip-identical / replay-safe semantics holding through the extraction
composition."""

from __future__ import annotations

import datetime as dt

from rdf_diff_store_spark.streaming.web_ingest_stream import StreamingWebIngest


def _page(url, ts, name):
    html = (
        '<html><head><script type="application/ld+json">'
        f'{{"@context":"https://schema.org","@id":"{url}#it",'
        f'"@type":"Article","name":"{name}",'
        '"author":{"@type":"Person","name":"ada"}}'
        "</script></head><body></body></html>"
    )
    return (url, dt.datetime.fromisoformat(ts), html)


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "url string, crawl_ts timestamp, html string"
    )


def test_versions_skip_identical_and_track_changes(spark, tmp_path):
    wi = StreamingWebIngest(spark, str(tmp_path / "log"), n_buckets=4)
    wi.process_batch(
        _pages(spark, [_page("https://a.org/1", "2024-01-01 00:00:00", "v1")]), 0
    )
    wi.process_batch(
        _pages(
            spark,
            [
                # unchanged content, later crawl: must be SKIPPED
                _page("https://a.org/1", "2024-01-02 00:00:00", "v1"),
                # brand-new page
                _page("https://a.org/2", "2024-01-02 00:00:00", "x"),
            ],
        ),
        1,
    )
    wi.process_batch(
        _pages(
            spark,
            [  # changed content: a NEW version
                _page("https://a.org/1", "2024-01-03 00:00:00", "v2")
            ],
        ),
        2,
    )
    log = wi.changelog().collect()
    by_graph = {}
    for r in log:
        by_graph.setdefault(r["graph_id"], []).append(r)
    assert len(by_graph["https://a.org/1"]) == 2  # v1 + v2, resend skipped
    assert len(by_graph["https://a.org/2"]) == 1
    # payloads are real Turtle with skolemized authors
    assert all("_:" not in (r["payload"] or "") for r in log)
    assert any('"v2"' in r["payload"] for r in by_graph["https://a.org/1"])


def test_replay_is_noop_and_markupless_pages_ignored(spark, tmp_path):
    wi = StreamingWebIngest(spark, str(tmp_path / "log"), n_buckets=4)
    b1 = _pages(spark, [_page("https://a.org/1", "2024-01-01 00:00:00", "v1")])
    wi.process_batch(b1, 0)
    n = wi.changelog().count()
    wi.process_batch(b1, 0)  # crash replay, same batch id
    assert wi.changelog().count() == n
    # a page with no structured data is not a graph version
    wi.process_batch(
        _pages(
            spark,
            [("https://a.org/plain", dt.datetime(2024, 1, 5), "<html><p>hi</p></html>")],
        ),
        1,
    )
    assert wi.changelog().count() == n


def test_equals_batch_path(spark, tmp_path):
    """Streamed changelog rows ≡ the batch path (canonical rows fed to
    append_updates in one shot) for in-order arrival."""
    from pyspark.sql import functions as F

    from rdf_diff_store_spark.operators.versioned import append_updates

    batches = [
        [_page("https://a.org/1", "2024-01-01 00:00:00", "v1")],
        [
            _page("https://a.org/1", "2024-01-02 00:00:00", "v1"),
            _page("https://a.org/2", "2024-01-02 00:00:00", "x"),
        ],
        [_page("https://a.org/1", "2024-01-03 00:00:00", "v2")],
    ]
    wi = StreamingWebIngest(spark, str(tmp_path / "log"), n_buckets=4)
    for i, b in enumerate(batches):
        wi.process_batch(_pages(spark, b), i)

    empty = spark.createDataFrame(
        [], "graph_id string, ts timestamp, op string, payload string, content_hash string"
    )
    oneshot = empty
    for b in batches:
        upd = wi._page_updates(_pages(spark, b))
        oneshot = append_updates(oneshot, upd.drop("format"))
    key = lambda r: (r["graph_id"], r["ts"], r["op"], r["content_hash"])  # noqa: E731
    streamed = sorted(
        wi.changelog().select("graph_id", "ts", "op", "content_hash").collect(), key=key
    )
    batch = sorted(
        oneshot.select("graph_id", "ts", "op", "content_hash").collect(), key=key
    )
    assert [key(r) for r in streamed] == [key(r) for r in batch]
