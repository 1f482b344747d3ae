"""Online MinHash-LSH near-dup suppression across micro-batches."""

from __future__ import annotations

from rdf_diff_store_spark.streaming.neardup import StreamingNearDupFilter

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # near-dup of BASE
DIFF = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines here"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dup_suppressed_across_batches(spark, tmp_path):
    f = StreamingNearDupFilter(spark, str(tmp_path / "kept"))
    f.process_batch(_docs(spark, [(1, BASE), (2, DIFF)]), 0)
    fresh = (
        "a third unrelated passage describing mountain weather patterns "
        "and the slow migration of glaciers across ancient valleys today"
    )
    # batch 2: exact resend (new id), near-dup, and fresh content
    f.process_batch(_docs(spark, [(10, BASE), (11, NEAR), (12, fresh)]), 1)
    kept = sorted(r.doc_id for r in f.read_kept().collect())
    assert 1 in kept and 2 in kept
    assert 10 not in kept  # exact resend suppressed
    assert 11 not in kept  # near-dup suppressed
    assert 12 in kept  # genuinely new text kept


def test_within_batch_first_wins_and_replay_idempotent(spark, tmp_path):
    f = StreamingNearDupFilter(spark, str(tmp_path / "kept2"))
    batch = _docs(spark, [(5, BASE), (6, BASE), (7, DIFF)])
    f.process_batch(batch, 0)
    kept = sorted(r.doc_id for r in f.read_kept().collect())
    assert kept == [5, 7]  # min id wins inside the batch
    # committed replay is a no-op (fingerprint skip)
    f.process_batch(batch, 0)
    assert sorted(r.doc_id for r in f.read_kept().collect()) == [5, 7]


def test_suppressed_docs_do_not_extend_cluster(spark, tmp_path):
    """A suppressed near-dup must NOT claim buckets: a doc similar to
    the suppressed one but not to the original is still kept
    (no transitive swallowing)."""
    f = StreamingNearDupFilter(spark, str(tmp_path / "kept3"), num_hashes=16, bands=8)
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    b = a.replace("gamma", "lambda")  # near-dup of a → suppressed
    f.process_batch(_docs(spark, [(1, a)]), 0)
    f.process_batch(_docs(spark, [(2, b)]), 1)
    kept = sorted(r.doc_id for r in f.read_kept().collect())
    assert kept == [1]
    # state contains only doc 1's buckets
    state = f._read_state(f._latest_version())
    assert state.select("_id").distinct().count() == 1


def test_string_ids_and_state_suppressed_doc_claims_nothing(spark, tmp_path):
    """Review regressions: non-long id columns work (schema inferred,
    not hardcoded long), and a doc suppressed by STATE never claims
    buckets — neither in state nor as a within-batch bucket winner."""
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near_a = a.replace("gamma", "lambda")  # near-dup of a → suppressed
    fresh = "entirely separate prose regarding orchestral arrangements and tempo markings throughout"
    f = StreamingNearDupFilter(
        spark, str(tmp_path / "kept_str"), id_col="url", text_col="text"
    )
    docs = lambda rows: spark.createDataFrame(rows, "url string, text string")  # noqa: E731
    f.process_batch(docs([("u1", a)]), 0)
    f.process_batch(docs([("u2", near_a), ("u3", fresh)]), 1)
    kept = sorted(r.url for r in f.read_kept().collect())
    assert kept == ["u1", "u3"]  # string ids flow through both state reads
    # the no-swallowing invariant: suppressed u2 claimed NO buckets
    state = f._read_state(f._latest_version())
    assert sorted(r._id for r in state.select("_id").distinct().collect()) == ["u1", "u3"]
