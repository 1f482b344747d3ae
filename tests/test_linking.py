"""Entity-link scoring (pipeline/linking.py) — the north_star's
"batched mention detection and entity-link scoring via Arrow pandas
UDFs" stage: scoring semantics, determinism, and integration with the
KG pipeline's extracted-page mentions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_diff_store_spark.pipeline.linking import (
    candidate_dictionary,
    entity_link_scores,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha alpha alpha bravo charlie"),
            (2, "alpha bravo bravo delta"),
            (3, "alphz bravo charlie charlie"),  # alphz = near-miss of alpha
            (4, "echoo alpha"),  # echoo matches nothing within lev<=2? echo not in dict
        ],
        "doc_id long, text string",
    ).localCheckpoint()


class TestLinking:
    def test_exact_match_wins_over_near_miss(self, docs):
        # top-3 dictionary = alpha(5), bravo(4), charlie(3); the
        # near-miss tokens alphz/echoo stay OUT of the dictionary
        cands = candidate_dictionary(docs, top_n=3)
        out = entity_link_scores(docs, cands, max_lev=2)
        rows = {(r.doc_id, r.mention): r for r in out.collect()}
        # 'alphz' links to 'alpha' (lev 1) — the only candidate in range
        assert rows[(3, "alphz")].entity == "alpha"
        # exact mention of a dictionary alias links to itself
        assert rows[(1, "alpha")].entity == "alpha"
        assert rows[(1, "alpha")].score > rows[(3, "alphz")].score
        # 'echoo' is within lev 2 of nothing → no link row at all
        assert (4, "echoo") not in rows

    def test_prior_breaks_equal_distance_ties(self, spark):
        docs = spark.createDataFrame(
            # 'bravoz' is lev-1 from both 'bravos' and... construct:
            # candidates 'braaaa' (freq 3) vs 'braaab' (freq 1); mention
            # 'braaac' is lev-1 from both → higher-prior candidate wins
            [(1, "braaaa braaaa braaaa braaab braaac")],
            "doc_id long, text string",
        )
        cands = candidate_dictionary(docs, top_n=2)  # braaaa, braaab only
        out = entity_link_scores(docs, cands, max_lev=2)
        row = {r.mention: r for r in out.collect()}["braaac"]
        assert row.entity == "braaaa"
        assert row.n_candidates >= 2

    def test_scores_deterministic_across_runs(self, docs):
        cands = candidate_dictionary(docs, top_n=10)
        a = sorted(map(tuple, entity_link_scores(docs, cands).collect()))
        b = sorted(map(tuple, entity_link_scores(docs, cands).collect()))
        assert a == b

    def test_links_kg_pipeline_mentions(self, spark):
        """The scorer runs over the KG pipeline's own extracted pages:
        mention tokens (ENT…) link back to dictionary aliases."""
        from rdf_diff_store_spark.pipeline.kg import extract_pages
        from rdf_diff_store_spark.sources.pages import generate_pages

        pages = generate_pages(spark, n_urls=200, n_crawls=1)
        extracted = extract_pages(pages).withColumnRenamed("url", "doc_id")
        cands = candidate_dictionary(extracted, top_n=20)
        out = entity_link_scores(
            extracted, cands, id_col="doc_id", max_lev=2
        )
        assert out.count() > 0
        # every winner is a dictionary alias and scores are in (0, 1.2]
        aliases = {r.alias for r in cands.select("alias").collect()}
        for r in out.collect():
            assert r.entity in aliases
            assert 0.0 < r.score <= 1.2


class TestBlockedLinking:
    """entity_link_blocked: the non-broadcast scale path must be
    bit-identical to the broadcast nested-loop variant (FastSS
    deletion-neighborhood blocking has exact recall for the band)."""

    def test_deletion_variants_match_itertools_reference(self, spark):
        import itertools

        from rdf_diff_store_spark.pipeline.linking import deletion_variants

        def py_variants(s, k):
            out = {s}
            for d in range(1, k + 1):
                for pos in itertools.combinations(range(len(s)), d):
                    out.add("".join(c for i, c in enumerate(s) if i not in pos))
            return out

        words = ["hello", "ab", "a", "alphabet", "aaaaa", "xy"]
        df = spark.createDataFrame([(w,) for w in words], "s string")
        for k in (1, 2):
            rows = df.select("s", deletion_variants(F.col("s"), k).alias("v")).collect()
            for r in rows:
                assert set(r.v) == py_variants(r.s, k), (r.s, k)
                # array_distinct applied: no duplicate variants
                assert len(r.v) == len(set(r.v))

    def test_blocked_equals_broadcast(self, docs):
        from rdf_diff_store_spark.pipeline.linking import entity_link_blocked

        cands = candidate_dictionary(docs, top_n=3)
        a = sorted(map(tuple, entity_link_scores(docs, cands, max_lev=2).collect()))
        b = sorted(map(tuple, entity_link_blocked(docs, cands, max_lev=2).collect()))
        assert a == b and len(a) > 0

    def test_position_zero_substitution_found(self, spark):
        """Prefix blocking would miss an edit at position 0; the
        deletion neighborhood catches it ('xharlie' -> 'charlie')."""
        from rdf_diff_store_spark.pipeline.linking import entity_link_blocked

        docs = spark.createDataFrame(
            [(1, "charlie charlie charlie xharlie")], "doc_id long, text string"
        )
        cands = candidate_dictionary(docs, top_n=1)  # charlie only
        rows = {r.mention: r for r in entity_link_blocked(docs, cands).collect()}
        assert rows["xharlie"].entity == "charlie"

    def test_shared_variant_beyond_band_filtered(self, spark):
        """'aabbb' and 'bbbcc' share the 2-deletion variant 'bbb' but
        sit at levenshtein 4 — the pair is minted by the block join
        and must be removed by the verify filter."""
        from rdf_diff_store_spark.pipeline.linking import entity_link_blocked

        docs = spark.createDataFrame(
            [(1, "bbbcc aabbb aabbb")], "doc_id long, text string"
        )
        cands = candidate_dictionary(docs, top_n=1)  # aabbb (freq 2)
        rows = {r.mention: r for r in entity_link_blocked(docs, cands).collect()}
        assert "bbbcc" not in rows  # beyond the band
        assert rows["aabbb"].entity == "aabbb"  # exact self-link survives
