"""Vocabulary alignment (operators/vocab.py): schema.org scheme
canonicalization + curated predicate mapping, the WDC normalization
pass between extraction and fusion."""

from __future__ import annotations

from rdf_diff_store_spark.operators.structured import RDF_TYPE, XSD_STRING
from rdf_diff_store_spark.operators.vocab import (
    align_predicates,
    canonicalize_schema_org,
    og_mapping,
)


def _t(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, subj string, pred string, obj string, "
        "obj_dt string, obj_lang string",
    )


class TestCanonicalizeSchemaOrg:
    def test_folds_all_variants(self, spark):
        out = canonicalize_schema_org(
            _t(
                spark,
                [
                    ("u", "s", "http://schema.org/name", "x", XSD_STRING, None),
                    ("u", "s", "https://www.schema.org/name", "y", XSD_STRING, None),
                    ("u", "s", "http://www.schema.org/name", "z", XSD_STRING, None),
                    ("u", "s", "https://schema.org/name", "w", XSD_STRING, None),
                ],
            )
        ).collect()
        assert {r["pred"] for r in out} == {"https://schema.org/name"}

    def test_type_objects_fold_but_literals_dont(self, spark):
        out = canonicalize_schema_org(
            _t(
                spark,
                [
                    ("u", "s", RDF_TYPE, "http://schema.org/Person", None, None),
                    # literal whose TEXT is a schema.org url: untouched
                    ("u", "s", "https://schema.org/text",
                     "http://schema.org/Person", XSD_STRING, None),
                ],
            )
        ).collect()
        iri = next(r for r in out if r["obj_dt"] is None)
        lit = next(r for r in out if r["obj_dt"] is not None)
        assert iri["obj"] == "https://schema.org/Person"
        assert lit["obj"] == "http://schema.org/Person"

    def test_non_schema_predicates_untouched(self, spark):
        out = canonicalize_schema_org(
            _t(spark, [("u", "s", "http://ogp.me/ns#title", "t", XSD_STRING, None)])
        ).collect()
        assert out[0]["pred"] == "http://ogp.me/ns#title"


class TestAlignPredicates:
    def test_og_mapping_and_passthrough(self, spark):
        out = align_predicates(
            _t(
                spark,
                [
                    ("u", "s", "http://ogp.me/ns#title", "t", XSD_STRING, None),
                    ("u", "s", "http://ogp.me/ns#locale", "en", XSD_STRING, None),
                    ("u", "s", "https://schema.org/sku", "k", XSD_STRING, None),
                ],
            ),
            og_mapping(spark),
        ).collect()
        preds = sorted(r["pred"] for r in out)
        assert preds == [
            "https://schema.org/inLanguage",
            "https://schema.org/name",
            "https://schema.org/sku",
        ]

    def test_type_objects_mapped(self, spark):
        mapping = spark.createDataFrame(
            [("http://ogp.me/ns#Article", "https://schema.org/Article")],
            "from_pred string, to_pred string",
        )
        out = align_predicates(
            _t(
                spark,
                [
                    ("u", "s", RDF_TYPE, "http://ogp.me/ns#Article", None, None),
                    # non-type IRI object with the same value: untouched
                    ("u", "s", "https://schema.org/about",
                     "http://ogp.me/ns#Article", None, None),
                ],
            ),
            mapping,
        ).collect()
        typed = next(r for r in out if r["pred"] == RDF_TYPE)
        other = next(r for r in out if r["pred"] != RDF_TYPE)
        assert typed["obj"] == "https://schema.org/Article"
        assert other["obj"] == "http://ogp.me/ns#Article"

    def test_plan_is_broadcast_shuffle_free(self, spark):
        plan = (
            align_predicates(
                _t(spark, [("u", "s", "p", "o", None, None)]), og_mapping(spark)
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "SortMergeJoin" not in plan
        # any hash exchange must be on the tiny MAPPING side (its
        # defensive distinct), never keyed on triple columns
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "from_pred" in line or "_from_o" in line, line

    def test_columns_preserved(self, spark):
        df = align_predicates(
            _t(spark, [("u", "s", "p", "o", None, None)]), og_mapping(spark)
        )
        assert df.columns == ["url", "subj", "pred", "obj", "obj_dt", "obj_lang"]
