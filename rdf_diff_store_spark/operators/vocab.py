"""Vocabulary alignment for web-extracted triples — the normalization
pass the Web Data Commons pipeline runs between extraction and any
cross-site aggregation: publishers write the SAME property a dozen
ways (``http://schema.org/name`` vs ``https://schema.org/name`` vs
``og:title`` vs Dublin Core), and fusion/entailment only work once
those collapse onto one canonical vocabulary.

Two composable pieces, both shuffle-free:

* ``canonicalize_schema_org`` — the scheme/host mess: schema.org
  recommends ``http://schema.org/`` terms but serves everything on
  https, and real markup uses both plus ``www.``; one JVM
  regexp_replace folds the four variants onto ``https://schema.org/``
  (the repo-wide spelling) in predicates AND in rdf:type / IRI
  objects.
* ``align_predicates`` — a (from_pred, to_pred) mapping frame (e.g.
  the OpenGraph→schema.org correspondence og:title→name) applied by
  BROADCAST left join; unmapped predicates pass through. The mapping
  is curated and tiny (10²-10⁴ rows) against 10^12 triples — never a
  shuffle on the triple side.

Reference context: /root/reference/src/graphs.rs:30-61 stores whatever
predicates arrive; on web data this pass is what keeps its store from
fragmenting one property over a dozen spellings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.structured import RDF_TYPE

_SCHEMA_ORG_VARIANTS = r"^https?://(www\.)?schema\.org/"
_SCHEMA_ORG = "https://schema.org/"


def canonicalize_schema_org(triples: DataFrame) -> DataFrame:
    """Fold http/https/www schema.org spellings onto
    ``https://schema.org/`` in `pred`, and in `obj` when the object is
    an IRI (term convention: obj_dt and obj_lang both NULL) — class
    IRIs in rdf:type objects are where the variant mess bites hardest.
    Literals are never touched, even if their text looks like a
    schema.org URL. Pure JVM regexp — map-only, zero shuffles."""
    fold = lambda c: F.regexp_replace(c, _SCHEMA_ORG_VARIANTS, _SCHEMA_ORG)  # noqa: E731
    is_iri_obj = F.col("obj_dt").isNull() & F.col("obj_lang").isNull()
    return triples.withColumn("pred", fold(F.col("pred"))).withColumn(
        "obj",
        F.when(is_iri_obj, fold(F.col("obj"))).otherwise(F.col("obj")),
    )


def align_predicates(
    triples: DataFrame,
    mapping: DataFrame,
    map_type_objects: bool = True,
) -> DataFrame:
    """Rewrite predicates through a curated (from_pred, to_pred)
    correspondence table — broadcast left join, unmapped predicates
    unchanged. With ``map_type_objects`` (default) the mapping is also
    applied to rdf:type OBJECTS (class correspondences like
    og:type values → schema.org classes ride the same table).

    The mapping frame must be small (it's hand-curated vocabulary
    alignment, not data): it is broadcast explicitly, so the triple
    side keeps its partitioning and the plan stays shuffle-free."""
    m = F.broadcast(mapping.select("from_pred", "to_pred").distinct())
    out = (
        triples.join(m, triples["pred"] == m["from_pred"], "left")
        .withColumn("pred", F.coalesce(F.col("to_pred"), F.col("pred")))
        .drop("from_pred", "to_pred")
    )
    if map_type_objects:
        m2 = F.broadcast(
            mapping.select(
                F.col("from_pred").alias("_from_o"),
                F.col("to_pred").alias("_to_o"),
            ).distinct()
        )
        is_type_iri = (
            (F.col("pred") == RDF_TYPE)
            & F.col("obj_dt").isNull()
            & F.col("obj_lang").isNull()
        )
        out = (
            out.join(
                m2,
                is_type_iri & (out["obj"] == m2["_from_o"]),
                "left",
            )
            .withColumn("obj", F.coalesce(F.col("_to_o"), F.col("obj")))
            .drop("_from_o", "_to_o")
        )
    return out


# The OpenGraph → schema.org correspondence shipped as a default
# curated mapping (the og: terms extract_rdfa emits for <meta
# property="og:..."> head metadata; ogp.me documents the intended
# schema.org equivalence).
OG_SCHEMA_MAPPING: list[tuple[str, str]] = [
    ("http://ogp.me/ns#title", "https://schema.org/name"),
    ("http://ogp.me/ns#description", "https://schema.org/description"),
    ("http://ogp.me/ns#url", "https://schema.org/url"),
    ("http://ogp.me/ns#image", "https://schema.org/image"),
    ("http://ogp.me/ns#site_name", "https://schema.org/publisher"),
    ("http://ogp.me/ns#locale", "https://schema.org/inLanguage"),
]


def og_mapping(spark) -> DataFrame:
    """The default OpenGraph→schema.org mapping as a frame for
    ``align_predicates``."""
    return spark.createDataFrame(
        OG_SCHEMA_MAPPING, "from_pred string, to_pred string"
    )
