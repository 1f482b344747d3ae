"""Inverted-index construction: term → (document frequency, collection
frequency, capped postings list) — the retrieval-index build pass over
a web corpus.

The reference's query side answers SPARQL over materialized snapshots
(/root/reference/src/query.rs:96-160); a text corpus's equivalent
"query-ready materialization" is the inverted index that BM25/tf-idf
retrieval (functions/text.py scoring queries) reads. This operator is
the classic two-stage distributed index build (the original MapReduce
use case):

  stage 1 — tokenize + explode, partial-aggregate (term, doc) term
            frequencies map-side, ONE shuffle on (term, doc_id);
  stage 2 — fold per-term: df = count of docs, cf = Σtf, postings =
            the first ``postings_cap`` doc ids in ascending order.

Scale notes: the (term, doc_id) pre-aggregation bounds stage-2 input
to the distinct pair count (not token count); the postings cap bounds
per-term reducer state to a constant, so stop-word terms with 10^11
postings cannot OOM a reducer — production indexes shard full postings
by (term, bucket) instead, which is this same plan with doc_id%B added
to the stage-2 key. Postings are emitted as a comma-joined string (a
stable, engine-portable surface; numeric sort happens BEFORE the
string render on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_cap: int = 10,
    min_df: int = 1,
) -> DataFrame:
    """Build the term-level index: (term, df, cf, postings).

    Tokenization is the corpus-audit standard used across this repo
    (lowercase, whitespace split — the same expression as
    `corpus_vocab_topk`, proven oracle-portable); ``min_df`` prunes
    hapax terms when the index is consumed for retrieval statistics.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("term"),
    ).filter(F.length("term") > 0)
    tf = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    out = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.concat_ws(
            ",",
            F.transform(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, postings_cap),
                lambda x: x.cast("string"),
            ),
        ).alias("postings"),
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out
