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


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional phrase search: documents containing the exact token
    sequence ``phrase``, with overlapping-occurrence counts.

    This is the postings-INTERSECTION side of the index family: the
    classic positional-index phrase query (Manning et al., IIR §2.4)
    evaluated corpus-parallel. The plan is the 100 TB shape:

    * tokenize + posexplode, then FILTER to the phrase's words before
      anything wide — only postings of queried terms ever shuffle
      (the per-term selectivity a real index gets from seeking its
      postings lists, recovered here by predicate pushdown);
    * ONE shuffle: groupBy(doc) collecting one sorted position array
      per phrase slot (collect_list partial-aggregates map-side;
      per-group state is bounded by the doc's occurrences of the
      queried words, never doc length);
    * the intersection (start p where slot i contains p+i for all i)
      is a per-row array expression — whole-stage codegen, no UDF,
      no join. Overlapping matches count: a run of four "batch"
      tokens holds two starts of "batch batch batch".

    Token positions are indices into the RAW whitespace split (the
    corpus-standard tokenizer), so consecutive means adjacent words
    in the original text. Returns (id_col, n_matches, first_pos)
    for matching docs only.
    """
    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("phrase_search: empty phrase")
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.lower(F.trim(text_col)), r"\s+")).alias("pos", "term"),
    ).filter(F.col("term").isin(words))
    slots = toks.groupBy("_id").agg(
        *[
            F.array_sort(
                F.collect_list(F.when(F.col("term") == w, F.col("pos")))
            ).alias(f"_p{i}")
            for i, w in enumerate(words)
        ]
    )
    # single-parameter lambdas ONLY: a second (defaulted) parameter
    # would make F.filter pass the element index into it (the same
    # trap as F.transform(locs, F.trim) — higher-order functions
    # dispatch on lambda arity)
    def _step(arr, i: int):
        return F.filter(arr, lambda p: F.array_contains(F.col(f"_p{i}"), p + i))

    starts = F.col("_p0")
    for i in range(1, len(words)):
        starts = _step(starts, i)
    return (
        slots.withColumn("_starts", starts)
        .filter(F.size("_starts") > 0)
        .select(
            F.col("_id").alias(id_col),
            F.size("_starts").cast("bigint").alias("n_matches"),
            F.element_at("_starts", 1).cast("bigint").alias("first_pos"),
        )
    )
