"""Deterministic synthetic Common-Crawl-style pages (input_hint shape:
url, warc_ts, html, text, lang) — generated entirely with JVM-side
expressions from `spark.range`, seeded by xxhash64, so the same call
is byte-identical on every run and every executor, at any parallelism.

Generator contract (FIXTURES.md §1 guidance):
* every live url is captured once per crawl round (n_crawls rounds,
  1 day apart starting 2024-01-01);
* ~10% of (url, round>0) captures repeat the previous round's content
  byte-identically → exercises the idempotent-write skip
  (reference: src/graphs.rs:52-61);
* ~5% of urls disappear halfway through the crawl → delete tombstones
  (reference: src/graphs.rs:82-93);
* every page mentions exactly 3 entities at fixed word positions
  (5, 12, 19); entity popularity is quadratically skewed so low ids
  are hub entities (exercises skew handling);
* entities with base % 3 != 0 have two alias tokens (ENT{k}a/ENT{k}b);
  ~1 in 7 urls has a *mirror* url carrying the same body text with the
  alias characters flipped — near-duplicate pages whose only diffs are
  alias mentions. MinHash-LSH + position alignment + connected
  components must rediscover the alias equivalences (north_star
  entity-canonicalization stage); `expected_alias_pairs` is the truth
  set for the P/R >= 0.95 gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = [
    "data", "graph", "store", "query", "merge", "table", "crawl", "page",
    "index", "link", "text", "value", "node", "edge", "batch", "round",
    "shard", "block", "field", "token", "model", "scale", "spark", "join",
    "hash", "sort", "scan", "read", "write", "cache", "plan", "cost",
    "time", "stamp", "delta", "snap", "shot", "diff", "view", "form",
]
N_WORDS = 30  # body length in words
MENTION_SLOTS = (5, 12, 19)
LANGS = ["en", "de", "fr", "es", "nb"]
N_SITES = 20
BASE_TS = "2024-01-01 00:00:00"


def _h(*cols) -> Column:
    return F.xxhash64(*[c if isinstance(c, Column) else F.lit(c) for c in cols])


def _u(*cols) -> Column:
    """Deterministic uniform [0,1)."""
    return F.pmod(_h(*cols), F.lit(1_000_000)).cast("double") / 1_000_000.0


def _entity_base(base_id: Column, slot: int, n_entities: int) -> Column:
    """Quadratically skewed entity id: hubs at low ids."""
    u = _u("ent", base_id, slot)
    return F.floor(F.lit(float(n_entities)) * u * u).cast("long")


def _has_two_aliases(base: Column) -> Column:
    return F.pmod(base, F.lit(3)) != 0


def _entity_token(base: Column, alias_bit: Column) -> Column:
    """'ENT{base}a' or (for two-alias entities with bit set) 'ENT{base}b'."""
    char = F.when(_has_two_aliases(base) & alias_bit, F.lit("b")).otherwise(F.lit("a"))
    return F.concat(F.lit("ENT"), base.cast("string"), char)


def _drop_round(base_id: Column, n_crawls: int) -> Column:
    """Round from which the url disappears (n_crawls = never, ~5% drop
    at the halfway round)."""
    return F.when(
        F.pmod(_h("drop", base_id), F.lit(20)) == 0, F.lit(max(n_crawls // 2, 1))
    ).otherwise(F.lit(n_crawls))


def generate_pages(
    spark: SparkSession,
    n_urls: int = 1000,
    n_crawls: int = 4,
    n_entities: int = 200,
    partitions: int | None = None,
) -> DataFrame:
    """Pages table (url, warc_ts, html, text, lang) plus bookkeeping
    columns (url_id, base_id, is_mirror, crawl_round) that downstream
    tests may use; the pipeline itself only reads the input_hint five.
    """
    base = spark.range(n_urls).select(F.col("id").alias("base_id"))
    if partitions:
        base = base.repartition(partitions)

    # mirror expansion: ~1/7 of urls also exist as an alias-flipped twin
    variants = base.select(
        "base_id",
        F.explode(
            F.when(
                F.pmod(_h("mirror", F.col("base_id")), F.lit(7)) == 0,
                F.array(F.lit(False), F.lit(True)),
            ).otherwise(F.array(F.lit(False)))
        ).alias("is_mirror"),
    )

    rounds = variants.select(
        "base_id",
        "is_mirror",
        F.explode(F.sequence(F.lit(0), F.lit(n_crawls - 1))).alias("crawl_round"),
    ).filter(F.col("crawl_round") < _drop_round(F.col("base_id"), n_crawls))

    # ~10% of round>0 captures repeat the previous round's content
    dup = (F.pmod(_h("dup", F.col("base_id"), F.col("crawl_round")), F.lit(10)) == 0) & (
        F.col("crawl_round") > 0
    )
    cv = (F.col("crawl_round") - dup.cast("int")).alias("content_version")

    rows = rounds.select("base_id", "is_mirror", "crawl_round", cv)

    # entity tokens for the three mention slots (fixed per base_id;
    # mirrors flip the alias bit of two-alias entities)
    def slot_token(slot: int) -> Column:
        b = _entity_base(F.col("base_id"), slot, n_entities)
        bit = (F.pmod(_h("alias", F.col("base_id"), slot), F.lit(2)) == 0) != F.col("is_mirror")
        return _entity_token(b, bit)

    # body: 30 words, mention slots substituted, rest vocab-by-hash
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    word_cols = []
    for p in range(N_WORDS):
        if p in MENTION_SLOTS:
            word_cols.append(slot_token(MENTION_SLOTS.index(p)))
        else:
            idx = F.pmod(_h("w", F.col("base_id"), F.col("content_version"), p), F.lit(len(VOCAB)))
            word_cols.append(F.element_at(vocab, (idx + 1).cast("int")))
    text = F.concat_ws(" ", *word_cols)

    site = F.pmod(F.col("base_id"), F.lit(N_SITES))
    boiler = F.concat(
        F.lit("home about contact sitemap site"), site.cast("string"), F.lit(" navigation menu")
    )
    url = F.concat(
        F.lit("https://site"),
        site.cast("string"),
        F.lit(".example.org/p/"),
        F.col("base_id").cast("string"),
        F.when(F.col("is_mirror"), F.lit("-m")).otherwise(F.lit("")),
    )
    lang = F.element_at(
        F.array(*[F.lit(lg) for lg in LANGS]),
        (F.pmod(_h("lang", F.col("base_id")), F.lit(len(LANGS))) + 1).cast("int"),
    )
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS).cast("timestamp")) + F.col("crawl_round") * 86400
    )
    html = F.concat(
        F.lit("<html><head><title>Page "),
        F.col("base_id").cast("string"),
        F.lit("</title></head><body><nav>"),
        boiler,
        F.lit("</nav><p>"),
        text,
        F.lit("</p></body></html>"),
    )

    return rows.select(
        url.alias("url"),
        warc_ts.cast("timestamp").alias("warc_ts"),
        html.cast("binary").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        "base_id",
        "is_mirror",
        "crawl_round",
        "content_version",
    )


def expected_alias_pairs(spark: SparkSession, n_urls: int, n_entities: int = 200) -> DataFrame:
    """Truth set for entity canonicalization: (token_a, token_b) pairs
    that the LSH+CC stage must merge — two-alias entities mentioned on
    at least one mirrored url. Derived with the same seeded
    expressions as the generator, independently of the pipeline."""
    base = spark.range(n_urls).select(F.col("id").alias("base_id"))
    mirrored = base.filter(F.pmod(_h("mirror", F.col("base_id")), F.lit(7)) == 0)
    slots = mirrored.select(
        "base_id", F.explode(F.array(*[F.lit(s) for s in range(len(MENTION_SLOTS))])).alias("slot")
    )
    b = F.when(F.col("slot") == 0, _entity_base(F.col("base_id"), 0, n_entities)).when(
        F.col("slot") == 1, _entity_base(F.col("base_id"), 1, n_entities)
    ).otherwise(_entity_base(F.col("base_id"), 2, n_entities))
    pairs = (
        slots.select(b.alias("base"))
        .filter(_has_two_aliases(F.col("base")))
        .select(
            F.concat(F.lit("ENT"), F.col("base").cast("string"), F.lit("a")).alias("token_a"),
            F.concat(F.lit("ENT"), F.col("base").cast("string"), F.lit("b")).alias("token_b"),
        )
        .distinct()
    )
    return pairs
