"""Statistical boilerplate removal: strip lines that repeat across a
host's pages (navigation, footers, cookie banners) before the text
enters dedup/quality/KG stages.

The reference's prettify step (/root/reference/src/graphs.rs:52-61)
canonicalizes each graph so that PAYLOAD-identical writes are
detectable; a web-text pipeline needs the corpus-statistical analog
one level up: the same nav/footer lines rendered into every page of a
host are not content, and leaving them in poisons near-dup detection
(hub shingle buckets), quality scores (repetition), and the KG's
mention evidence. CCNet/RefinedWeb strip them by line frequency — a
line that appears in a large share of a host's pages is template, not
text. This module is that operator, expressed as three hash
aggregations; no Python worker anywhere.

Scale design (the 100 TB shape):

* The exploded ``(host, line)`` frame is the text itself — the scan
  cost, unavoidable. Everything aggregated from it is
  map-side-combinable: per-(host, line-hash) distinct-doc counts
  partial-aggregate before the ONE wide shuffle.
* Line identity is the md5 of the trimmed line, so the wide shuffle
  and the template join carry a 32-char key + counters, never the
  line text itself.
* Per-host page counts are one row per host — broadcast onto the
  line stats (hosts ≪ lines; a crawl has ~10^7 hosts, trivially
  broadcastable at 128 MB+ thresholds, and the join key is the
  host itself so skew equals host size, which AQE splits).
* The template set (lines over the share threshold) is a small
  fraction of distinct lines; applying it back is ONE equi-join on
  (host, line-hash) against the exploded frame, then one reassembly
  aggregation per doc. Three shuffles total on the big frame:
  stats, apply, reassemble.
* Thresholding is integer-only (``n_docs * 100 >= pct * host_pages``)
  so results are bit-identical across engines — the portable-oracle
  rule every operator here follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["line_stats", "template_lines", "strip_boilerplate"]


def _lines(pages: DataFrame, id_col: str, host_col: str, text_col: str) -> DataFrame:
    """Exploded (id, host, pos, line, h) frame; h = md5(trim(line)).

    Blank lines keep their position (they must survive into the
    reassembled text untouched) but carry h = NULL so they never
    enter the statistics or match a template row.
    """
    line = F.col("line")
    # NULL text must not drop the page from the output (posexplode
    # emits no row for a NULL array): treat it as empty text
    return pages.select(
        F.col(id_col).alias("_id"),
        F.col(host_col).alias("_host"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).withColumn(
        "h",
        F.when(F.length(F.trim(line)) > 0, F.md5(F.trim(line))),
    )


def line_stats(
    pages: DataFrame, id_col: str = "doc_id", host_col: str = "host", text_col: str = "text"
) -> DataFrame:
    """Per-(host, line) occurrence statistics: in how many of the
    host's pages does the line appear?

    Returns (host, h, n_docs, host_pages). ONE wide shuffle on
    (host, h) with map-side partial agg — a doc repeating a line
    contributes once via the distinct — plus a broadcast of the
    per-host page counts.
    """
    lines = _lines(pages, id_col, host_col, text_col)
    stats = (
        lines.filter(F.col("h").isNotNull())
        .groupBy("_host", "h")
        .agg(F.count_distinct("_id").alias("n_docs"))
    )
    host_pages = pages.groupBy(F.col(host_col).alias("_host")).agg(
        F.count("*").alias("host_pages")
    )
    return (
        stats.join(F.broadcast(host_pages), "_host")
        .select(
            F.col("_host").alias("host"),
            "h",
            "n_docs",
            "host_pages",
        )
    )


def template_lines(
    pages: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
    share_pct: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """The template set: (host, h) pairs whose line appears in at
    least ``share_pct`` percent of the host's pages AND at least
    ``min_docs`` pages (so single-page hosts never self-template).

    Integer threshold arithmetic — bit-identical across engines.
    """
    s = line_stats(pages, id_col, host_col, text_col)
    return s.filter(
        (F.col("n_docs") * 100 >= F.lit(share_pct) * F.col("host_pages"))
        & (F.col("n_docs") >= F.lit(min_docs))
    ).select("host", "h")


def strip_boilerplate(
    pages: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
    share_pct: int = 50,
    min_docs: int = 2,
    checkpoint_lines: bool = False,
) -> DataFrame:
    """Remove template lines from every page of their host.

    Returns one row per input page: (id_col, host_col, clean_text,
    n_lines, n_removed). Line order inside the surviving text is
    preserved (reassembly sorts by original position inside the
    per-doc aggregation — a sort *within* collect_list's struct
    array, never a global sort).

    Pages whose every line is template come back with clean_text = ''
    (they are pure navigation shells — downstream quality filters
    drop them on length).

    ``checkpoint_lines=True`` materializes the exploded line frame
    once (EAGER localCheckpoint — two branches of one job would
    racily double-compute a lazy one) so the stats branch and the
    apply branch share the split+md5 work instead of each re-running
    it; costs local-disk space ≈ the text itself. Default off: the
    declarative form lets Catalyst push page-level filters into both
    scans, which the checkpoint barrier would block.
    """
    lines_src = _lines(pages, id_col, host_col, text_col)
    if checkpoint_lines:
        lines_src = lines_src.localCheckpoint(eager=True)
        stats = (
            lines_src.filter(F.col("h").isNotNull())
            .groupBy("_host", "h")
            .agg(F.count_distinct("_id").alias("n_docs"))
        )
        host_pages = (
            lines_src.filter(F.col("pos") == 0)
            .groupBy("_host")
            .agg(F.count("*").alias("host_pages"))
        )
        templates = (
            stats.join(F.broadcast(host_pages), "_host")
            .filter(
                (F.col("n_docs") * 100 >= F.lit(share_pct) * F.col("host_pages"))
                & (F.col("n_docs") >= F.lit(min_docs))
            )
            .select(F.col("_host").alias("host"), "h")
        )
    else:
        templates = template_lines(
            pages, id_col, host_col, text_col, share_pct, min_docs
        )
    lines = lines_src
    # rename the template keys before joining: under checkpoint_lines
    # both sides share the checkpointed plan's lineage, and
    # dataframe-qualified access would be ambiguous
    tpl = templates.select(
        F.col("host").alias("_t_host"), F.col("h").alias("_t_h")
    )
    flagged = lines.join(
        tpl,
        (F.col("_host") == F.col("_t_host")) & (F.col("h") == F.col("_t_h")),
        "left_outer",
    ).select(
        "_id",
        "_host",
        "pos",
        "line",
        F.col("_t_h").isNotNull().alias("is_template"),
    )
    kept = F.filter(
        F.array_sort(
            F.collect_list(
                F.when(
                    ~F.col("is_template"), F.struct(F.col("pos"), F.col("line"))
                )
            )
        ),
        lambda s: s.isNotNull(),
    )
    return (
        flagged.groupBy("_id", "_host")
        .agg(
            F.concat_ws(
                "\n", F.transform(kept, lambda s: s["line"])
            ).alias("clean_text"),
            F.count("*").alias("n_lines"),
            F.sum(F.col("is_template").cast("bigint")).alias("n_removed"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("_host").alias(host_col),
            "clean_text",
            "n_lines",
            "n_removed",
        )
    )
