"""WebTables-style relation extraction from HTML ``<table>`` markup
(Cafarella et al., "WebTables: Exploring the Power of Tables on the
Web", VLDB 2008) — the third big structured-data channel on the open
web next to JSON-LD/microdata/RDFa (operators/structured.py).

Two stages with different execution characters:

* ``extract_table_cells`` — the PARSE: one Arrow ``mapInPandas`` hop
  over a JVM-prefiltered page frame (stdlib ``html.parser``), emitting
  one row per data cell: ``(url, table_idx, row_idx, col_idx, header,
  value)``. Map-only, embarrassingly parallel at 10^12 pages.
* ``table_cells_to_triples`` — the LIFT: pure JVM column expressions
  minting (url, subj, pred, obj, obj_dt, obj_lang) triples in the
  repo's shared term convention — row entities are per-page blank
  labels (``_:t0r2``) so the output composes with
  ``structured.skolemize`` and ``sources/nquads.py`` unchanged.

Header model (deterministic, no classifier): a table's header is its
FIRST row iff every cell in that row is a ``<th>``; otherwise the
table has synthetic positional headers ``col0..colN``. Header
``colspan`` repeats the header over the spanned columns (common for
grouped headers); ``rowspan`` is not modeled (documented deviation —
the WDC table corpus drops those tables too). Nested tables are
separate relations in document order, and their text never leaks into
the enclosing cell.

Reference context: /root/reference/src/graphs.rs:30-61 ingests
already-materialized RDF; on the open web a large share of that RDF
is minted from exactly these tables (the WDC Web Table Corpus path).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from rdf_diff_store_spark.operators.structured import (
    DEFAULT_VOCAB,
    XSD_INTEGER,
    XSD_STRING,
)

_WS_RE = re.compile(r"\s+")

_CELL_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("table_idx", IntegerType()),
        StructField("row_idx", IntegerType()),
        StructField("col_idx", IntegerType()),
        StructField("header", StringType()),
        StructField("value", StringType()),
    ]
)
_CELL_COLS = ["url", "table_idx", "row_idx", "col_idx", "header", "value"]

# void/ignored content containers whose text must not reach a cell
_SKIP_TEXT = {"script", "style"}


class _TableParser(HTMLParser):
    """Event-driven table walker: a stack of open tables (nested
    tables pause the outer cell's text collection), first-row-all-th
    header detection, header colspan expansion."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.cells: list = []  # (table_idx, row_idx, col_idx, header, value)
        self._n_tables = 0
        self._tables: list = []  # stack of table dicts
        self._skip = 0  # inside <script>/<style>

    # -- table lifecycle --------------------------------------------
    def _open_table(self) -> None:
        self._tables.append(
            {
                "idx": self._n_tables,
                "rows": [],  # finalized rows: list of (is_th, colspan, text)
                "row": None,  # open row: list of cells
                "cell": None,  # open cell: [is_th, colspan, parts]
            }
        )
        self._n_tables += 1

    def _close_cell(self, t: dict) -> None:
        if t["cell"] is not None and t["row"] is not None:
            is_th, span, parts = t["cell"]
            text = _WS_RE.sub(" ", "".join(parts)).strip()
            t["row"].append((is_th, span, text))
        t["cell"] = None

    def _close_row(self, t: dict) -> None:
        self._close_cell(t)
        if t["row"] is not None:
            t["rows"].append(t["row"])
        t["row"] = None

    def _close_table(self) -> None:
        t = self._tables.pop()
        self._close_row(t)
        # spacer rows (<tr></tr>) have no relational existence: drop
        # them BEFORE header detection or a leading empty row would
        # vacuously pass the all-th test and shift every data row
        rows = [r for r in t["rows"] if r]
        if not rows:
            return
        # header = first row iff ALL its cells are <th>
        headers: list[str] = []
        data_rows = rows
        if all(is_th for is_th, _, _ in rows[0]):
            for _, span, text in rows[0]:
                headers.extend([text] * span)
            data_rows = rows[1:]
        for r_i, row in enumerate(data_rows):
            c_i = 0
            for _, span, text in row:
                for _ in range(span):
                    header = (
                        headers[c_i] if c_i < len(headers) else f"col{c_i}"
                    )
                    self.cells.append((t["idx"], r_i, c_i, header, text))
                    c_i += 1

    # -- events -------------------------------------------------------
    def handle_starttag(self, tag: str, attrs: list) -> None:
        if tag in _SKIP_TEXT:
            self._skip += 1
            return
        if tag == "table":
            self._open_table()
            return
        if not self._tables:
            return
        t = self._tables[-1]
        if tag == "tr":
            self._close_row(t)
            t["row"] = []
        elif tag in ("td", "th"):
            self._close_cell(t)
            if t["row"] is None:  # tbody-less markup: td implies a row
                t["row"] = []
            a = dict(attrs)
            try:
                span = max(1, min(int(a.get("colspan") or 1), 1000))
            except ValueError:
                span = 1
            t["cell"] = [tag == "th", span, []]
        elif tag == "br" and t["cell"] is not None:
            t["cell"][2].append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TEXT:
            self._skip = max(0, self._skip - 1)
            return
        if tag == "table" and self._tables:
            self._close_table()
            return
        if not self._tables:
            return
        t = self._tables[-1]
        if tag == "tr":
            self._close_row(t)
        elif tag in ("td", "th"):
            self._close_cell(t)

    def handle_data(self, data: str) -> None:
        if self._skip or not self._tables:
            return
        cell = self._tables[-1]["cell"]
        if cell is not None:
            cell[2].append(data)

    def close(self) -> None:  # unclosed trailing tables still emit
        super().close()
        while self._tables:
            self._close_table()


def table_cells_of_page(html: str) -> list:
    """(table_idx, row_idx, col_idx, header, value) cells of one
    page's tables, document order. Pure — no Spark needed."""
    p = _TableParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return p.cells  # keep whatever parsed before the breakage
    return p.cells


def extract_table_cells(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    parallelism: int | None = None,
) -> DataFrame:
    """(url, table_idx, row_idx, col_idx, header, value) from every
    HTML table of `pages`. Same scale shape as the structured.py
    extractors: JVM ``<table`` prefilter, explicit repartition (AQE
    over-coalesces compact text frames), ONE Arrow hop, map-only."""
    html_str = F.col(html_col).cast("string")
    src = pages.select(F.col(url_col).alias("url"), html_str.alias("_html")).filter(
        F.lower(F.col("_html")).contains("<table")
    )
    spark = pages.sparkSession
    n_parts = parallelism or spark.sparkContext.defaultParallelism * 2
    src = src.repartition(n_parts)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["_html"]):
                for c in table_cells_of_page(html):
                    rows.append((url, *c))
            yield pd.DataFrame(rows, columns=_CELL_COLS)

    return src.mapInPandas(_parse, _CELL_SCHEMA)


_INT_LEXICAL = r"^-?[0-9]+$"


def table_cells_to_triples(
    cells: DataFrame,
    vocab: str = DEFAULT_VOCAB,
) -> DataFrame:
    """Lift table cells into (url, subj, pred, obj, obj_dt, obj_lang)
    triples: row entity = per-page blank label ``_:t{T}r{R}`` (feed
    through ``structured.skolemize`` before any cross-page union),
    predicate = vocab + header slugged to ``[a-z0-9_]`` (WebTables
    attribute normalization), object = the cell text — xsd:integer
    when the whole lexical form is an optionally-signed digit string
    (the one type the corpus sniffs reliably), else xsd:string. Empty
    cells emit no triple (a missing attribute, not an empty value).

    Pure JVM expressions end-to-end: appended to the parse plan this
    stays ONE Arrow hop + zero extra shuffles."""
    slug = F.regexp_replace(F.lower(F.col("header")), r"[^a-z0-9]+", "_")
    slug = F.regexp_replace(slug, r"^_+|_+$", "")
    slug = F.when(slug == "", F.lit("col")).otherwise(slug)
    is_int = F.col("value").rlike(_INT_LEXICAL)
    return (
        cells.filter(F.col("value") != "")
        .select(
            F.col("url"),
            F.format_string(
                "_:t%dr%d", F.col("table_idx"), F.col("row_idx")
            ).alias("subj"),
            F.concat(F.lit(vocab), slug).alias("pred"),
            F.col("value").alias("obj"),
            F.when(is_int, F.lit(XSD_INTEGER))
            .otherwise(F.lit(XSD_STRING))
            .alias("obj_dt"),
            F.lit(None).cast("string").alias("obj_lang"),
        )
    )


def align_headers(
    headers: DataFrame,
    pred_labels: DataFrame,
    max_lev: int = 1,
) -> DataFrame:
    """Schema matching for WebTables: map table-header slugs onto KG
    predicates by curated label, tolerating the misspellings and
    truncations web-authored tables carry (Cafarella VLDB 2008 §4.1's
    schema statistics step; the attribute-correspondence half of
    Ritze et al. T2K, WIMS 2015). `table_cells_to_triples` slugs
    whatever the page said; this aligns those slugs to the curated
    vocabulary so downstream fusion sees ONE predicate per concept —
    the same role `vocab.align_predicates` plays for extracted IRIs,
    lifted to fuzzy string space.

    Input: ``headers`` (header) — distinct slugs, vocabulary-sized,
    NOT the per-cell corpus; ``pred_labels`` (label, pred) — the
    curated dictionary. Output: (header, pred, distance) — the single
    best alignment per header (lowest levenshtein, ties to the
    lexicographically smallest pred), unmatched headers absent.

    Scale shape — the `entity_link_blocked` discipline applied to
    schema space: candidate pairs are minted by an EQUI-join on FastSS
    deletion variants (`pipeline.linking.deletion_variants` — 100%
    recall for the levenshtein band, never a broadcast nested loop
    over |headers| × |dict|), verified by one JVM levenshtein filter,
    then a per-header min fold. Both sides are header-vocabulary-sized
    (10^6-10^8 distinct slugs at web scale, labels 10^3-10^5); the
    only corpus-sized step is the caller's map-back equi-join."""
    from pyspark.sql import Window  # noqa: PLC0415

    from rdf_diff_store_spark.pipeline.linking import deletion_variants

    h = headers.select(F.col("header")).distinct()
    hv = h.select(
        "header", F.explode(deletion_variants(F.col("header"), max_lev)).alias("v")
    )
    lv = pred_labels.select(
        F.col("label"), F.col("pred"),
        F.explode(deletion_variants(F.col("label"), max_lev)).alias("v"),
    )
    pairs = (
        hv.join(lv, "v")
        .select("header", "label", "pred")
        .distinct()
        .filter(F.levenshtein(F.col("header"), F.col("label")) <= max_lev)
        .withColumn("distance", F.levenshtein(F.col("header"), F.col("label")))
    )
    w = Window.partitionBy("header").orderBy(F.col("distance"), F.col("pred"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("header", "pred", "distance")
    )
