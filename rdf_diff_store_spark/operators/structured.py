"""Embedded structured-data extraction from HTML — the Web Data
Commons path over Common Crawl: schema.org JSON-LD blocks
(``<script type="application/ld+json">``) and HTML microdata
(``itemscope``/``itemtype``/``itemprop``) lifted into
(url, subj, pred, obj, obj_dt, obj_lang) triples in the repo's
shared term convention (literal iff obj_dt/obj_lang set, plain
literals xsd:string, IRIs both-NULL) — directly composable with
`sources/nquads.py::serialize_nquads` and the versioned changelog.

This is the "triple extraction" stage of BASELINE.json's north_star
that sits UPSTREAM of everything rdf-diff-store models: the reference
ingests already-materialized RDF (`/root/reference/src/graphs.rs:30-61`
stores whatever Turtle the API is handed), and on the open web that
Turtle comes from exactly these two embedding formats (WDC extracts
JSON-LD + microdata + RDFa from Common Crawl into the N-Quads dumps
our `sources/nquads.py` reads/writes). Output triples feed the
versioned changelog (`operators/versioned.py::append_updates`) and the
N-Quads sink unchanged.

Scale shape (100 TB of pages):
* a pure-JVM `contains`/regexp prefilter runs at the parquet scan, so
  pages without a marker never cross into Python — on real crawls
  most pages carry no structured data, and the filter is pushdown-able
  column pruning territory (url + html only);
* ONE Arrow `mapInPandas` hop per format does the actual parse
  (stdlib ``json`` / ``html.parser`` — per-row imperative work that
  genuinely can't be a JVM expression), map-only with ZERO shuffles:
  at 1000 executors it's embarrassingly parallel;
* an explicit repartition before the hop decouples parse parallelism
  from the compact upstream byte size (the AQE-coalescing trap
  CLAUDE.md documents for every CPU-heavy per-row stage).

Determinism: blank-node labels are allocated per page in document
order (``_:b0``, ``_:b1``, … for JSON-LD; ``_:md0``, … for
microdata), so the same page always yields byte-identical triples on
any executor at any parallelism — the property every oracle and the
idempotent-write path (content-hash anti-join) rely on.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
DEFAULT_VOCAB = "https://schema.org/"
_XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = _XSD + "string"  # sources/nquads.py:41 convention
XSD_INTEGER = _XSD + "integer"
XSD_DOUBLE = _XSD + "double"
XSD_BOOLEAN = _XSD + "boolean"
XSD_DATE = _XSD + "date"
XSD_DATETIME = _XSD + "dateTime"

# term convention shared with functions/turtle.py + sources/nquads.py:
# a triple object is a literal iff obj_dt OR obj_lang is set (plain
# literals carry xsd:string); IRIs/blank nodes have both NULL. This
# makes extractor output feed serialize_nquads / the versioned
# changelog with NO adaptation.
IRI = (None, None)  # (obj_dt, obj_lang) of an IRI-valued object

# ---------------------------------------------------------------------------
# JSON-LD
# ---------------------------------------------------------------------------

# Java regex (JVM side): lazily match script blocks whose type attr is
# application/ld+json, any attr order, case-insensitive, dotall.
_SCRIPT_BLOCK_RE = (
    r"(?is)<script\b[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>"
    r"(.*?)</script>"
)

_TRIPLE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("obj_dt", StringType()),
        StructField("obj_lang", StringType()),
    ]
)
_TRIPLE_COLS = ["url", "subj", "pred", "obj", "obj_dt", "obj_lang"]


def jsonld_blocks(html: Column) -> Column:
    """All raw JSON-LD script payloads of a page as array<string> —
    pure JVM `regexp_extract_all`, whole-stage codegen."""
    return F.regexp_extract_all(html, F.lit(_SCRIPT_BLOCK_RE), 1)


def _vocab_of(ctx) -> str:
    """Vocabulary base IRI from a JSON-LD @context (string form, dict
    with @vocab, or a list scanning for either); normalized to end in
    '/' or '#' so term expansion is concatenation."""
    v = None
    if isinstance(ctx, str):
        v = ctx
    elif isinstance(ctx, dict):
        vv = ctx.get("@vocab")
        if isinstance(vv, str):
            v = vv
    elif isinstance(ctx, list):
        for part in ctx:
            got = _vocab_of(part)
            if got != DEFAULT_VOCAB:
                return got
    if not v:
        return DEFAULT_VOCAB
    return v if v.endswith(("/", "#")) else v + "/"


def _prefixes_of(ctx) -> dict:
    """prefix -> IRI mappings from a dict-form @context (term
    definitions whose value is a string IRI)."""
    out: dict = {}
    if isinstance(ctx, dict):
        for k, v in ctx.items():
            if not k.startswith("@") and isinstance(v, str):
                out[k] = v
    elif isinstance(ctx, list):
        for part in ctx:
            out.update(_prefixes_of(part))
    return out


def _expand_term(term: str, vocab: str, prefixes: dict) -> str:
    """Expand a JSON-LD key / @type / microdata itemprop to an IRI:
    absolute IRIs pass through, `prefix:local` resolves against the
    context's term definitions, bare terms concatenate to the vocab."""
    if "://" in term:
        return term
    if ":" in term:
        prefix, local = term.split(":", 1)
        base = prefixes.get(prefix)
        if base:
            return base + local
        return term  # unknown prefixed name: keep verbatim (loud in data)
    mapped = prefixes.get(term)
    if mapped and "://" in mapped:
        return mapped
    return vocab + term


def _lex(v) -> tuple:
    """(lexical form, datatype IRI) of a JSON scalar — the JSON-LD
    §8.2 value-coercion table: strings are xsd:string (the turtle.py
    plain-literal convention), booleans xsd:boolean, integral numbers
    xsd:integer, fractional numbers xsd:double (shortest round-trip
    repr)."""
    if isinstance(v, bool):
        return ("true" if v else "false", XSD_BOOLEAN)
    if isinstance(v, str):
        return (v, XSD_STRING)
    if isinstance(v, float):
        return (repr(v), XSD_DOUBLE)
    if isinstance(v, int):
        return (str(v), XSD_INTEGER)
    # non-scalar reaching a literal position (malformed JSON-LD like
    # {"@value": {...}}): keep the data loud as a plain string, never
    # a mis-typed numeric literal
    return (str(v), XSD_STRING)


def _emit_list(values, vocab: str, prefixes: dict, out: list, bn: list) -> str:
    """Emit an RDF collection (rdf:first / rdf:rest cells, rdf:nil
    terminator) for a JSON-LD ``@list`` array and return its head term
    — ``rdf:nil`` itself for the empty list. Values follow the same
    rules as plain array members: scalars become typed literals,
    node objects recurse, ``@value`` wrappers carry language/datatype;
    JSON nulls are skipped per JSON-LD §4."""
    if not isinstance(values, list):
        values = [values]
    values = [
        v
        for v in values
        if v is not None
        and not (isinstance(v, dict) and "@value" in v and v["@value"] is None)
    ]
    if not values:
        return RDF_NIL
    cells = []
    for _ in values:
        cells.append(f"_:b{bn[0]}")
        bn[0] += 1
    for i, (cell, v) in enumerate(zip(cells, values)):
        if isinstance(v, dict):
            if "@value" in v:
                lex, dt = _lex(v["@value"])
                lang = v.get("@language")
                if isinstance(lang, str) and lang:
                    out.append((cell, RDF_FIRST, lex, None, lang))
                else:
                    vt = v.get("@type")
                    if isinstance(vt, str) and vt:
                        dt = _expand_term(vt, vocab, prefixes)
                    out.append((cell, RDF_FIRST, lex, dt, None))
            else:
                osubj = _flatten_node(v, vocab, prefixes, out, bn)
                out.append((cell, RDF_FIRST, osubj, *IRI))
        else:
            out.append((cell, RDF_FIRST, *_lex(v), None))
        nxt = cells[i + 1] if i + 1 < len(cells) else RDF_NIL
        out.append((cell, RDF_REST, nxt, *IRI))
    return cells[0]


def _flatten_node(node: dict, vocab: str, prefixes: dict, out: list, bn: list) -> str:
    """Depth-first JSON-LD node flattening. Returns the node's subject
    (its @id, or a fresh per-page blank label). Emits rdf:type for
    @type, one triple per (key, array element), recursing into nested
    objects; ``@value`` wrappers emit their literal with the wrapper's
    @language / expanded @type datatype; JSON nulls are ignored per
    JSON-LD §4. Triples are (subj, pred, obj, obj_dt, obj_lang) in the
    shared turtle/nquads term convention."""
    subj = node.get("@id")
    if not isinstance(subj, str) or not subj:
        subj = f"_:b{bn[0]}"
        bn[0] += 1
    types = node.get("@type")
    for t in types if isinstance(types, list) else ([types] if types else []):
        if isinstance(t, str):
            out.append((subj, RDF_TYPE, _expand_term(t, vocab, prefixes), *IRI))
    rev = node.get("@reverse")
    if isinstance(rev, dict):
        # JSON-LD §4.8 reverse properties: {"@reverse": {p: [n…]}}
        # emits (n, p, THIS node) — the child points AT us
        for rkey, rval in rev.items():
            rpred = _expand_term(rkey, vocab, prefixes)
            for ritem in rval if isinstance(rval, list) else [rval]:
                if isinstance(ritem, dict):
                    rsubj = _flatten_node(ritem, vocab, prefixes, out, bn)
                    out.append((rsubj, rpred, subj, *IRI))
                elif isinstance(ritem, str) and ritem:
                    out.append((ritem, rpred, subj, *IRI))
    for key, val in node.items():
        if key.startswith("@"):
            continue
        pred = _expand_term(key, vocab, prefixes)
        items = val if isinstance(val, list) else [val]
        for item in items:
            if item is None:
                continue
            if isinstance(item, dict):
                if "@list" in item:
                    # ordered values → an rdf:first/rdf:rest collection
                    # chain (JSON-LD §4.3.1 / RDF 1.1 §3.4); the cells
                    # are per-page blank labels, skolemize-ready
                    head = _emit_list(
                        item["@list"], vocab, prefixes, out, bn
                    )
                    out.append((subj, pred, head, *IRI))
                elif "@value" in item:
                    if item["@value"] is not None:
                        lex, dt = _lex(item["@value"])
                        lang = item.get("@language")
                        if isinstance(lang, str) and lang:
                            out.append((subj, pred, lex, None, lang))
                        else:
                            vt = item.get("@type")
                            if isinstance(vt, str) and vt:
                                dt = _expand_term(vt, vocab, prefixes)
                            out.append((subj, pred, lex, dt, None))
                else:
                    osubj = _flatten_node(item, vocab, prefixes, out, bn)
                    out.append((subj, pred, osubj, *IRI))
            elif isinstance(item, list):
                for sub in item:  # nested list: flatten one level
                    if sub is not None and not isinstance(sub, (dict, list)):
                        out.append((subj, pred, *_lex(sub), None))
            else:
                out.append((subj, pred, *_lex(item), None))
    return subj


def jsonld_triples_of_page(blocks: Iterable[str]) -> list:
    """All (subj, pred, obj, obj_dt, obj_lang) triples of one page's JSON-LD
    blocks, document order, deterministic blank labels. Malformed
    JSON blocks are skipped (the WDC convention — a broken publisher
    block must not poison the page's other blocks)."""
    out: list = []
    bn = [0]
    for block in blocks:
        try:
            doc = json.loads(block)
        except (ValueError, RecursionError):
            continue
        roots = doc if isinstance(doc, list) else [doc]
        for root in roots:
            if not isinstance(root, dict):
                continue
            ctx = root.get("@context")
            vocab, prefixes = _vocab_of(ctx), _prefixes_of(ctx)
            nodes = root.get("@graph")
            if isinstance(nodes, list):
                for n in nodes:
                    if isinstance(n, dict):
                        _flatten_node(n, vocab, prefixes, out, bn)
            else:
                _flatten_node(root, vocab, prefixes, out, bn)
    return out


def extract_jsonld(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    parallelism: int | None = None,
) -> DataFrame:
    """(url, subj, pred, obj, obj_dt, obj_lang) triples from every
    embedded JSON-LD block of `pages`. JVM prefilter + block slicing; ONE
    Arrow hop for the JSON parse; zero shuffles (map-only)."""
    html_str = F.col(html_col).cast("string")
    src = (
        pages.select(F.col(url_col).alias("url"), html_str.alias("_html"))
        .filter(F.lower(F.col("_html")).contains("application/ld+json"))
        .select("url", jsonld_blocks(F.col("_html")).alias("_blocks"))
        .filter(F.size("_blocks") > 0)
    )
    spark = pages.sparkSession
    n_parts = parallelism or spark.sparkContext.defaultParallelism * 2
    src = src.repartition(n_parts)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, blocks in zip(pdf["url"], pdf["_blocks"]):
                for t in jsonld_triples_of_page(blocks):
                    rows.append((url, *t))
            yield pd.DataFrame(rows, columns=_TRIPLE_COLS)

    return src.mapInPandas(_parse, _TRIPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Microdata
# ---------------------------------------------------------------------------

_WS_RE = re.compile(r"\s+")

_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_DATETIME_RE = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}")


def _sniff_temporal(lexical: str) -> str:
    """xsd datatype of a time/@datetime value (microdata-to-RDF §4.3
    lexical sniffing): full dates → xsd:date, date-times →
    xsd:dateTime, anything else (durations, years, months) stays a
    plain string."""
    if _DATE_RE.match(lexical):
        return XSD_DATE
    if _DATETIME_RE.match(lexical):
        return XSD_DATETIME
    return XSD_STRING


# value-carrying attribute per element name (HTML microdata §5.2.4)
_URL_VALUED = {
    "a": "href",
    "area": "href",
    "link": "href",
    "audio": "src",
    "embed": "src",
    "iframe": "src",
    "img": "src",
    "source": "src",
    "track": "src",
    "video": "src",
}
_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class _MicrodataParser(HTMLParser):
    """One-pass microdata walk (HTML §5.2): itemscope opens an item
    (subject = itemid or a fresh blank label), itemtype emits rdf:type
    and fixes the item's vocabulary (IRI up to the last '/' or '#'),
    itemprop on an itemscope element links parent→child, itemprop on
    a value element emits a literal/IRI from the element's value
    attribute or its whitespace-collapsed text content (time/@datetime
    values are sniffed to xsd:date / xsd:dateTime per the
    microdata-to-RDF spec §4.3; other literals carry the element's
    in-scope ``lang`` as a language tag per §2.3 — the inherited
    ``<html lang>`` case — or xsd:string when no language applies).
    Properties with multiple space-separated names emit one triple per
    name."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.triples: list = []
        self._bn = 0
        self._items: list = []  # open itemscope stack: (subj, vocab)
        self._frames: list = []  # open-element stack (non-void only)
        self._collectors: list = []  # active text-prop collectors

    # -- helpers ----------------------------------------------------
    def _emit(self, s: str, p: str, o: str, dt: str | None, lang: str | None) -> None:
        self.triples.append((s, p, o, dt, lang))

    def _cur(self):
        return self._items[-1] if self._items else None

    def _expand(self, name: str, vocab: str) -> str:
        return name if "://" in name else vocab + name

    # -- HTMLParser hooks -------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        void = tag in _VOID
        # effective language: the element's lang (xml:lang wins) or the
        # nearest ancestor's; lang="" resets to no-language per HTML
        raw_lang = a.get("xml:lang", a.get("lang"))
        if raw_lang is None:
            elang = self._frames[-1]["lang"] if self._frames else None
        else:
            elang = raw_lang or None
        frame = {"tag": tag, "item": False, "collector": None, "lang": elang}
        cur = self._cur()
        props = (a.get("itemprop") or "").split()
        if "itemscope" in a:
            subj = a.get("itemid") or f"_:md{self._bn}"
            if not a.get("itemid"):
                self._bn += 1
            vocab = DEFAULT_VOCAB
            types = (a.get("itemtype") or "").split()
            if types:
                head = types[0]
                cut = max(head.rfind("/"), head.rfind("#"))
                if cut > len("https:/"):
                    vocab = head[: cut + 1]
            if props and cur:
                for p in props:
                    self._emit(cur[0], self._expand(p, cur[1]), subj, *IRI)
            for t in types:
                self._emit(subj, RDF_TYPE, t, *IRI)
            self._items.append((subj, vocab))
            frame["item"] = True
            if void:  # itemscope on a void element closes immediately
                self._items.pop()
                return
        elif props and cur:
            preds = [self._expand(p, cur[1]) for p in props]
            val: str | None = None
            iri = False
            machine = False
            dt: str | None = XSD_STRING
            if tag == "meta":
                val = a.get("content") or ""
            elif tag in _URL_VALUED:
                val, iri = a.get(_URL_VALUED[tag]) or "", True
            elif tag == "time" and a.get("datetime"):
                val = a["datetime"]
                dt = _sniff_temporal(val)
                machine = True  # time values are never language-tagged
            elif tag == "data" and a.get("value"):
                val = a["value"]
            if val is not None:
                if iri:
                    term = IRI
                elif dt != XSD_STRING or machine:
                    # typed temporal — or a time value whose lexical
                    # form didn't sniff (durations): machine values are
                    # never language-tagged (microdata-to-RDF §4.3)
                    term = (dt, None)
                elif elang:
                    term = (None, elang)
                else:
                    term = (XSD_STRING, None)
                for p in preds:
                    self._emit(cur[0], p, val, *term)
            elif void:
                for p in preds:  # void element, no value attr: empty
                    self._emit(cur[0], p, "", *((None, elang) if elang else (XSD_STRING, None)))
            else:
                collector = (cur[0], preds, [], elang)
                self._collectors.append(collector)
                frame["collector"] = collector
        if not void:
            self._frames.append(frame)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_data(self, data: str) -> None:
        for _, _, parts, _ in self._collectors:
            parts.append(data)

    def handle_endtag(self, tag: str) -> None:
        # lenient close: pop to the nearest matching open tag
        if not any(f["tag"] == tag for f in self._frames):
            return
        while self._frames:
            frame = self._frames.pop()
            if frame["collector"] is not None:
                subj, preds, parts, clang = frame["collector"]
                self._collectors.remove(frame["collector"])
                text = _WS_RE.sub(" ", "".join(parts)).strip()
                term = (None, clang) if clang else (XSD_STRING, None)
                for p in preds:
                    self._emit(subj, p, text, *term)
            if frame["item"]:
                self._items.pop()
            if frame["tag"] == tag:
                break

    def close(self) -> None:  # finalize dangling frames on truncated html
        super().close()
        while self._frames:
            self.handle_endtag(self._frames[-1]["tag"])


def microdata_triples_of_page(html: str) -> list:
    """(subj, pred, obj, obj_dt, obj_lang) triples of one page's microdata,
    document order, deterministic blank labels."""
    p = _MicrodataParser()
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001 — broken markup yields what parsed
        pass
    return p.triples


# ---------------------------------------------------------------------------
# RDFa Lite
# ---------------------------------------------------------------------------

# RDFa initial-context prefixes actually seen in crawl data (W3C
# initial context + OGP, which publishers habitually leave undeclared)
RDFA_INITIAL_PREFIXES = {
    "og": "http://ogp.me/ns#",
    "fb": "http://ogp.me/ns/fb#",
    "dc": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "schema": "http://schema.org/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
}

_PREFIX_ATTR_RE = re.compile(r"([^\s:]+):\s+(\S+)")


class _RdfaParser(HTMLParser):
    """RDFa Lite 1.1 walk (vocab / prefix / typeof / property /
    resource / about / content + href/src values) — the subset WDC
    extracts and the OGP <meta property="og:…"> convention rides on.

    Simplifications vs full RDFa Core (documented, deliberate):
    * the document subject is the page url (no <base> handling);
    * `about`/`resource` values are taken verbatim (no CURIE/safe-
      CURIE resolution in subject position, no relative-IRI base);
    * bare property terms with NO in-scope `vocab` are dropped, per
      Lite §2.1 (prefixed and absolute terms always work);
    * chaining: `property` + `typeof` on one element links the parent
      subject to the new resource (the Lite §2.4 pattern);
    * no @rel/@rev/@datatype/@inlist (Core-only attributes)."""

    def __init__(self, url: str) -> None:
        super().__init__(convert_charrefs=True)
        self.triples: list = []
        self._bn = 0
        # context: (subject, vocab-or-None, prefixes)
        self._ctx = [(url, None, dict(RDFA_INITIAL_PREFIXES))]
        self._frames: list = []
        self._collectors: list = []

    def _emit(self, s, p, o, dt, lang) -> None:
        self.triples.append((s, p, o, dt, lang))

    def _expand(self, term: str, vocab, prefixes) -> str | None:
        if "://" in term:
            return term
        if ":" in term:
            prefix, local = term.split(":", 1)
            base = prefixes.get(prefix)
            return base + local if base else None
        return vocab + term if vocab else None

    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        void = tag in _VOID
        subj, vocab, prefixes = self._ctx[-1]
        # effective language (RDFa Core §7.5 "current language"):
        # xml:lang wins over lang; lang="" resets; inherited otherwise
        raw_lang = a.get("xml:lang", a.get("lang"))
        if raw_lang is None:
            elang = self._frames[-1]["lang"] if self._frames else None
        else:
            elang = raw_lang or None
        if a.get("vocab"):
            vocab = a["vocab"]
            if not vocab.endswith(("/", "#")):
                vocab += "/"
        if a.get("prefix"):
            prefixes = dict(prefixes)
            for pfx, iri in _PREFIX_ATTR_RE.findall(a["prefix"]):
                prefixes[pfx] = iri
        explicit = a.get("about") or a.get("resource")
        props = [
            p
            for p in (a.get("property") or "").split()
            if self._expand(p, vocab, prefixes)
        ]
        frame = {"tag": tag, "pushed": False, "collector": None, "lang": elang}
        if "typeof" in a:
            new_subj = explicit or a.get("href") or a.get("src")
            if not new_subj:
                new_subj = f"_:r{self._bn}"
                self._bn += 1
            for t in (a.get("typeof") or "").split():
                ti = self._expand(t, vocab, prefixes)
                if ti:
                    self._emit(new_subj, RDF_TYPE, ti, *IRI)
            if props and not a.get("about"):
                for p in props:
                    self._emit(subj, self._expand(p, vocab, prefixes), new_subj, *IRI)
            self._ctx.append((new_subj, vocab, prefixes))
            frame["pushed"] = True
        elif props:
            # `about` sets this property's subject; `resource` is its
            # OBJECT (handled below) and the subject only for nested
            # content (chaining)
            psubj = a.get("about") or subj
            preds = [self._expand(p, vocab, prefixes) for p in props]
            lterm = (None, elang) if elang else (XSD_STRING, None)
            if "content" in a:
                for p in preds:
                    self._emit(psubj, p, a.get("content") or "", *lterm)
            elif a.get("resource"):
                for p in preds:
                    self._emit(psubj, p, a["resource"], *IRI)
            elif tag in _URL_VALUED and a.get(_URL_VALUED[tag]):
                for p in preds:
                    self._emit(psubj, p, a[_URL_VALUED[tag]], *IRI)
            elif a.get("datetime"):
                for p in preds:
                    self._emit(psubj, p, a["datetime"], _sniff_temporal(a["datetime"]), None)
            elif not void:
                collector = (psubj, preds, [], elang)
                self._collectors.append(collector)
                frame["collector"] = collector
            else:
                for p in preds:
                    self._emit(psubj, p, "", *lterm)
            if explicit and not void:
                self._ctx.append((explicit, vocab, prefixes))
                frame["pushed"] = True
        elif (explicit, vocab, prefixes) != (None, self._ctx[-1][1], self._ctx[-1][2]):
            # subject / vocab / prefix scope change with no property
            self._ctx.append((explicit or subj, vocab, prefixes))
            frame["pushed"] = True
        if not void:
            self._frames.append(frame)
        elif frame["pushed"]:
            self._ctx.pop()

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_data(self, data: str) -> None:
        for _, _, parts, _ in self._collectors:
            parts.append(data)

    def handle_endtag(self, tag: str) -> None:
        if not any(f["tag"] == tag for f in self._frames):
            return
        while self._frames:
            frame = self._frames.pop()
            if frame["collector"] is not None:
                psubj, preds, parts, clang = frame["collector"]
                self._collectors.remove(frame["collector"])
                text = _WS_RE.sub(" ", "".join(parts)).strip()
                term = (None, clang) if clang else (XSD_STRING, None)
                for p in preds:
                    self._emit(psubj, p, text, *term)
            if frame["pushed"]:
                self._ctx.pop()
            if frame["tag"] == tag:
                break

    def close(self) -> None:
        super().close()
        while self._frames:
            self.handle_endtag(self._frames[-1]["tag"])


def rdfa_triples_of_page(url: str, html: str) -> list:
    """(subj, pred, obj, obj_dt, obj_lang) triples of one page's RDFa Lite
    markup, document order, deterministic blank labels; the document
    subject (for head-level og:/dc: metas) is the page url."""
    p = _RdfaParser(url)
    try:
        p.feed(html)
        p.close()
    except Exception:  # noqa: BLE001
        pass
    return p.triples


def extract_rdfa(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    parallelism: int | None = None,
) -> DataFrame:
    """(url, subj, pred, obj, obj_dt, obj_lang) triples from RDFa Lite
    markup —
    including the OpenGraph meta-tag convention. Same scale shape as
    the other two extractors: JVM prefilter (`property=` or `typeof=`
    must appear), ONE Arrow hop, map-only."""
    html_str = F.col(html_col).cast("string")
    src = pages.select(F.col(url_col).alias("url"), html_str.alias("_html")).filter(
        F.lower(F.col("_html")).contains("property=")
        | F.lower(F.col("_html")).contains("typeof=")
    )
    spark = pages.sparkSession
    n_parts = parallelism or spark.sparkContext.defaultParallelism * 2
    src = src.repartition(n_parts)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["_html"]):
                for t in rdfa_triples_of_page(url, html):
                    rows.append((url, *t))
            yield pd.DataFrame(rows, columns=_TRIPLE_COLS)

    return src.mapInPandas(_parse, _TRIPLE_SCHEMA)


def extract_microdata(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    parallelism: int | None = None,
) -> DataFrame:
    """(url, subj, pred, obj, obj_dt, obj_lang) triples from HTML
    microdata.
    Same shape as `extract_jsonld`: JVM `itemscope` prefilter, ONE
    Arrow hop, map-only."""
    html_str = F.col(html_col).cast("string")
    src = pages.select(F.col(url_col).alias("url"), html_str.alias("_html")).filter(
        F.lower(F.col("_html")).contains("itemscope")
    )
    spark = pages.sparkSession
    n_parts = parallelism or spark.sparkContext.defaultParallelism * 2
    src = src.repartition(n_parts)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["_html"]):
                for t in microdata_triples_of_page(html):
                    rows.append((url, *t))
            yield pd.DataFrame(rows, columns=_TRIPLE_COLS)

    return src.mapInPandas(_parse, _TRIPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Skolemization (RDF 1.1 Concepts §3.5) — merging extractor output
# ---------------------------------------------------------------------------

SKOLEM_PREFIX = "https://w3id.org/.well-known/genid/"


def skolemize(
    triples: DataFrame,
    scope_col: str = "url",
    prefix: str = SKOLEM_PREFIX,
) -> DataFrame:
    """Replace page-scoped blank-node labels with globally unique
    Skolem IRIs (RDF 1.1 Concepts §3.5 ``/.well-known/genid/``).

    The extractors mint deterministic PER-PAGE labels (``_:b0``,
    ``_:md0``, ``_:r0`` …) — document-scoped per RDF semantics, so two
    pages' ``_:b0`` are DIFFERENT resources. The moment extraction
    output is unioned into one store (the WDC dump shape, the
    reference's changelog — /root/reference/src/graphs.rs:30-61 keys
    everything on graph id), those labels would collide. Skolemizing
    to ``prefix + md5(scope || ' ' || label)`` makes every blank node
    a stable, collision-free IRI while preserving within-page
    co-reference — the classic store-side fix (Skolemization is what
    RDF 1.1 recommends over renaming-on-merge precisely because it
    needs no global coordination: each row computes its IRI locally).

    Scale shape: pure JVM column expressions (md5/concat/when) — map
    only, ZERO shuffles, whole-stage codegen, no Python. A literal
    whose lexical form happens to start with ``_:`` is untouched: the
    term convention (literal ⟺ obj_dt/obj_lang set) gates the object
    rewrite, not the string shape.
    """
    scope = F.col(scope_col).cast("string")

    def _skolem(term: Column) -> Column:
        return F.concat(F.lit(prefix), F.md5(F.concat(scope, F.lit(" "), term)))

    is_blank_obj = (
        F.col("obj").startswith("_:")
        & F.col("obj_dt").isNull()
        & F.col("obj_lang").isNull()
    )
    return triples.withColumn(
        "subj",
        F.when(F.col("subj").startswith("_:"), _skolem(F.col("subj"))).otherwise(
            F.col("subj")
        ),
    ).withColumn(
        "obj",
        F.when(is_blank_obj, _skolem(F.col("obj"))).otherwise(F.col("obj")),
    )
