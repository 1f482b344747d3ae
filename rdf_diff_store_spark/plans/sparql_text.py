"""SPARQL SELECT text front-end — parse a pragmatic SPARQL 1.1 subset
and compile it onto the algebra layer (plans/algebra.py).

The reference's query interface IS a SPARQL string
(GET /api/sparql/{ts}?query=..., src/bin/rdf-query-cache.rs:44-53,
evaluated by oxigraph at src/query.rs:105). This module gives users of
the reference the same entry point: a query string in, a DataFrame of
bindings out, over any triples view (snapshot_triples(t) included).

Supported subset (deliberately scoped; SURVEY.md §2B maps the rest of
the algebra to DataFrame ops that callers can compose directly):

    PREFIX pfx: <iri>
    SELECT [DISTINCT] (?v ... | *)
    WHERE { triple patterns with ';' ',' ; OPTIONAL { ... } ;
            FILTER (expr) with comparisons, && ||, !,
            REGEX(?v, "re"), STRSTARTS/STRENDS/CONTAINS(?v, "s") }
    ORDER BY [ASC|DESC](?v) ...   LIMIT n   OFFSET n

Literals in object position match the triples view's `obj` string
column; numeric comparisons cast the bound column to double.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_diff_store_spark.plans.algebra import Var, bgp, optional

_TOKEN = re.compile(
    r"""
    (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<iri><[^>]*>)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<number>-?[0-9]+(?:\.[0-9]+)?)
  | (?P<kw>\b(?:PREFIX|SELECT|DISTINCT|WHERE|OPTIONAL|FILTER|UNION|ORDER|BY|ASC|DESC|LIMIT|OFFSET|REGEX|STRSTARTS|STRENDS|CONTAINS|STR)\b)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_\-]*:[A-Za-z0-9_\-.]*)
  | (?P<op><=|>=|!=|=|<|>|&&|\|\||!)
  | (?P<punct>[{}().;,*])
    """,
    re.VERBOSE | re.IGNORECASE,
)


@dataclass
class _Parsed:
    distinct: bool = False
    projection: list[str] | None = None  # None = *
    patterns: list[tuple] = field(default_factory=list)
    optionals: list[tuple[list[tuple], list]] = field(default_factory=list)  # (patterns, filters)
    filters: list = field(default_factory=list)  # expression ASTs
    union_groups: list[tuple[list[tuple], list]] = field(default_factory=list)  # alternative groups
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (var, asc)
    limit: int | None = None
    offset: int | None = None


class SparqlParseError(ValueError):
    pass


class _Tokens:
    def __init__(self, text: str):
        self.toks = []
        pos = 0
        for m in _TOKEN.finditer(text):
            between = text[pos : m.start()]
            if between.strip():
                raise SparqlParseError(f"unexpected text {between.strip()[:40]!r}")
            kind = m.lastgroup
            val = m.group(0)
            if kind == "kw":
                val = val.upper()
            self.toks.append((kind, val))
            pos = m.end()
        if text[pos:].strip():
            raise SparqlParseError(f"unexpected trailing text {text[pos:].strip()[:40]!r}")
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        if t[0] is None:
            raise SparqlParseError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, val: str):
        kind, v = self.next()
        if v.upper() != val.upper():
            raise SparqlParseError(f"expected {val!r}, got {v!r}")


def _parse(query: str) -> tuple[_Parsed, dict[str, str]]:
    ts = _Tokens(query)
    prefixes: dict[str, str] = {}
    out = _Parsed()

    while ts.peek()[1] == "PREFIX":
        ts.next()
        kind, pname = ts.next()
        if kind != "pname" or not pname.endswith(":"):
            # pname token includes the local part; a bare "pfx:" parses as pname
            if kind != "pname":
                raise SparqlParseError(f"bad PREFIX name {pname!r}")
        kind, iri = ts.next()
        if kind != "iri":
            raise SparqlParseError("PREFIX needs an <iri>")
        prefixes[pname.rstrip(":")] = iri[1:-1]

    ts.expect("SELECT")
    if ts.peek()[1] == "DISTINCT":
        ts.next()
        out.distinct = True
    if ts.peek()[1] == "*":
        ts.next()
        out.projection = None
    else:
        out.projection = []
        while ts.peek()[0] == "var":
            out.projection.append(ts.next()[1][1:])
        if not out.projection:
            raise SparqlParseError("SELECT needs variables or *")

    ts.expect("WHERE")
    ts.expect("{")

    def term(kind, val):
        if kind == "var":
            return Var(val[1:])
        if kind == "iri":
            return val[1:-1]
        if kind == "pname":
            pfx, _, local = val.partition(":")
            if pfx not in prefixes:
                raise SparqlParseError(f"unknown prefix {pfx!r}")
            return prefixes[pfx] + local
        if kind == "string":
            return val[1:-1].replace('\\"', '"')
        if kind == "number":
            return val
        raise SparqlParseError(f"bad term {val!r}")

    def parse_triples_into(patterns: list):
        while True:
            kind, val = ts.peek()
            if val in ("}", None) or val in ("OPTIONAL", "FILTER"):
                return
            s = term(*ts.next())
            while True:
                p = term(*ts.next())
                while True:
                    o = term(*ts.next())
                    patterns.append((s, p, o))
                    if ts.peek()[1] == ",":
                        ts.next()
                        continue
                    break
                if ts.peek()[1] == ";":
                    ts.next()
                    if ts.peek()[1] in (".", "}"):  # dangling ';'
                        break
                    continue
                break
            if ts.peek()[1] == ".":
                ts.next()

    def parse_expr():
        """Pratt-lite: or_expr := and_expr (|| and_expr)*"""

        def primary():
            kind, val = ts.next()
            if val == "(":
                e = or_expr()
                ts.expect(")")
                return e
            if val == "!":
                return ("not", primary())
            if val in ("REGEX", "STRSTARTS", "STRENDS", "CONTAINS"):
                fn = val
                ts.expect("(")
                kind2, v2 = ts.next()
                if v2 == "STR":  # STR(?x) wrapper
                    ts.expect("(")
                    kind2, v2 = ts.next()
                    ts.expect(")")
                if kind2 != "var":
                    raise SparqlParseError(f"{fn} needs a variable")
                ts.expect(",")
                kind3, v3 = ts.next()
                if kind3 != "string":
                    raise SparqlParseError(f"{fn} needs a string literal")
                ts.expect(")")
                return (fn.lower(), v2[1:], v3[1:-1])
            if kind == "var":
                # comparison: ?v op value
                opk, opv = ts.next()
                if opk != "op":
                    raise SparqlParseError(f"expected comparison after ?{val[1:]}")
                vk, vv = ts.next()
                return ("cmp", val[1:], opv, (vk, term(vk, vv)))
            raise SparqlParseError(f"bad filter expression near {val!r}")

        def and_expr():
            e = primary()
            while ts.peek()[1] == "&&":
                ts.next()
                e = ("and", e, primary())
            return e

        def or_expr():
            e = and_expr()
            while ts.peek()[1] == "||":
                ts.next()
                e = ("or", e, and_expr())
            return e

        return or_expr()

    def parse_group() -> tuple[list[tuple], list]:
        """patterns + filters up to the closing '}' (no nesting)."""
        patterns: list = []
        filters: list = []
        parse_triples_into(patterns)
        while True:
            kind, val = ts.peek()
            if val == "FILTER":
                ts.next()
                ts.expect("(")
                filters.append(parse_expr())
                ts.expect(")")
                if ts.peek()[1] == ".":
                    ts.next()
                parse_triples_into(patterns)
            else:
                return patterns, filters

    # top-level UNION form: WHERE { { groupA } UNION { groupB } ... }
    if ts.peek()[1] == "{":
        while ts.peek()[1] == "{":
            ts.next()
            out.union_groups.append(parse_group())
            ts.expect("}")
            if ts.peek()[1] == "UNION":
                ts.next()
                continue
            break
        if len(out.union_groups) < 2:
            raise SparqlParseError("braced group without UNION")
        ts.expect("}")
    else:
        parse_triples_into(out.patterns)
        while True:
            kind, val = ts.peek()
            if val == "OPTIONAL":
                ts.next()
                ts.expect("{")
                out.optionals.append(parse_group())
                ts.expect("}")
                if ts.peek()[1] == ".":
                    ts.next()
                parse_triples_into(out.patterns)
            elif val == "FILTER":
                ts.next()
                ts.expect("(")
                out.filters.append(parse_expr())
                ts.expect(")")
                if ts.peek()[1] == ".":
                    ts.next()
                parse_triples_into(out.patterns)
            else:
                break
        ts.expect("}")

    while ts.peek()[1] is not None:
        kind, val = ts.next()
        if val == "ORDER":
            ts.expect("BY")
            while True:
                k2, v2 = ts.peek()
                if v2 in ("ASC", "DESC"):
                    ts.next()
                    asc = v2 == "ASC"
                    ts.expect("(")
                    var = ts.next()[1][1:]
                    ts.expect(")")
                    out.order_by.append((var, asc))
                elif k2 == "var":
                    ts.next()
                    out.order_by.append((v2[1:], True))
                else:
                    break
        elif val == "LIMIT":
            out.limit = int(ts.next()[1])
        elif val == "OFFSET":
            out.offset = int(ts.next()[1])
        else:
            raise SparqlParseError(f"unexpected {val!r} after pattern group")
    return out, prefixes


def _compile_filter(expr) -> Column:
    op = expr[0]
    if op == "and":
        return _compile_filter(expr[1]) & _compile_filter(expr[2])
    if op == "or":
        return _compile_filter(expr[1]) | _compile_filter(expr[2])
    if op == "not":
        return ~_compile_filter(expr[1])
    if op == "cmp":
        _, var, cmp_op, (vkind, value) = expr
        col = F.col(var)
        if vkind == "number":
            col = col.cast("double")
            rhs = F.lit(float(value))
        else:
            rhs = F.lit(value)
        return {
            "=": col == rhs,
            "!=": col != rhs,
            "<": col < rhs,
            "<=": col <= rhs,
            ">": col > rhs,
            ">=": col >= rhs,
        }[cmp_op]
    if op == "regex":
        return F.col(expr[1]).rlike(expr[2])
    if op == "strstarts":
        return F.col(expr[1]).startswith(expr[2])
    if op == "strends":
        return F.col(expr[1]).endswith(expr[2])
    if op == "contains":
        return F.col(expr[1]).contains(expr[2])
    raise SparqlParseError(f"unsupported filter op {op!r}")


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Evaluate a SPARQL SELECT string against a (subj, pred, obj)
    triples DataFrame. Returns one column per projected variable."""
    parsed, _ = _parse(query)

    def compile_group(patterns, filters) -> DataFrame:
        if not patterns:
            raise SparqlParseError("empty pattern group")
        g = bgp(triples, patterns)
        for f_ast in filters:
            g = g.filter(_compile_filter(f_ast))
        return g

    if parsed.union_groups:
        from rdf_diff_store_spark.plans.algebra import union as _union

        df = None
        for patterns, filters in parsed.union_groups:
            g = compile_group(patterns, filters)
            df = g if df is None else _union(df, g)
    else:
        if not parsed.patterns:
            raise SparqlParseError("empty WHERE group")
        df = bgp(triples, parsed.patterns)
        for opt_patterns, opt_filters in parsed.optionals:
            df = optional(df, compile_group(opt_patterns, opt_filters))
        for f_ast in parsed.filters:
            df = df.filter(_compile_filter(f_ast))
    if parsed.projection is not None:
        missing = [v for v in parsed.projection if v not in df.columns]
        if missing:
            raise SparqlParseError(f"projected variables not bound: {missing}")
        df = df.select(*parsed.projection)
    if parsed.distinct:
        df = df.distinct()
    sort_cols = [F.col(v).asc() if asc else F.col(v).desc() for v, asc in parsed.order_by]
    if parsed.offset:
        # OFFSET needs a total order to be meaningful — row_number over
        # the explicit ORDER BY (SPARQL solution sequences are ordered
        # before slicing)
        if not sort_cols:
            raise SparqlParseError("OFFSET requires ORDER BY")
        from pyspark.sql import Window

        w = Window.orderBy(*sort_cols)
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > parsed.offset)
            .drop("_rn")
        )
    if sort_cols:
        df = df.orderBy(*sort_cols)
    if parsed.limit is not None:
        df = df.limit(parsed.limit)
    return df
