"""SPARQL-algebra plan builder over a triples DataFrame.

The reference exposes the full SPARQL 1.1 algebra by delegating to
oxigraph (src/query.rs:102-114; surface table in SURVEY.md §2B). Here
the same algebra is compiled to DataFrame plans: a basic graph
pattern (BGP) becomes a chain of hash equi-joins on shared variables,
and the modifiers (OPTIONAL / UNION / MINUS / FILTER / projection)
are the corresponding DataFrame combinators. Catalyst then owns
physical planning — join order, broadcast choice, AQE skew handling —
which is exactly the division of labor the reference has with
oxigraph's optimizer.

Triples input schema: (subj, pred, obj) [extra columns ignored].

Example (customers in ASIA):
    bgp(t, [
        (Var("c"), "inNation", Var("n")),
        (Var("n"), "inRegion", Var("r")),
        (Var("r"), "name", "ASIA"),
    ])  ->  DataFrame[c, n, r]
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_COLS = ("subj", "pred", "obj")
_HIDDEN_PREFIXES = ("_lang_", "_dt_")


@dataclass(frozen=True)
class TypedLit:
    """A literal constant with explicit typing — `"x"@en` or
    `"5"^^<dt>` in a triple pattern. Matches on lexical form AND the
    typing columns (null-safe), unlike a bare string constant which
    keeps the engine's value-level identity (lexical equality only)."""

    lex: str
    dt: str | None = None
    lang: str | None = None


def split_shared(left: DataFrame, right: DataFrame) -> tuple[list[str], list[str]]:
    """Columns both sides bind, split into (visible variables, hidden
    _lang_/_dt_ typing columns). Only visible variables are SPARQL
    solution-domain columns; the hidden ones ride along to give
    LANG()/DATATYPE() and literal-identity semantics."""
    shared = [c for c in right.columns if c in left.columns]
    visible = [c for c in shared if not c.startswith(_HIDDEN_PREFIXES)]
    hidden = [c for c in shared if c.startswith(_HIDDEN_PREFIXES)]
    return visible, hidden


def join_shared(left: DataFrame, right: DataFrame, how: str = "inner") -> DataFrame:
    """Join two solution multisets on their shared visible variables.

    Hidden typing columns must NOT be ordinary equi-join keys: IRI
    objects carry NULL obj_lang/obj_dt, and a NULL equi-key matches
    nothing — a variable reused in object position of two patterns
    over a typed view would silently return zero rows (r02 ADVICE,
    verified live). They are compared null-safely (<=>) instead, so
    "x"@en ≠ "x"@de ≠ "x"^^t but IRI-vs-IRI (NULL<=>NULL) matches."""
    visible, hidden = split_shared(left, right)
    if not hidden:
        if not visible and how == "inner":
            return left.crossJoin(right)
        return left.join(right, visible, how)
    renamed = {c: f"__r_{c}" for c in visible + hidden}
    r = right
    for c, rc in renamed.items():
        r = r.withColumnRenamed(c, rc)
    cond = F.lit(True)
    for c in visible:
        cond = cond & (F.col(c) == F.col(renamed[c]))
    for c in hidden:
        cond = cond & F.col(c).eqNullSafe(F.col(renamed[c]))
    out = left.join(r, cond, how)
    if how in ("left_semi", "left_anti"):
        return out  # right columns never survive these
    return out.drop(*renamed.values())


@dataclass(frozen=True)
class Var:
    name: str


Pattern = tuple  # (s, p, o) of Var | str


def _pattern_df(triples: DataFrame, pattern: Pattern, graph=None) -> DataFrame:
    """One triple pattern → scan with constant filters pushed down and
    variable positions projected to variable-named columns.

    `graph` scopes the pattern to a named graph (SPARQL GRAPH clause)
    over the view's graph_id column: a string filters, a Var binds
    graph_id as that variable (so patterns in one GRAPH group unify on
    it through the natural join)."""
    cond = None
    proj = []
    seen: dict[str, str] = {}
    extra_cond = []
    has_typing = "obj_lang" in triples.columns and "obj_dt" in triples.columns
    if isinstance(graph, Var):
        seen[graph.name] = "graph_id"
        proj.append(F.col("graph_id").alias(graph.name))
    elif graph is not None:
        cond = F.col("graph_id") == F.lit(graph)
    for col, term in zip(_TERM_COLS, pattern):
        if isinstance(term, Var):
            if term.name in seen:  # repeated variable inside one pattern
                extra_cond.append(F.col(col) == F.col(seen[term.name]))
            else:
                seen[term.name] = col
                proj.append(F.col(col).alias(term.name))
                if col == "obj" and has_typing:
                    # carry the literal's typing so LANG()/DATATYPE()
                    # can see it and joins distinguish "x"@en from
                    # "x"@de / <x> (hidden columns, stripped from
                    # SELECT * output)
                    proj.append(F.col("obj_lang").alias(f"_lang_{term.name}"))
                    proj.append(F.col("obj_dt").alias(f"_dt_{term.name}"))
        elif isinstance(term, TypedLit):
            c = F.col(col) == F.lit(term.lex)
            if col == "obj" and has_typing:
                c = c & F.col("obj_lang").eqNullSafe(F.lit(term.lang).cast("string"))
                c = c & F.col("obj_dt").eqNullSafe(F.lit(term.dt).cast("string"))
            cond = c if cond is None else (cond & c)
        else:
            c = F.col(col) == F.lit(term)
            cond = c if cond is None else (cond & c)
    df = triples
    if cond is not None:
        df = df.filter(cond)
    for c in extra_cond:
        df = df.filter(c)
    return df.select(*proj) if proj else df.select(F.lit(1).alias("_match")).limit(1)


def bgp(triples: DataFrame, patterns: list[Pattern], graph=None) -> DataFrame:
    """Basic graph pattern: natural join of the pattern scans on their
    shared variables (n-1 equi-joins; Catalyst reorders / broadcasts).
    `graph` applies GRAPH-clause scoping to every pattern."""
    out = None
    for p in patterns:
        pdf = _pattern_df(triples, p, graph=graph)
        out = pdf if out is None else join_shared(out, pdf)
    return out


def optional(left: DataFrame, right: DataFrame) -> DataFrame:
    """OPTIONAL ≙ left outer join on the shared variables."""
    return join_shared(left, right, "left_outer")


def union(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION ≙ unionByName with missing columns null-padded."""
    return a.unionByName(b, allowMissingColumns=True)


def minus(a: DataFrame, b: DataFrame) -> DataFrame:
    """MINUS ≙ left anti join on shared variables.

    SPARQL MINUS removes μ1 only when some μ2 is compatible AND their
    domains OVERLAP — with no shared variables nothing is ever removed
    (an empty-key anti join would instead wipe the left side whenever
    the right is non-empty). Overlap is judged on VISIBLE variables —
    hidden typing columns are not solution-domain members."""
    visible, _ = split_shared(a, b)
    if not visible:
        return a
    return join_shared(a, b, "left_anti")


def exists(a: DataFrame, b: DataFrame) -> DataFrame:
    """FILTER EXISTS ≙ left semi join on shared variables."""
    return join_shared(a, b, "left_semi")


def path_plus(triples: DataFrame, pred: str, src: str = "src", dst: str = "dst") -> DataFrame:
    """Property path p+ via iterative doubling closure."""
    from rdf_diff_store_spark.operators.graph import transitive_closure

    edges = triples.filter(F.col("pred") == pred).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return transitive_closure(edges).select(
        F.col("src").alias(src), F.col("dst").alias(dst)
    )
