"""SPARQL 1.1 UPDATE over the versioned store.

The reference writes through its REST surface (POST/DELETE
/api/graphs, /root/reference/src/bin/rdf-diff-writer.rs:45-91) and reads through
SPARQL; this module closes the standard write-protocol gap: UPDATE
operations compile onto the SAME versioned-changelog operators the
REST path uses (operators/versioned.py append_updates/tombstones), so
every UPDATE lands as new graph versions with the store's idempotence
and diff semantics intact.

Supported operations (sequences separated by `;`):

* ``INSERT DATA { quads }`` / ``DELETE DATA { quads }``
* ``DELETE WHERE { pattern }``
* ``[WITH <g>] DELETE { tmpl } INSERT { tmpl } [USING [NAMED] <g>]*
  WHERE { group }`` (either template may be absent; USING/USING NAMED
  define the WHERE dataset — compiled to FROM / FROM NAMED — and
  override WITH for pattern matching per §3.1.3)
* ``CLEAR GRAPH <g> | CLEAR ALL`` / ``DROP GRAPH <g> | DROP ALL``
* ``COPY | MOVE | ADD [GRAPH] <g1> TO [GRAPH] <g2>`` (§3.2.3-5:
  COPY replaces g2 with g1's triples, MOVE additionally drops g1,
  ADD unions into g2; all no-ops when g1 = g2)
* ``LOAD [SILENT] <file:///path> [INTO GRAPH <g>]`` — distributed
  binaryFile read + the Arrow turtle parser; http(s) sources raise
  loudly (no network in this engine), SILENT swallows read failures
  per spec

Dataset semantics: this store is a dataset of NAMED graphs only (one
graph per resource, reference src/graphs.rs:17-24). Therefore:

* Quads outside a ``GRAPH`` block in DATA / templates target the
  graph bound by ``WITH <g>`` when present; otherwise, in WHERE-driven
  forms, they target the graph each solution was matched in (the
  pattern is implicitly scoped per graph — the natural reading when
  the dataset is a disjoint union of per-resource graphs); in
  INSERT/DELETE DATA they target ``default_graph``.
* A WHERE group that uses explicit ``GRAPH`` clauses disables the
  implicit per-graph scoping, and templates must then name their
  graphs explicitly (loud error otherwise).

Spark-first execution: the working state is the snapshot-triples
frame; each operation is a union / null-safe anti-join (set algebra,
JVM-only), WHERE groups are compiled by the existing algebra
(plans/sparql_text.py — joins, paths, filters all reusable), and only
TOUCHED graphs are re-serialized and appended as new versions.
Sequential ops are separated by eager localCheckpoints — the same
transaction barrier the reference's write lock provides
(src/graphs.rs:46-50) — so op N+1 reads op N's committed state, and
at scale a multi-op update costs O(ops) materializations of the
touched subset, not the store.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_diff_store_spark.plans.algebra import Var
from rdf_diff_store_spark.plans.sparql_text import (
    SparqlParseError,
    _Tokens,
    sparql_query,
)

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# implicit per-solution graph variable for WHERE-scoped forms; not
# underscore-prefixed (SELECT * would strip it) but collision-checked
SCOPE_VAR = "g_upd_scope"

_TERM_FIELDS = ("subj", "pred", "obj", "obj_dt", "obj_lang")


@dataclass
class _Term:
    """A ground term or variable in a quad template."""

    kind: str  # "iri" | "lit" | "var"
    value: str
    dt: str | None = None
    lang: str | None = None


@dataclass
class _Op:
    kind: str  # insert_data | delete_data | delete_where | modify | clear
    # quads: (graph: str | Var | None, s, p, o) with _Term terms
    inserts: list = field(default_factory=list)
    deletes: list = field(default_factory=list)
    where_tokens: list = field(default_factory=list)  # token values incl. braces
    with_graph: str | None = None
    using: list = field(default_factory=list)  # USING <iri> (WHERE default graph)
    using_named: list = field(default_factory=list)  # USING NAMED <iri>
    clear_target: str | None = None  # IRI or "ALL"
    has_explicit_graph_in_where: bool = False
    load_source: str | None = None  # LOAD document IRI
    load_target: str | None = None  # INTO GRAPH target
    silent: bool = False


_UPDATE_HEADS = {
    "INSERT", "DELETE", "WITH", "CLEAR", "DROP", "LOAD", "COPY", "MOVE", "ADD",
}


def is_update(text: str) -> bool:
    """True when the string is a SPARQL UPDATE (vs a query): decided
    by the first keyword after the prologue, per the grammar."""
    ts = _Tokens(text)
    while ts.peek()[1] in ("PREFIX", "BASE"):
        ts.next()
        ts.next()
        if ts.peek()[0] == "iri":  # PREFIX pname <iri>
            ts.next()
    return ts.peek()[1] in _UPDATE_HEADS


def execute(changelog: DataFrame, text: str, ts=None, at=None):
    """One entry point for the store's whole request surface (the
    analog of the reference's paired query/write endpoints,
    /root/reference/src/bin/rdf-diff-writer.rs:45-91): SPARQL QUERY strings run
    against the snapshot at `at` (default: latest) and return a result
    DataFrame; UPDATE strings apply at `ts` and return the NEW
    changelog."""
    from rdf_diff_store_spark.operators.versioned import (
        metadata,
        snapshot_triples,
    )
    from rdf_diff_store_spark.plans.sparql_text import sparql_query

    if is_update(text):
        if ts is None:
            raise ValueError("execute: an UPDATE needs its version timestamp `ts`")
        return apply_update(changelog, text, ts)
    if at is None:
        at = F.lit(metadata(changelog).first()["end_time"])
    return sparql_query(snapshot_triples(changelog, at), text)


def _parse_update(text: str) -> tuple[list[_Op], dict[str, str]]:
    ts = _Tokens(text)
    prefixes: dict[str, str] = {}

    def resolve(val: str) -> str:
        pfx, _, local = val.partition(":")
        if pfx not in prefixes:
            raise SparqlParseError(f"unknown prefix {pfx!r}")
        return prefixes[pfx] + local

    def iri_token() -> str:
        k, v = ts.next()
        if k == "iri":
            return v[1:-1]
        if k == "pname":
            return resolve(v)
        raise SparqlParseError(f"expected an IRI, got {v!r}")

    def term(allow_var: bool) -> _Term:
        k, v = ts.next()
        if k == "var":
            if not allow_var:
                raise SparqlParseError(f"variable {v!r} not allowed in ground data")
            return _Term("var", v[1:])
        if k == "iri":
            return _Term("iri", v[1:-1])
        if k == "pname":
            return _Term("iri", resolve(v))
        if k == "kw" and v == "a":
            return _Term("iri", RDF_TYPE)
        if k == "number":
            dt = XSD_DECIMAL if "." in v else XSD_INTEGER
            return _Term("lit", v, dt=dt)
        if k == "kw" and v in ("TRUE", "FALSE"):
            return _Term("lit", v.lower(), dt="http://www.w3.org/2001/XMLSchema#boolean")
        if k == "string":
            lex = v[1:-1].replace('\\"', '"')
            nk, nv = ts.peek()
            if nk == "langtag":
                ts.next()
                return _Term("lit", lex, lang=nv[1:])
            if nk == "op" and nv == "^":
                k2, v2 = ts.peek(1)
                if k2 == "op" and v2 == "^":
                    ts.next()
                    ts.next()
                    return _Term("lit", lex, dt=iri_token())
                raise SparqlParseError("datatype needs ^^<iri>")
            return _Term("lit", lex, dt=XSD_STRING)
        raise SparqlParseError(f"bad term {v!r} in update quads")

    def parse_quads(allow_var: bool) -> list:
        """`{ (GRAPH g { triples })* triples* }` with `;`/`,` lists."""
        ts.expect("{")
        out: list = []

        def triples_into(graph) -> None:
            while ts.peek()[1] not in ("}", None, "GRAPH"):
                s = term(allow_var)
                while True:
                    p = term(allow_var)
                    while True:
                        o = term(allow_var)
                        out.append((graph, s, p, o))
                        if ts.peek()[1] == ",":
                            ts.next()
                            continue
                        break
                    if ts.peek()[1] == ";":
                        ts.next()
                        if ts.peek()[1] in (".", "}", "GRAPH"):
                            break
                        continue
                    break
                if ts.peek()[1] == ".":
                    ts.next()

        while ts.peek()[1] != "}":
            if ts.peek()[1] == "GRAPH":
                ts.next()
                k, v = ts.peek()
                if k == "var":
                    if not allow_var:
                        raise SparqlParseError("GRAPH ?var not allowed in ground data")
                    ts.next()
                    g: object = Var(v[1:])
                else:
                    g = iri_token()
                ts.expect("{")
                triples_into(g)
                if ts.peek()[1] == "GRAPH":
                    raise SparqlParseError("GRAPH blocks cannot nest in quad data")
                ts.expect("}")
            else:
                triples_into(None)
        ts.expect("}")
        return out

    def capture_group() -> tuple[list, bool]:
        """Collect the raw tokens of one balanced `{ ... }` group (for
        re-serialization into a SELECT) and whether it uses GRAPH."""
        toks: list = []
        has_graph = False
        k, v = ts.next()
        if v != "{":
            raise SparqlParseError("expected '{'")
        depth = 1
        toks.append(v)
        while depth:
            k, v = ts.next()
            if v == "{":
                depth += 1
            elif v == "}":
                depth -= 1
            elif v == "GRAPH":
                has_graph = True
            toks.append(v)
        return toks, has_graph

    while ts.peek()[1] == "PREFIX":
        ts.next()
        k, pname = ts.next()
        if k != "pname":
            raise SparqlParseError(f"bad PREFIX name {pname!r}")
        k, iri = ts.next()
        if k != "iri":
            raise SparqlParseError("PREFIX needs an <iri>")
        prefixes[pname.rstrip(":")] = iri[1:-1]

    ops: list[_Op] = []
    while ts.peek()[1] is not None:
        kind, val = ts.next()
        if val in ("CLEAR", "DROP"):
            op = _Op("clear")
            k, v = ts.next()
            if v == "GRAPH":
                op.clear_target = iri_token()
            elif v in ("ALL", "DEFAULT", "NAMED"):
                # SPARQL 1.1 Update §3.2.2/3.2.3: DEFAULT clears only
                # the default graph, NAMED every graph EXCEPT it, ALL
                # everything — sentinels resolved against default_graph
                # at execution time (r03 advisor: mapping DEFAULT→ALL
                # was silent whole-store data loss).
                op.clear_target = v
            else:
                raise SparqlParseError(
                    f"{val} needs GRAPH <iri>, DEFAULT, NAMED or ALL"
                )
            ops.append(op)
        elif val in ("COPY", "MOVE", "ADD"):
            op = _Op("graph_mgmt")
            op.clear_target = val  # reuse: which management verb
            if ts.peek()[1] == "SILENT":
                ts.next()
                op.silent = True
            if ts.peek()[1] == "GRAPH":
                ts.next()
            op.load_source = iri_token()  # reuse: source graph
            ts.expect("TO")
            if ts.peek()[1] == "GRAPH":
                ts.next()
            op.load_target = iri_token()  # reuse: destination graph
            ops.append(op)
        elif val == "LOAD":
            op = _Op("load")
            if ts.peek()[1] == "SILENT":
                ts.next()
                op.silent = True
            op.load_source = iri_token()
            if ts.peek()[1] == "INTO":
                ts.next()
                ts.expect("GRAPH")
                op.load_target = iri_token()
            ops.append(op)
        elif val == "INSERT" and ts.peek()[1] == "DATA":
            ts.next()
            ops.append(_Op("insert_data", inserts=parse_quads(allow_var=False)))
        elif val == "DELETE" and ts.peek()[1] == "DATA":
            ts.next()
            ops.append(_Op("delete_data", deletes=parse_quads(allow_var=False)))
        elif val == "DELETE" and ts.peek()[1] == "WHERE":
            ts.next()
            # the pattern IS the template; re-serialize it for the WHERE
            mark = ts.i
            quads = parse_quads(allow_var=True)
            toks = [v for _, v in ts.toks[mark : ts.i]]
            op = _Op("delete_where", deletes=quads, where_tokens=toks)
            op.has_explicit_graph_in_where = any(t == "GRAPH" for t in toks)
            ops.append(op)
        elif val in ("WITH", "DELETE", "INSERT"):
            op = _Op("modify")
            if val == "WITH":
                op.with_graph = iri_token()
                kind, val = ts.next()
            if val == "DELETE":
                op.deletes = parse_quads(allow_var=True)
                if ts.peek()[1] == "INSERT":
                    ts.next()
                    op.inserts = parse_quads(allow_var=True)
            elif val == "INSERT":
                op.inserts = parse_quads(allow_var=True)
            else:
                raise SparqlParseError(f"expected DELETE or INSERT, got {val!r}")
            # UsingClause* (§3.1.4): USING <g> merges into the WHERE's
            # default graph, USING NAMED <g> scopes its GRAPH clauses.
            while ts.peek()[1] == "USING":
                ts.next()
                if ts.peek()[1] == "NAMED":
                    ts.next()
                    op.using_named.append(iri_token())
                else:
                    op.using.append(iri_token())
            ts.expect("WHERE")
            op.where_tokens, op.has_explicit_graph_in_where = capture_group()
            ops.append(op)
        else:
            raise SparqlParseError(f"unsupported update operation {val!r}")
        if ts.peek()[1] == ";":
            ts.next()
    return ops, prefixes


def _null_safe_anti(state: DataFrame, dels: DataFrame) -> DataFrame:
    """state MINUS dels on the full quad identity (graph, term,
    typing) — typing columns compare null-safely so IRI objects
    (NULL/NULL) and "x"@en vs "x"^^t all have distinct identities."""
    d = dels
    for c in d.columns:
        d = d.withColumnRenamed(c, f"__d_{c}")
    cond = None
    for c in ("graph_id", "subj", "pred", "obj"):
        e = F.col(c) == F.col(f"__d_{c}")
        cond = e if cond is None else cond & e
    for c in ("obj_dt", "obj_lang"):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__d_{c}"))
    return state.join(d, cond, "left_anti")


def _instantiate(
    quads: list, bindings: DataFrame | None, with_graph: str | None, scope_bound: bool
) -> DataFrame | None:
    """Template quads × solution bindings → quad rows. Ground terms
    become literals; variables project binding columns (object-position
    typing restored from the hidden _lang_/_dt_ columns when the WHERE
    carried them). Solutions leaving any position unbound are dropped,
    per SPARQL 1.1 Update §3.1.3."""
    if bindings is None:
        return None
    parts = []
    for g, s, p, o in quads:
        cols = []
        if isinstance(g, Var):
            if g.name not in bindings.columns:
                raise SparqlParseError(f"template GRAPH ?{g.name} is not bound")
            cols.append(F.col(g.name).cast("string").alias("graph_id"))
        elif g is not None:
            cols.append(F.lit(g).alias("graph_id"))
        elif with_graph is not None:
            cols.append(F.lit(with_graph).alias("graph_id"))
        elif scope_bound:
            cols.append(F.col(SCOPE_VAR).cast("string").alias("graph_id"))
        else:
            raise SparqlParseError(
                "template quad has no graph: use GRAPH { }, WITH <g>, or an "
                "implicitly scoped WHERE (no explicit GRAPH clauses)"
            )
        for t, name in ((s, "subj"), (p, "pred")):
            if t.kind == "var":
                if t.value not in bindings.columns:
                    raise SparqlParseError(f"template var ?{t.value} is not bound")
                cols.append(F.col(t.value).cast("string").alias(name))
            else:
                cols.append(F.lit(t.value).alias(name))
        if o.kind == "var":
            if o.value not in bindings.columns:
                raise SparqlParseError(f"template var ?{o.value} is not bound")
            cols.append(F.col(o.value).cast("string").alias("obj"))
            lang_c, dt_c = f"_lang_{o.value}", f"_dt_{o.value}"
            cols.append(
                (F.col(dt_c) if dt_c in bindings.columns else F.lit(None))
                .cast("string")
                .alias("obj_dt")
            )
            cols.append(
                (F.col(lang_c) if lang_c in bindings.columns else F.lit(None))
                .cast("string")
                .alias("obj_lang")
            )
        else:
            cols.append(F.lit(o.value).alias("obj"))
            cols.append(F.lit(o.dt if o.kind == "lit" else None).cast("string").alias("obj_dt"))
            cols.append(F.lit(o.lang).cast("string").alias("obj_lang"))
        parts.append(bindings.select(*cols))
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    # drop solutions that left a position unbound (OPTIONAL vars)
    for c in ("graph_id", "subj", "pred", "obj"):
        out = out.filter(F.col(c).isNotNull())
    return out.distinct()


def _ground_rows(spark, quads: list, default_graph: str) -> DataFrame:
    rows = []
    for g, s, p, o in quads:
        gid = g if isinstance(g, str) else default_graph
        rows.append(
            (
                gid,
                s.value,
                p.value,
                o.value,
                o.dt if o.kind == "lit" else None,
                o.lang,
            )
        )
    return spark.createDataFrame(
        rows, "graph_id string, subj string, pred string, obj string, obj_dt string, obj_lang string"
    )


def _load_document(spark, source: str, graph_id: str) -> DataFrame:
    """LOAD: distributed binaryFile read of a Turtle/N-Triples
    document → triples in the target graph. file:// IRIs (or bare
    paths) only — this engine has no network surface; http(s) raises
    so the caller's SILENT decides."""
    from rdf_diff_store_spark.functions.turtle import parse_triples

    if source.startswith(("http://", "https://")):
        raise SparqlParseError(
            f"LOAD {source!r}: remote IRIs are not supported (file:// only)"
        )
    path = source[len("file://") :] if source.startswith("file://") else source
    doc = spark.read.format("binaryFile").load(path)
    rows = doc.select(
        F.lit(graph_id).alias("graph_id"),
        F.lit("1970-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.col("content").cast("string").alias("payload"),
    )
    return parse_triples(rows).select(*(("graph_id",) + _TERM_FIELDS))


def _where_bindings(
    state: DataFrame, op: _Op, prefixes: dict[str, str]
) -> tuple[DataFrame, bool]:
    """Compile the op's WHERE group with the existing query engine.
    Without explicit GRAPH clauses (and no WITH/USING), the group is
    wrapped in GRAPH ?g_upd_scope so each solution carries the graph
    it matched in. USING / USING NAMED compile to the query engine's
    FROM / FROM NAMED dataset clause — and per §3.1.3 they override
    WITH for WHERE evaluation."""
    body = " ".join(op.where_tokens)
    dataset = ""
    if op.using or op.using_named:
        scope = False
        dataset = " ".join(
            [f"FROM <{g}>" for g in op.using]
            + [f"FROM NAMED <{g}>" for g in op.using_named]
        ) + " "
    else:
        scope = not op.has_explicit_graph_in_where and op.with_graph is None
        if scope:
            body = "{ GRAPH ?%s %s }" % (SCOPE_VAR, body)
        elif op.with_graph is not None:
            body = "{ GRAPH <%s> %s }" % (op.with_graph, body)
    prologue = " ".join(f"PREFIX {p}: <{iri}>" for p, iri in prefixes.items())
    text = f"{prologue} SELECT * {dataset}WHERE {body}"
    bindings = sparql_query(state, text, keep_typing=True)
    if scope and SCOPE_VAR not in bindings.columns:
        raise SparqlParseError(
            f"?{SCOPE_VAR} is reserved for update graph scoping"
        )
    return bindings, scope


def apply_update(
    changelog: DataFrame,
    update_text: str,
    ts,
    default_graph: str = "urn:x-default",
) -> DataFrame:
    """Apply a SPARQL UPDATE string to the store as of its latest
    state; every touched graph gains a new version (or tombstone) at
    `ts`. Returns the new changelog (normalized, idempotent — applying
    the same no-effect update twice appends nothing)."""
    from rdf_diff_store_spark.functions.turtle import parse_triples, serialize_graph
    from rdf_diff_store_spark.operators.versioned import (
        append_updates,
        current_state,
    )

    spark = changelog.sparkSession
    ops, prefixes = _parse_update(update_text)

    # ONE store-sized materialization: the immutable base triples.
    # Ops never rewrite it — they accumulate (added, removed) DELTA
    # frames (checkpointed per op, sized by the op's effect, not the
    # store), and the working view is base − removed ∪ added. The view
    # may carry duplicate rows (re-insert of an existing triple);
    # WHERE-driven templates go through _instantiate's distinct, and
    # the final per-graph serialization dedups, so set semantics hold
    # without a per-op store-wide distinct.
    live = current_state(changelog).filter(F.col("op") != "delete")
    base = (
        parse_triples(live).select(*(("graph_id",) + _TERM_FIELDS)).localCheckpoint()
    )
    schema6 = (
        "graph_id string, subj string, pred string, obj string, "
        "obj_dt string, obj_lang string"
    )
    added = spark.createDataFrame([], schema6).localCheckpoint()
    removed = spark.createDataFrame([], schema6).localCheckpoint()
    touched_ids: list[DataFrame] = []

    def view() -> DataFrame:
        return _null_safe_anti(base, removed).unionByName(added)

    def do_delete(dels: DataFrame) -> None:
        # eager checkpoint: dels (often a WHERE-driven plan) feeds the
        # added-anti, the removed-union AND the touched set — one
        # evaluation, used three times
        nonlocal added, removed
        dels = dels.localCheckpoint()
        touched_ids.append(dels.select("graph_id"))
        added = _null_safe_anti(added, dels).localCheckpoint()
        removed = removed.unionByName(
            dels.select(*added.columns)
        ).localCheckpoint()

    def do_insert(ins: DataFrame) -> None:
        nonlocal added
        ins = ins.localCheckpoint()
        touched_ids.append(ins.select("graph_id"))
        added = added.unionByName(ins.select(*added.columns)).localCheckpoint()

    for op in ops:
        if op.kind == "clear":
            if op.clear_target == "ALL":
                do_delete(view())
            elif op.clear_target == "DEFAULT":
                do_delete(
                    view().filter(F.col("graph_id") == F.lit(default_graph))
                )
            elif op.clear_target == "NAMED":
                do_delete(
                    view().filter(F.col("graph_id") != F.lit(default_graph))
                )
            else:
                do_delete(
                    view().filter(F.col("graph_id") == F.lit(op.clear_target))
                )
        elif op.kind == "graph_mgmt":
            src, dst, verb = op.load_source, op.load_target, op.clear_target
            if src == dst:
                continue  # §3.2.3-5: same-graph management is a no-op
            src_rows = (
                view()
                .filter(F.col("graph_id") == F.lit(src))
                .distinct()
                .localCheckpoint()
            )
            if verb in ("COPY", "MOVE"):
                do_delete(view().filter(F.col("graph_id") == F.lit(dst)))
            do_insert(src_rows.withColumn("graph_id", F.lit(dst)))
            if verb == "MOVE":
                do_delete(src_rows)
        elif op.kind == "load":
            try:
                trip = _load_document(
                    spark, op.load_source, op.load_target or default_graph
                ).distinct()
                do_insert(trip)
            except Exception:
                if not op.silent:
                    raise
        elif op.kind == "insert_data":
            do_insert(_ground_rows(spark, op.inserts, default_graph))
        elif op.kind == "delete_data":
            do_delete(_ground_rows(spark, op.deletes, default_graph))
        else:  # delete_where / modify
            bindings, scope = _where_bindings(view(), op, prefixes)
            # one evaluation of the WHERE, shared by both templates
            bindings = bindings.localCheckpoint()
            # with USING (no WITH) unGRAPHed template quads target the
            # store's default graph, per §3.1.3's Graph Store reading
            tmpl_graph = op.with_graph
            if tmpl_graph is None and (op.using or op.using_named):
                tmpl_graph = default_graph
            if op.deletes:
                dels = _instantiate(op.deletes, bindings, tmpl_graph, scope)
            if op.inserts:
                # instantiate BOTH templates against the same bindings
                # before mutating state (SPARQL applies delete+insert
                # atomically against the pre-op store)
                ins = _instantiate(op.inserts, bindings, tmpl_graph, scope)
            if op.deletes:
                do_delete(dels)
            if op.inserts:
                do_insert(ins)

    # re-serialize ONLY touched graphs: old/new docs restricted by a
    # semi-join on the touched id set, so an update's version-append
    # cost is O(touched graphs), never O(store)
    if touched_ids:
        touched = touched_ids[0]
        for t_ in touched_ids[1:]:
            touched = touched.unionByName(t_)
        touched = touched.distinct().localCheckpoint()
    else:
        touched = spark.createDataFrame([], "graph_id string")
    old_docs = serialize_graph(
        base.join(touched, "graph_id", "left_semi")
    ).withColumnRenamed("doc", "old_doc")
    new_docs = serialize_graph(
        view().join(touched, "graph_id", "left_semi").distinct()
    ).withColumnRenamed("doc", "new_doc")
    delta = old_docs.join(new_docs, "graph_id", "full_outer")
    t = F.lit(ts).cast("timestamp")
    updates = (
        delta.filter(
            ~F.col("old_doc").eqNullSafe(F.col("new_doc"))
        )
        .select(
            "graph_id",
            t.alias("ts"),
            F.when(F.col("new_doc").isNull(), F.lit("delete"))
            .otherwise(F.lit("add"))
            .alias("op"),
            F.when(
                F.col("new_doc").isNotNull(), F.concat(F.col("new_doc"), F.lit("\n"))
            ).alias("payload"),
        )
    )
    return append_updates(changelog, updates)
