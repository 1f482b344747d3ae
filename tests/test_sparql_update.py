"""SPARQL 1.1 UPDATE over the versioned store
(plans/sparql_update.py): operation forms, graph scoping, versioning
semantics (new version per touched graph, tombstone on emptied
graph), and idempotence through append_updates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.versioned import snapshot_at, snapshot_triples
from rdf_diff_store_spark.plans.sparql_text import SparqlParseError
from rdf_diff_store_spark.plans.sparql_update import apply_update

T0 = "2024-01-01 00:00:00"
T1 = "2024-06-01 00:00:00"
T2 = "2024-07-01 00:00:00"


def _log(spark, rows):
    df = spark.createDataFrame(
        rows, "graph_id string, ts string, op string, payload string"
    ).select(
        "graph_id", F.col("ts").cast("timestamp").alias("ts"), "op", "payload"
    )
    return df.withColumn(
        "content_hash",
        F.when(F.col("op") == "delete", F.lit(None).cast("string")).otherwise(
            F.sha2("payload", 256)
        ),
    )


@pytest.fixture(scope="module")
def base_log(spark):
    return _log(
        spark,
        [
            ("g:1", T0, "add", '<http://e/s1> <http://e/value> "10" .\n'),
            ("g:2", T0, "add", '<http://e/s2> <http://e/value> "0" .\n'),
            (
                "g:3",
                T0,
                "add",
                '<http://e/s3> <http://e/value> "7" .\n'
                '<http://e/s3> <http://e/name> "three"@en .\n',
            ),
        ],
    ).localCheckpoint()


def _triples(log, t=T2):
    return {
        (r.graph_id, r.subj, r.pred, r.obj, r.obj_dt, r.obj_lang)
        for r in snapshot_triples(log, t).collect()
    }


class TestUpdateForms:
    def test_insert_data_creates_named_graph(self, spark, base_log):
        out = apply_update(
            base_log,
            'INSERT DATA { GRAPH <g:new> { <http://e/x> <http://e/p> "v" } }',
            T1,
        )
        trip = _triples(out)
        assert ("g:new", "http://e/x", "http://e/p", "v",
                "http://www.w3.org/2001/XMLSchema#string", None) in trip
        # untouched graphs keep their ORIGINAL version timestamp
        snap = {r.graph_id: r.ts for r in snapshot_at(out, T2).collect()}
        assert str(snap["g:1"]).startswith("2024-01-01")

    def test_delete_data_removes_one_triple(self, spark, base_log):
        out = apply_update(
            base_log,
            'DELETE DATA { GRAPH <g:3> { <http://e/s3> <http://e/value> "7" } }',
            T1,
        )
        trip = _triples(out)
        assert not any(t[0] == "g:3" and t[2] == "http://e/value" for t in trip)
        # the lang-tagged sibling survives with its typing intact
        assert ("g:3", "http://e/s3", "http://e/name", "three", None, "en") in trip

    def test_delete_where_tombstones_emptied_graph(self, spark, base_log):
        out = apply_update(
            base_log, 'DELETE WHERE { ?s <http://e/value> "0" }', T1
        )
        live = {r.graph_id for r in snapshot_at(out, T2).collect()}
        assert "g:2" not in live and {"g:1", "g:3"} <= live
        # before the update the graph was alive (time travel intact)
        assert "g:2" in {r.graph_id for r in snapshot_at(out, T0).collect()}

    def test_modify_rename_predicate_per_graph_scope(self, spark, base_log):
        out = apply_update(
            base_log,
            "PREFIX ex: <http://e/> "
            "DELETE { ?s ex:value ?v } INSERT { ?s ex:cents ?v } "
            "WHERE { ?s ex:value ?v }",
            T1,
        )
        trip = _triples(out)
        assert ("g:1", "http://e/s1", "http://e/cents", "10",
                "http://www.w3.org/2001/XMLSchema#string", None) in trip
        assert not any(t[2] == "http://e/value" for t in trip)

    def test_with_graph_scopes_where_and_template(self, spark, base_log):
        out = apply_update(
            base_log,
            "WITH <g:1> DELETE { ?s <http://e/value> ?v } "
            "INSERT { ?s <http://e/only1> ?v } WHERE { ?s <http://e/value> ?v }",
            T1,
        )
        trip = _triples(out)
        assert ("g:1", "http://e/s1", "http://e/only1", "10",
                "http://www.w3.org/2001/XMLSchema#string", None) in trip
        # other graphs untouched
        assert ("g:2", "http://e/s2", "http://e/value", "0",
                "http://www.w3.org/2001/XMLSchema#string", None) in trip

    def test_clear_graph_and_clear_all(self, spark, base_log):
        out = apply_update(base_log, "CLEAR GRAPH <g:1>", T1)
        assert "g:1" not in {r.graph_id for r in snapshot_at(out, T2).collect()}
        out_all = apply_update(base_log, "CLEAR ALL", T1)
        assert snapshot_at(out_all, T2).count() == 0
        assert snapshot_at(out_all, T0).count() == 3  # history preserved

    def test_sequential_ops_see_prior_state(self, spark, base_log):
        out = apply_update(
            base_log,
            'INSERT DATA { GRAPH <g:t> { <http://e/a> <http://e/p> "x" } } ; '
            "DELETE WHERE { ?s <http://e/p> ?o }",
            T1,
        )
        assert "g:t" not in {r.graph_id for r in snapshot_at(out, T2).collect()}

    def test_typed_literal_and_langtag_in_data(self, spark, base_log):
        out = apply_update(
            base_log,
            "INSERT DATA { GRAPH <g:typed> { "
            '<http://e/a> <http://e/n> "5"^^<http://www.w3.org/2001/XMLSchema#integer> . '
            '<http://e/a> <http://e/l> "hei"@nb } }',
            T1,
        )
        trip = _triples(out)
        assert ("g:typed", "http://e/a", "http://e/n", "5",
                "http://www.w3.org/2001/XMLSchema#integer", None) in trip
        assert ("g:typed", "http://e/a", "http://e/l", "hei", None, "nb") in trip


class TestUpdateModelEquivalence:
    """Randomized ground-update sequences vs a Python set model: the
    distributed set algebra must agree with the obvious in-memory
    semantics for any interleaving of INSERT DATA / DELETE DATA /
    CLEAR."""

    def test_random_sequences_match_set_model(self, spark):
        import random

        rng = random.Random(20240817)
        graphs = ["g:a", "g:b"]
        subjects = ["http://e/s1", "http://e/s2"]
        values = ["u", "v", "w"]
        for trial in range(4):
            model: dict[str, set] = {}
            ops = []
            for _ in range(6):
                kind = rng.choice(["ins", "ins", "del", "clear"])
                g = rng.choice(graphs)
                s = rng.choice(subjects)
                v = rng.choice(values)
                if kind == "ins":
                    ops.append(
                        'INSERT DATA { GRAPH <%s> { <%s> <http://e/p> "%s" } }'
                        % (g, s, v)
                    )
                    model.setdefault(g, set()).add((s, v))
                elif kind == "del":
                    ops.append(
                        'DELETE DATA { GRAPH <%s> { <%s> <http://e/p> "%s" } }'
                        % (g, s, v)
                    )
                    model.get(g, set()).discard((s, v))
                else:
                    ops.append("CLEAR GRAPH <%s>" % g)
                    model.pop(g, None)
            seed = _log(
                spark, [("g:seed", T0, "add", '<http://e/x> <http://e/q> "q" .\n')]
            )
            out = apply_update(seed, " ;\n".join(ops), T1)
            got: dict[str, set] = {}
            for r in snapshot_triples(out, T2).collect():
                got.setdefault(r.graph_id, set())
                if r.pred == "http://e/p":
                    got[r.graph_id].add((r.subj, r.obj))
            # expected: non-empty model graphs survive; emptied/cleared
            # graphs are absent; the untouched seed graph persists
            want = {g: s for g, s in model.items() if s}
            want["g:seed"] = set()
            assert got == want, f"trial {trial}: {ops}"


class TestModifyModelEquivalence:
    """Randomized WHERE-driven rename/promote sequences vs a Python
    model — exercises _where_bindings + _instantiate composition."""

    def test_random_modify_sequences_match_model(self, spark):
        import random

        rng = random.Random(7)
        preds = ["http://e/p", "http://e/q", "http://e/r"]
        # model: graph -> set of (subj, pred, obj)
        model = {
            "g:a": {("http://e/s1", "http://e/p", "1"),
                    ("http://e/s2", "http://e/q", "2")},
            "g:b": {("http://e/s1", "http://e/p", "3")},
        }
        rows = []
        for g, triples in model.items():
            payload = "".join(f'<{s}> <{p}> "{o}" .\n' for s, p, o in sorted(triples))
            rows.append((g, T0, "add", payload))
        log = _log(spark, rows).localCheckpoint()
        ops = []
        for _ in range(4):
            src, dst = rng.sample(preds, 2)
            if rng.random() < 0.5:
                # global per-graph rename
                ops.append(
                    "DELETE { ?s <%s> ?v } INSERT { ?s <%s> ?v } "
                    "WHERE { ?s <%s> ?v }" % (src, dst, src)
                )
                model = {
                    g: {(s, dst if p == src else p, o) for s, p, o in ts_}
                    for g, ts_ in model.items()
                }
            else:
                g = rng.choice(list(model))
                ops.append(
                    "WITH <%s> DELETE { ?s <%s> ?v } INSERT { ?s <%s> ?v } "
                    "WHERE { ?s <%s> ?v }" % (g, src, dst, src)
                )
                model[g] = {
                    (s, dst if p == src else p, o) for s, p, o in model[g]
                }
        out = apply_update(log, " ;\n".join(ops), T1)
        got: dict[str, set] = {}
        for r in snapshot_triples(out, T2).collect():
            got.setdefault(r.graph_id, set()).add((r.subj, r.pred, r.obj))
        assert got == model, ops


class TestUpdateSemantics:
    def test_noop_update_appends_nothing(self, spark, base_log):
        before = base_log.count()
        out = apply_update(
            base_log, 'DELETE WHERE { ?s <http://e/nosuch> ?o }', T1
        )
        assert out.count() == before

    def test_reapplying_same_update_is_idempotent(self, spark, base_log):
        upd = (
            "PREFIX ex: <http://e/> DELETE { ?s ex:value ?v } "
            "INSERT { ?s ex:cents ?v } WHERE { ?s ex:value ?v }"
        )
        once = apply_update(base_log, upd, T1).localCheckpoint()
        twice = apply_update(once, upd, T2)
        # second application matches nothing (value already renamed)
        assert twice.count() == once.count()

    def test_insert_existing_triple_is_noop_version(self, spark, base_log):
        out = apply_update(
            base_log,
            'INSERT DATA { GRAPH <g:1> { <http://e/s1> <http://e/value> "10" } }',
            T1,
        )
        assert out.count() == base_log.count()

    def test_update_serializes_only_touched_graphs(self, spark, base_log, monkeypatch):
        """The version-append path is O(touched): re-serialization
        sees ONLY graphs the update targeted, never the whole store."""
        import rdf_diff_store_spark.functions.turtle as turtle_mod
        from rdf_diff_store_spark.functions.turtle import serialize_graph as real

        seen: list[set] = []

        def spy(df):
            seen.append(
                {r.graph_id for r in df.select("graph_id").distinct().collect()}
            )
            return real(df)

        monkeypatch.setattr(turtle_mod, "serialize_graph", spy)
        out = apply_update(
            base_log,
            'INSERT DATA { GRAPH <g:1> { <http://e/s1> <http://e/extra> "e" } }',
            T1,
        )
        out.count()
        assert seen, "serialize_graph was never called"
        for graphs in seen:
            assert graphs <= {"g:1"}, f"untouched graphs serialized: {graphs}"

    def test_explicit_graph_where_requires_graph_templates(self, spark, base_log):
        with pytest.raises(SparqlParseError, match="no graph"):
            apply_update(
                base_log,
                "DELETE { ?s <http://e/value> ?v } "
                "WHERE { GRAPH <g:1> { ?s <http://e/value> ?v } }",
                T1,
            ).count()

    def test_copy_move_add_graph_management(self, spark, base_log):
        # COPY replaces the destination with the source's triples
        out = apply_update(base_log, "COPY GRAPH <g:1> TO GRAPH <g:2>", T1)
        trip = _triples(out)
        assert ("g:2", "http://e/s1", "http://e/value", "10",
                "http://www.w3.org/2001/XMLSchema#string", None) in trip
        assert not any(t[0] == "g:2" and t[3] == "0" for t in trip)
        # ADD unions into the destination (existing triples survive)
        out2 = apply_update(base_log, "ADD <g:1> TO <g:3>", T1)
        t2 = _triples(out2)
        assert ("g:3", "http://e/s1", "http://e/value", "10",
                "http://www.w3.org/2001/XMLSchema#string", None) in t2
        assert ("g:3", "http://e/s3", "http://e/name", "three", None, "en") in t2
        # MOVE copies then drops the source
        out3 = apply_update(base_log, "MOVE GRAPH <g:1> TO GRAPH <g:2>", T1)
        live3 = {r.graph_id for r in snapshot_at(out3, T2).collect()}
        assert "g:1" not in live3 and "g:2" in live3
        # same-graph management is a no-op (no new versions)
        out4 = apply_update(base_log, "MOVE GRAPH <g:1> TO GRAPH <g:1>", T1)
        assert out4.count() == base_log.count()

    def test_load_file_into_graph(self, spark, base_log, tmp_path):
        p = tmp_path / "doc.ttl"
        p.write_text('<http://e/L> <http://e/p> "loaded" .\n')
        out = apply_update(
            base_log, f"LOAD <file://{p}> INTO GRAPH <g:loaded>", T1
        )
        trip = _triples(out)
        assert ("g:loaded", "http://e/L", "http://e/p", "loaded",
                "http://www.w3.org/2001/XMLSchema#string", None) in trip

    def test_load_silent_swallows_missing_file(self, spark, base_log):
        out = apply_update(
            base_log, "LOAD SILENT <file:///nonexistent/x.ttl> INTO GRAPH <g:x>", T1
        )
        assert out.count() == base_log.count()  # no-op
        with pytest.raises(Exception):
            apply_update(
                base_log, "LOAD <file:///nonexistent/x.ttl> INTO GRAPH <g:x>", T1
            ).count()

    def test_load_remote_iri_is_loud(self, spark, base_log):
        with pytest.raises(SparqlParseError, match="remote"):
            apply_update(
                base_log, "LOAD <http://example.org/x.ttl> INTO GRAPH <g:x>", T1
            ).count()

    def test_explicit_graph_var_template(self, spark, base_log):
        out = apply_update(
            base_log,
            "DELETE { GRAPH ?g { ?s <http://e/value> ?v } } "
            "WHERE { GRAPH ?g { ?s <http://e/value> ?v } }",
            T1,
        )
        trip = _triples(out)
        assert not any(t[2] == "http://e/value" for t in trip)
        # g:3 keeps its name triple, g:1/g:2 are emptied → tombstoned
        assert {r.graph_id for r in snapshot_at(out, T2).collect()} == {"g:3"}


class TestExecuteDispatch:
    def test_query_string_returns_results(self, spark, base_log):
        from rdf_diff_store_spark.plans.sparql_update import execute

        df = execute(base_log, "SELECT ?s ?v WHERE { ?s <http://e/value> ?v }")
        assert df.count() == 3

    def test_update_string_returns_new_changelog(self, spark, base_log):
        from rdf_diff_store_spark.plans.sparql_update import execute, is_update

        upd = 'DELETE WHERE { ?s <http://e/value> "0" }'
        assert is_update(upd) and not is_update("ASK { ?s ?p ?o }")
        out = execute(base_log, upd, ts=T1)
        assert "g:2" not in {r.graph_id for r in snapshot_at(out, T2).collect()}

    def test_update_without_ts_is_loud(self, spark, base_log):
        from rdf_diff_store_spark.plans.sparql_update import execute

        with pytest.raises(ValueError, match="timestamp"):
            execute(base_log, "CLEAR ALL")


class TestUsingClauses:
    """USING / USING NAMED (§3.1.4) define the WHERE dataset and
    override WITH for pattern matching (§3.1.3)."""

    def test_using_restricts_where_to_listed_graph(self, spark, base_log):
        out = apply_update(
            base_log,
            "INSERT { GRAPH <g:dst> { ?s <http://e/flag> \"y\" } } "
            "USING <g:1> WHERE { ?s <http://e/value> ?v }",
            T1,
        )
        flagged = {t[1] for t in _triples(out) if t[0] == "g:dst"}
        assert flagged == {"http://e/s1"}

    def test_using_named_scopes_graph_clauses(self, spark, base_log):
        out = apply_update(
            base_log,
            "INSERT { GRAPH <g:dst> { ?s <http://e/src> ?g } } "
            "USING NAMED <g:2> WHERE { GRAPH ?g { ?s <http://e/value> ?v } }",
            T1,
        )
        rows = {(t[1], t[3]) for t in _triples(out) if t[0] == "g:dst"}
        assert rows == {("http://e/s2", "g:2")}

    def test_using_template_defaults_to_default_graph(self, spark, base_log):
        out = apply_update(
            base_log,
            "INSERT { ?s <http://e/flag> \"y\" } "
            "USING <g:1> WHERE { ?s <http://e/value> ?v }",
            T1,
        )
        in_default = {t[1] for t in _triples(out) if t[0] == "urn:x-default"}
        assert in_default == {"http://e/s1"}

    def test_using_overrides_with_for_where_only(self, spark, base_log):
        # WHERE matches in g:2 (USING), template writes to g:dst (WITH)
        out = apply_update(
            base_log,
            "WITH <g:dst> INSERT { ?s <http://e/flag> \"y\" } "
            "USING <g:2> WHERE { ?s <http://e/value> ?v }",
            T1,
        )
        flagged = {t[1] for t in _triples(out) if t[0] == "g:dst"}
        assert flagged == {"http://e/s2"}

    def test_using_delete_targets_default_graph(self, spark, base_log):
        # seed the default graph, then DELETE via a USING-scoped WHERE
        seeded = apply_update(
            base_log,
            'INSERT DATA { <http://e/s1> <http://e/flag> "y" }',
            T1,
        )
        out = apply_update(
            seeded,
            "DELETE { ?s <http://e/flag> \"y\" } "
            "USING <g:1> WHERE { ?s <http://e/value> ?v }",
            T2,
        )
        assert not any(t[0] == "urn:x-default" for t in _triples(out, "2024-08-01 00:00:00"))
