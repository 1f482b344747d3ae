"""Integer full-batch TransE (operators/embed.py): deterministic
md5 init, division-free margin-gradient rounds, sign-safe renorm."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.embed import (
    EMB_SCALE,
    md5_embedding,
    transe_scores,
    transe_train,
)

TRIPLES = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("c", "knows", "a"),
    ("a", "likes", "c"),
    ("b", "likes", "c"),
    ("d", "knows", "a"),
]


def _tri(spark, rows=None):
    return spark.createDataFrame(rows or TRIPLES, "h string, r string, t string")


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id string")


class TestInit:
    def test_md5_embedding_matches_reference_hash(self, spark):
        rows = {
            (r["id"], r["d"]): r["v"]
            for r in md5_embedding(_ids(spark, ["a", "b"]), dim=3, prefix="ent").collect()
        }
        for i in ("a", "b"):
            for d in range(3):
                h = int(hashlib.md5(f"ent:{i}:{d}".encode()).hexdigest()[:13], 16)
                assert rows[(i, d)] == h % (2 * EMB_SCALE + 1) - EMB_SCALE
        assert all(abs(v) <= EMB_SCALE for v in rows.values())

    def test_duplicate_ids_collapse(self, spark):
        df = md5_embedding(_ids(spark, ["a", "a", "b"]), dim=2, prefix="x")
        assert df.count() == 4  # 2 ids × 2 dims


class TestTrain:
    def test_deterministic_and_repartition_invariant(self, spark):
        e1, r1 = transe_train(_tri(spark), dim=4, iterations=2)
        e2, r2 = transe_train(_tri(spark).repartition(13), dim=4, iterations=2)
        assert sorted(map(tuple, e1.collect())) == sorted(map(tuple, e2.collect()))
        assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))

    def test_training_moves_parameters_and_bounds_hold(self, spark):
        ents = _ids(spark, sorted({h for h, _, _ in TRIPLES} | {t for _, _, t in TRIPLES}))
        init = sorted(map(tuple, md5_embedding(ents, 4, "ent").collect()))
        ent, _ = transe_train(_tri(spark), dim=4, iterations=1)
        trained = sorted(map(tuple, ent.collect()))
        assert trained != init
        assert max(abs(v) for _, _, v in trained) <= 2_000_000  # renorm bound

    def test_matches_pure_python_reference(self, spark):
        """Bit-exact equality with an independent pure-Python
        reimplementation of the documented update rule, 1 AND 2
        rounds — the in-process twin of the SQL oracle."""
        dim, margin, step, n_cand = 3, 1_000_000, 1, 4

        def ref_train(triples, iterations):
            tri = sorted(set(triples))
            ents = sorted({h for h, _, _ in tri} | {t for _, _, t in tri})
            cand = ents[:n_cand]

            def h52(key):
                return int(hashlib.md5(key.encode()).hexdigest()[:13], 16)

            def init(prefix, ids):
                return {
                    (i, d): h52(f"{prefix}:{i}:{d}") % (2 * EMB_SCALE + 1) - EMB_SCALE
                    for i in ids
                    for d in range(dim)
                }

            ent = init("ent", ents)
            rel = init("rel", sorted({r for _, r, _ in tri}))
            neg = {
                (h, r, t): cand[h52(f"neg|{h}|{r}|{t}") % len(cand)]
                for h, r, t in tri
            }
            for _ in range(iterations):
                ge, gr = {}, {}
                for h, r, t in tri:
                    tn = neg[(h, r, t)]
                    g = [ent[(h, d)] + rel[(r, d)] - ent[(t, d)] for d in range(dim)]
                    g2 = [ent[(h, d)] + rel[(r, d)] - ent[(tn, d)] for d in range(dim)]
                    if sum(x * x for x in g) - sum(x * x for x in g2) + margin > 0:
                        for d in range(dim):
                            ge[(h, d)] = ge.get((h, d), 0) + g[d] - g2[d]
                            ge[(t, d)] = ge.get((t, d), 0) - g[d]
                            ge[(tn, d)] = ge.get((tn, d), 0) + g2[d]
                            gr[(r, d)] = gr.get((r, d), 0) + g[d] - g2[d]

                def apply(emb, grads):
                    upd = {
                        k: v - 2 * step * grads.get(k, 0) for k, v in emb.items()
                    }
                    s = max(1, max(abs(v) for v in upd.values()) // 1_000_000)
                    return {
                        k: (-((-v) // s) if v < 0 else v // s)
                        for k, v in upd.items()
                    }

                ent, rel = apply(ent, ge), apply(rel, gr)
            return ent, rel

        for iters in (1, 2):
            ent, rel = transe_train(
                _tri(spark), dim=dim, iterations=iters,
                margin=margin, step=step, n_neg_candidates=n_cand,
            )
            re_, rr = ref_train(TRIPLES, iters)
            got_e = {(r["id"], r["d"]): r["v"] for r in ent.collect()}
            got_r = {(r["id"], r["d"]): r["v"] for r in rel.collect()}
            assert got_e == re_, iters
            assert got_r == rr, iters

    def test_scores_are_exact_sum_of_squares(self, spark):
        tri = _tri(spark, [("a", "p", "b")])
        ent = spark.createDataFrame(
            [("a", 0, 3), ("a", 1, 0), ("b", 0, 1), ("b", 1, 5)],
            "id string, d int, v long",
        )
        rel = spark.createDataFrame(
            [("p", 0, 2), ("p", 1, 1)], "id string, d int, v long"
        )
        r = transe_scores(tri, ent, rel).collect()[0]
        assert r["score"] == (3 + 2 - 1) ** 2 + (0 + 1 - 5) ** 2


class TestLinkPrediction:
    def test_true_tail_ranks_first_on_separable_geometry(self, spark):
        from rdf_diff_store_spark.operators.embed import link_prediction

        # hand-built embeddings where b = a + p exactly: (a, p, ?) must
        # rank b first with score 0
        ent = spark.createDataFrame(
            [("a", 0, 10), ("a", 1, 0), ("b", 0, 12), ("b", 1, 5),
             ("c", 0, 0), ("c", 1, 0)],
            "id string, d int, v long",
        )
        rel = spark.createDataFrame(
            [("p", 0, 2), ("p", 1, 5)], "id string, d int, v long"
        )
        pairs = spark.createDataFrame([("a", "p")], "h string, r string")
        cands = spark.createDataFrame([("a",), ("b",), ("c",)], "id string")
        out = link_prediction(pairs, cands, ent, rel, k=2).collect()
        assert [(r["t"], r["rank"], r["score"]) for r in out] == [
            ("b", 1, 0),
            ("a", 2, 29),  # (10+2-10)^2 + (0+5-0)^2
        ]

    def test_window_is_partitioned_and_deterministic(self, spark):
        from rdf_diff_store_spark.operators.embed import link_prediction

        tri = _tri(spark)
        ent, rel = transe_train(tri, dim=4, iterations=1)
        pairs = tri.select("h", "r")
        cands = tri.select(F.col("t").alias("id"))
        a = sorted(map(tuple, link_prediction(pairs, cands, ent, rel).collect()))
        b = sorted(
            map(
                tuple,
                link_prediction(
                    pairs.repartition(7), cands, ent, rel
                ).collect(),
            )
        )
        assert a == b
        plan = (
            link_prediction(pairs, cands, ent, rel)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for line in plan.splitlines():
            if "Window [" in line:
                assert line.count("], [") == 2
