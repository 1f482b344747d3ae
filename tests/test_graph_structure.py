"""Session-19 graph-structure operators: strongly connected components
(operators/graph.py::scc), neighborhood-overlap link prediction
(wedge_overlap), and the deterministic DeepWalk corpus (random_walks)
— model-pinned on hand graphs with closed-form answers.

Reference context: the reference has no graph analytics (SURVEY §2 —
oxigraph answers property paths only); these extend the
transitive_closure family for the crawl-curation / embedding-prep
side of the north star."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.graph import random_walks, scc, wedge_overlap


def _scc_map(spark, pairs):
    df = spark.createDataFrame(pairs, "src string, dst string")
    return {r.id: r.scc_id for r in scc(df).collect()}


class TestScc:
    def test_two_cycles_and_fringe(self, spark):
        out = _scc_map(
            spark,
            [
                ("a", "b"), ("b", "c"), ("c", "a"),  # 3-cycle
                ("x", "y"), ("y", "x"),              # 2-cycle
                ("d", "a"),                          # fringe into cycle
                ("c", "x"),                          # cycle -> cycle bridge
            ],
        )
        assert out["a"] == out["b"] == out["c"] == "a"
        assert out["x"] == out["y"] == "x"
        # bridge does NOT merge the cycles (reachability is one-way)
        assert out["a"] != out["x"]
        assert out["d"] == "d"

    def test_self_loop_is_singleton_component(self, spark):
        out = _scc_map(spark, [("s", "s"), ("s", "t")])
        assert out == {"s": "s", "t": "t"}

    def test_acyclic_chain_all_singletons(self, spark):
        out = _scc_map(spark, [("1", "2"), ("2", "3"), ("3", "4")])
        assert out == {k: k for k in "1234"}

    def test_full_cycle_min_id_representative(self, spark):
        ids = [f"n{i}" for i in range(6)]
        pairs = [(ids[i], ids[(i + 1) % 6]) for i in range(6)]
        out = _scc_map(spark, pairs)
        assert set(out.values()) == {"n0"}


class TestWedgeOverlap:
    def _run(self, spark, pairs, cap=1000):
        df = spark.createDataFrame(pairs, "center string, leaf string")
        return {
            (r.leaf_a, r.leaf_b): (r.cn, r.ra_micro, r.jaccard_micro)
            for r in wedge_overlap(df, max_center_degree=cap).collect()
        }

    def test_hand_scores(self, spark):
        # c1 -> {p,q,r} (deg 3), c2 -> {p,q} (deg 2)
        out = self._run(
            spark,
            [("c1", "p"), ("c1", "q"), ("c1", "r"), ("c2", "p"), ("c2", "q")],
        )
        # (p,q): cn=2 (c1,c2); ra = 1e6//3 + 1e6//2; deg p = deg q = 2
        assert out[("p", "q")] == (2, 333333 + 500000, 2 * 1_000_000 // (2 + 2 - 2))
        # (p,r): cn=1 via c1 only; deg r = 1
        assert out[("p", "r")] == (1, 333333, 1_000_000 // (2 + 1 - 1))
        assert ("q", "p") not in out  # canonical a < b ordering

    def test_center_degree_cap_suppresses_hub(self, spark):
        # hub center of degree 3 > cap: mints nothing; c2 still pairs p,q
        out = self._run(
            spark,
            [("hub", "p"), ("hub", "q"), ("hub", "r"), ("c2", "p"), ("c2", "q")],
            cap=2,
        )
        assert set(out) == {("p", "q")}
        # leaf degrees still count the capped center (Jaccard uses true degrees)
        assert out[("p", "q")] == (1, 500000, 1 * 1_000_000 // (2 + 2 - 1))

    def test_duplicate_edges_collapse(self, spark):
        out = self._run(spark, [("c", "p"), ("c", "p"), ("c", "q")])
        assert out[("p", "q")] == (1, 500000, 1_000_000)


def _md5_pick(salt, walk_id, t, outdeg):
    h = hashlib.md5(f"{salt}{walk_id}:{t}".encode()).hexdigest()
    return int(h[:15], 16) % outdeg


class TestRandomWalks:
    EDGES = [
        ("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("c", "a"),
        ("c", "sink"),
    ]

    def _walks(self, spark, length=5, n_walks=1, seeds=("a",)):
        e = spark.createDataFrame(self.EDGES, "src string, dst string")
        s = spark.createDataFrame([(x,) for x in seeds], "seed string")
        rows = random_walks(e, s, length=length, n_walks=n_walks).collect()
        walks: dict[str, dict[int, str]] = {}
        for r in rows:
            walks.setdefault(r.walk_id, {})[r.step] = r.node
        return walks

    def test_replays_md5_model_exactly(self, spark):
        # adjacency ranked by dst: a->[b,c], b->[a,c], c->[a,sink]
        adj = {"a": ["b", "c"], "b": ["a", "c"], "c": ["a", "sink"]}
        walks = self._walks(spark, length=6)
        w = walks["a"]
        assert w[0] == "a"
        node, t = "a", 1
        while node in adj and t <= 6:
            node = adj[node][_md5_pick("walk", "a", t, len(adj[node]))]
            assert w[t] == node
            t += 1
        # walk either ran the full length or stopped exactly at the sink
        assert len(w) == t

    def test_sink_truncates(self, spark):
        e = spark.createDataFrame([("s", "t")], "src string, dst string")
        s = spark.createDataFrame([("s",)], "seed string")
        rows = sorted(
            (r.step, r.node) for r in random_walks(e, s, length=9).collect()
        )
        assert rows == [(0, "s"), (1, "t")]

    def test_n_walks_distinct_ids_and_deterministic(self, spark):
        w1 = self._walks(spark, length=4, n_walks=3)
        assert set(w1) == {"a#0", "a#1", "a#2"}
        w2 = self._walks(spark, length=4, n_walks=3)
        assert w1 == w2

    def test_every_hop_is_an_edge(self, spark):
        eset = set(self.EDGES)
        walks = self._walks(spark, length=8, n_walks=2, seeds=("a", "b", "c"))
        for w in walks.values():
            for t in range(1, max(w) + 1 if w else 0):
                if t in w:
                    assert (w[t - 1], w[t]) in eset


def _int_pagerank(edges, iterations=4, damping=85):
    """Pure-python mirror of operators.graph.pagerank's integer model."""
    from collections import defaultdict

    e = sorted(set(edges))
    outdeg = defaultdict(int)
    for s, _ in e:
        outdeg[s] += 1
    nodes = sorted({x for p in e for x in p})
    base = (1_000_000 * (100 - damping)) // 100
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        nxt = {n: base for n in nodes}
        for s, d in e:
            nxt[d] += (r[s] * damping) // (100 * outdeg[s])
        r = nxt
    return r


class TestWalkCooccurrence:
    def test_window_band_counts(self, spark):
        from rdf_diff_store_spark.operators.graph import walk_cooccurrence

        walks = spark.createDataFrame(
            [("w", 0, "a"), ("w", 1, "b"), ("w", 2, "a"), ("w", 3, "c")],
            "walk_id string, step int, node string",
        )
        out = {
            (r.node_a, r.node_b): r.n_cooc
            for r in walk_cooccurrence(walks, window=2).collect()
        }
        # pairs within distance <= 2: (0,1)(0,2)(1,2)(1,3)(2,3)
        assert out == {("a", "b"): 2, ("a", "a"): 1, ("a", "c"): 1, ("b", "c"): 1}

    def test_walks_do_not_cross(self, spark):
        from rdf_diff_store_spark.operators.graph import walk_cooccurrence

        walks = spark.createDataFrame(
            [("w1", 0, "a"), ("w1", 1, "b"), ("w2", 0, "c"), ("w2", 1, "d")],
            "walk_id string, step int, node string",
        )
        out = {
            (r.node_a, r.node_b)
            for r in walk_cooccurrence(walks, window=4).collect()
        }
        assert out == {("a", "b"), ("c", "d")}


class TestTextrank:
    def test_matches_integer_pagerank_model(self, spark):
        from rdf_diff_store_spark.functions.text import textrank_keywords

        docs = spark.createDataFrame(
            [(1, "the cat sat"), (2, "the dog sat sat"), (3, "cat the")],
            "doc_id long, text string",
        )
        # adjacent pairs (self-pairs dropped): doc1 the-cat, cat-sat;
        # doc2 the-dog, dog-sat, sat-sat(drop); doc3 cat-the
        und = {("cat", "the"), ("cat", "sat"), ("dog", "the"), ("dog", "sat")}
        edges = sorted(und | {(b, a) for a, b in und})
        expect = _int_pagerank(edges, iterations=4)
        got = {r.word: r.rank_micro for r in textrank_keywords(docs).collect()}
        assert got == expect

    def test_case_fold_and_hub_ranks_highest(self, spark):
        from rdf_diff_store_spark.functions.text import textrank_keywords

        docs = spark.createDataFrame(
            [(i, f"Hub term{i}") for i in range(6)],
            "doc_id long, text string",
        )
        rows = textrank_keywords(docs).orderBy(F.desc("rank_micro")).collect()
        assert rows[0].word == "hub"
        assert all(r.word == r.word.lower() for r in rows)


class TestBowtie:
    def _classes(self, spark, pairs):
        from rdf_diff_store_spark.operators.graph import bowtie_classes

        df = spark.createDataFrame(pairs, "src string, dst string")
        return {r.id: r.bowtie_class for r in bowtie_classes(df).collect()}

    def test_textbook_bowtie(self, spark):
        # in1 -> core(a<->b<->c) -> out1 -> out2; island x->y (acyclic)
        out = self._classes(
            spark,
            [
                ("a", "b"), ("b", "c"), ("c", "a"),
                ("in1", "a"), ("c", "out1"), ("out1", "out2"),
                ("x", "y"),
            ],
        )
        assert out == {
            "a": "core", "b": "core", "c": "core",
            "in1": "in", "out1": "out", "out2": "out",
            "x": "disc", "y": "disc",
        }

    def test_largest_scc_wins_and_min_id_tiebreak(self, spark):
        # two 2-cycles; ('a','b') ring is the min-scc_id tie winner
        out = self._classes(
            spark, [("a", "b"), ("b", "a"), ("p", "q"), ("q", "p")]
        )
        assert out["a"] == out["b"] == "core"
        assert out["p"] == out["q"] == "disc"

    def test_reachable_set_is_set_not_pairs(self, spark):
        from rdf_diff_store_spark.operators.graph import reachable_set

        e = spark.createDataFrame(
            [("s1", "m"), ("s2", "m"), ("m", "t")], "src string, dst string"
        )
        srcs = spark.createDataFrame([("s1",), ("s2",)], "node string")
        rows = sorted(r.node for r in reachable_set(e, srcs).collect())
        assert rows == ["m", "t"]  # one row per reached node, no seed column


class TestSeededDistances:
    def test_min_distance_wins_over_longer_path(self, spark):
        from rdf_diff_store_spark.operators.graph import seeded_distances

        # s -> a -> b -> t  and shortcut s -> t
        e = spark.createDataFrame(
            [("s", "a"), ("a", "b"), ("b", "t"), ("s", "t")],
            "src string, dst string",
        )
        seeds = spark.createDataFrame([("s",)], "seed string")
        out = {
            (r.seed, r.node): r.dist for r in seeded_distances(e, seeds).collect()
        }
        assert out == {("s", "a"): 1, ("s", "t"): 1, ("s", "b"): 2}

    def test_cycle_terminates_and_self_distance(self, spark):
        from rdf_diff_store_spark.operators.graph import seeded_distances

        e = spark.createDataFrame(
            [("s", "m"), ("m", "s")], "src string, dst string"
        )
        seeds = spark.createDataFrame([("s",)], "seed string")
        out = {
            (r.seed, r.node): r.dist for r in seeded_distances(e, seeds).collect()
        }
        # the seed itself is reachable at distance 2 around the cycle
        assert out == {("s", "m"): 1, ("s", "s"): 2}

    def test_per_seed_independence(self, spark):
        from rdf_diff_store_spark.operators.graph import seeded_distances

        e = spark.createDataFrame(
            [("s1", "x"), ("x", "y"), ("s2", "y")], "src string, dst string"
        )
        seeds = spark.createDataFrame([("s1",), ("s2",)], "seed string")
        out = {
            (r.seed, r.node): r.dist for r in seeded_distances(e, seeds).collect()
        }
        assert out == {("s1", "x"): 1, ("s1", "y"): 2, ("s2", "y"): 1}


class TestHyperball:
    def test_equals_sketch_of_exact_ball(self, spark):
        from rdf_diff_store_spark.operators.graph import hyperball
        from rdf_diff_store_spark.operators.sketch import hll_distinct

        # chain a->b->c->d plus shortcut a->c
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
        e = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.node: (r.n_regs, r.sum_scaled, r.est_distinct)
            for r in hyperball(e, radius=2, b=4).collect()
        }
        # exact 2-hop out-balls (incl. self)
        balls = {
            "a": {"a", "b", "c", "d"},
            "b": {"b", "c", "d"},
            "c": {"c", "d"},
            "d": {"d"},
        }
        members = spark.createDataFrame(
            [(n, m) for n, ms in balls.items() for m in ms],
            "node string, member string",
        )
        want = {
            r.node: (r.n_regs, r.sum_scaled, r.est_distinct)
            for r in hll_distinct(members, ["node"], "member", b=4).collect()
        }
        # HyperBall's iterated merge must equal the sketch of the
        # exact ball REGISTER-FOR-REGISTER (merge is lossless max)
        assert got == want

    def test_radius_zero_is_singleton(self, spark):
        from rdf_diff_store_spark.operators.graph import hyperball

        e = spark.createDataFrame([("a", "b")], "src string, dst string")
        out = {r.node: r.n_regs for r in hyperball(e, radius=0, b=4).collect()}
        assert out == {"a": 1, "b": 1}


class TestNeighborhoodFunction:
    def test_curve_is_monotone_and_converges(self, spark):
        from rdf_diff_store_spark.operators.graph import neighborhood_function

        # directed 4-cycle: ball sizes 1,2,3,4,4 at t=0..4 per node
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
            "src string, dst string",
        )
        rows = sorted(
            (r.radius, r.n_nodes, r.pairs_est)
            for r in neighborhood_function(e, max_radius=4, b=4).collect()
        )
        assert [r[0] for r in rows] == [0, 1, 2, 3, 4]
        assert all(r[1] == 4 for r in rows)
        ests = [r[2] for r in rows]
        assert all(a <= b for a, b in zip(ests, ests[1:]))  # N(t) monotone
        assert ests[3] == ests[4]  # diameter 3: curve flat afterwards


def _n2v_model(edges, seeds, length, wr, ws, wo, salt="n2v"):
    """Pure-python mirror of node2vec_walks' draw discipline."""
    from collections import defaultdict

    adj = defaultdict(list)
    eset = set(edges)
    for s, d in sorted(set(edges)):
        adj[s].append(d)
    walks = {}
    for seed in seeds:
        w = {0: seed}
        if adj[seed]:
            w[1] = adj[seed][_md5_pick("n2v", seed, 1, len(adj[seed]))]
            t = 2
            while t <= length and adj.get(w[t - 1]):
                u, prev = w[t - 1], w[t - 2]
                cands = sorted(adj[u])
                ws_ = [
                    wr if x == prev else (ws if (prev, x) in eset else wo)
                    for x in cands
                ]
                r = _md5_pick("n2v", seed, t, sum(ws_))
                cum = 0
                for x, wt in zip(cands, ws_):
                    cum += wt
                    if r < cum:
                        w[t] = x
                        break
                t += 1
        walks[seed] = w
    return walks


class TestNode2vecWalks:
    EDGES = [
        ("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("b", "d"),
        ("c", "a"), ("c", "d"), ("d", "b"),
    ]

    def test_matches_python_model(self, spark):
        from rdf_diff_store_spark.operators.graph import node2vec_walks

        e = spark.createDataFrame(self.EDGES, "src string, dst string")
        s = spark.createDataFrame([("a",), ("b",)], "seed string")
        rows = node2vec_walks(e, s, length=6, w_return=1, w_stay=4, w_out=2)
        got = {}
        for r in rows.collect():
            got.setdefault(r.walk_id, {})[r.step] = r.node
        want = _n2v_model(self.EDGES, ["a", "b"], 6, 1, 4, 2)
        assert got == want

    def test_return_weight_zero_never_backtracks(self, spark):
        from rdf_diff_store_spark.operators.graph import node2vec_walks

        # two-node pair with a side exit: w_return=0 forbids going back
        edges = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("c", "a")]
        e = spark.createDataFrame(edges, "src string, dst string")
        s = spark.createDataFrame([("a",)], "seed string")
        rows = sorted(
            (r.step, r.node)
            for r in node2vec_walks(
                e, s, length=8, w_return=0, w_stay=1, w_out=1
            ).collect()
        )
        seq = [n for _, n in rows]
        for i in range(2, len(seq)):
            assert seq[i] != seq[i - 2] or seq[i - 1] == seq[i]  # no immediate return


class TestHarmonicCentrality:
    def test_matches_exact_on_saturating_sketch(self, spark):
        from rdf_diff_store_spark.operators.graph import harmonic_centrality

        # star out-edges: center reaches 3 leaves at distance 1,
        # leaves reach nothing. With b=4 the raw estimator is exact
        # DELTAS for tiny monotone ball growth only when registers
        # differ; instead pin the MODEL property: leaves score 0 and
        # the center's score equals (1e6)*(est(ball1)-est(ball0)).
        e = spark.createDataFrame(
            [("c", "l1"), ("c", "l2"), ("c", "l3")], "src string, dst string"
        )
        out = {r.node: r.h_micro for r in harmonic_centrality(e, 3, b=4).collect()}
        assert out["l1"] == out["l2"] == out["l3"] == 0
        assert out["c"] > 0

    def test_chain_weights_decay_with_distance(self, spark):
        from rdf_diff_store_spark.operators.graph import harmonic_centrality
        from rdf_diff_store_spark.operators.sketch import hll_distinct

        # a -> b -> c: H(a) = 1e6*(d1 growth) + 500000*(d2 growth);
        # cross-check against sketch estimates of the exact balls
        e = spark.createDataFrame([("a", "b"), ("b", "c")], "src string, dst string")
        out = {r.node: r.h_micro for r in harmonic_centrality(e, 4, b=4).collect()}

        def est(members):
            df = spark.createDataFrame(
                [("g", m) for m in members], "g string, member string"
            )
            return hll_distinct(df, ["g"], "member", b=4).collect()[0].est_distinct

        b0, b1, b2 = est(["a"]), est(["a", "b"]), est(["a", "b", "c"])
        assert out["a"] == 1_000_000 * (b1 - b0) + 500_000 * (b2 - b1)
        assert out["c"] == 0


def test_bfs_convergence_on_final_iteration_is_not_an_error(spark):
    from rdf_diff_store_spark.operators.graph import (
        reachable_set,
        seeded_closure,
        seeded_distances,
    )

    # 2-hop chain with max_iterations=2: the 2nd (last allowed) loop
    # pass empties the frontier — must return, not raise
    e = spark.createDataFrame([("s", "a"), ("a", "b")], "src string, dst string")
    srcs = spark.createDataFrame([("s",)], "node string")
    assert reachable_set(e, srcs, max_iterations=2).count() == 2
    seeds = spark.createDataFrame([("s",)], "seed string")
    assert seeded_closure(e, seeds, max_iterations=2).count() == 2
    assert seeded_distances(e, seeds, max_iterations=2).count() == 2


class TestSccFwbw:
    """FW-BW SCC (scc_fwbw) pinned ≡ the closure-based scc, plus the
    r04 VERDICT wrong-#2 contract: bowtie_classes never runs the
    doubling transitive closure (quadratic inside the giant core it
    exists to find)."""

    def _both(self, spark, pairs):
        from rdf_diff_store_spark.operators.graph import scc, scc_fwbw

        df = spark.createDataFrame(pairs, "src string, dst string")
        closure = {r.id: r.scc_id for r in scc(df).collect()}
        fwbw = {r.id: r.scc_id for r in scc_fwbw(df).collect()}
        return closure, fwbw

    def test_hand_graphs_match_closure(self, spark):
        for pairs in [
            [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "x"),
             ("d", "a"), ("c", "x")],
            [("s", "s"), ("s", "t")],
            [("1", "2"), ("2", "3"), ("3", "4")],
            [("a", "b"), ("b", "a"), ("p", "q"), ("q", "p"), ("b", "p")],
        ]:
            closure, fwbw = self._both(spark, pairs)
            assert fwbw == closure

    def test_seeded_random_graphs_match_closure(self, spark):
        import random

        for seed in (7, 23, 91):
            rng = random.Random(seed)
            n = 24
            pairs = list(
                {
                    (f"n{rng.randrange(n):02d}", f"n{rng.randrange(n):02d}")
                    for _ in range(60)
                }
            )
            closure, fwbw = self._both(spark, sorted(pairs))
            assert fwbw == closure, f"seed {seed} diverged"

    def test_deep_chain_trims_to_singletons(self, spark):
        # a pure DAG chain longer than one outer round's trim budget:
        # repeated trim rounds must still converge to all-singletons
        from rdf_diff_store_spark.operators.graph import scc_fwbw

        pairs = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(13)]
        df = spark.createDataFrame(pairs, "src string, dst string")
        out = {r.id: r.scc_id for r in scc_fwbw(df).collect()}
        assert out == {f"c{i:03d}": f"c{i:03d}" for i in range(14)}

    def test_deep_ring_exceeds_old_sweep_cap(self, spark):
        # one 80-node directed ring: trim is a no-op (every node has
        # in+out), so the pivot sweep must walk the full ring — deeper
        # than the old 60-iteration _labeled_reach default, which made
        # scc_fwbw RAISE on any >60-diameter part (e.g. long redirect
        # rings reached via scc's auto mode). sweep_depth=300 covers it.
        from rdf_diff_store_spark.operators.graph import scc_fwbw

        n = 80
        pairs = [(f"r{i:03d}", f"r{(i + 1) % n:03d}") for i in range(n)]
        df = spark.createDataFrame(pairs, "src string, dst string")
        out = {r.id: r.scc_id for r in scc_fwbw(df).collect()}
        assert out == {f"r{i:03d}": "r000" for i in range(n)}

    def test_trim_exhaustion_orphan_is_not_dropped(self, spark):
        # 11-node path: trim round 5 (the default budget) removes BOTH
        # neighbors of the middle node, stripping it of every part-local
        # edge while it stays active — the WCC relabel sees only
        # edge-incident nodes, so before the orphan sweep this node
        # silently vanished from the output (r05 review find)
        from rdf_diff_store_spark.operators.graph import scc_fwbw

        pairs = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(10)]
        df = spark.createDataFrame(pairs, "src string, dst string")
        out = {r.id: r.scc_id for r in scc_fwbw(df).collect()}
        assert out == {f"c{i:03d}": f"c{i:03d}" for i in range(11)}

    def test_bowtie_never_runs_transitive_closure(self, spark, monkeypatch):
        # spy: the closure is forbidden on the bowtie path (same
        # technique as the seeded-path audit in explain_audit check 7)
        from rdf_diff_store_spark.operators import graph as g

        def _boom(*a, **k):  # pragma: no cover - tripwire
            raise AssertionError("transitive_closure ran on the bowtie path")

        monkeypatch.setattr(g, "transitive_closure", _boom)
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("in1", "a"), ("c", "out1")],
            "src string, dst string",
        )
        out = {r.id: r.bowtie_class for r in g.bowtie_classes(df).collect()}
        assert out["a"] == out["b"] == out["c"] == "core"
        assert out["in1"] == "in" and out["out1"] == "out"

    def test_scc_delegates_to_fwbw_above_threshold(self, spark, monkeypatch):
        from rdf_diff_store_spark.operators import graph as g

        def _boom(*a, **k):  # pragma: no cover - tripwire
            raise AssertionError("closure ran despite fwbw threshold")

        monkeypatch.setattr(g, "transitive_closure", _boom)
        df = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string"
        )
        out = {r.id: r.scc_id for r in g.scc(df, fwbw_threshold_nodes=2).collect()}
        assert out == {"a": "a", "b": "a", "c": "c"}


class TestNode2vecMaxDegree:
    def test_hub_cap_walk_validity_and_replay(self, spark):
        # one 10^4-degree hub; capped walks must still be real walks
        # over ORIGINAL edges, and two runs must be bit-identical
        from rdf_diff_store_spark.operators.graph import node2vec_walks

        hub_edges = [("hub", f"leaf{i:05d}") for i in range(10_000)]
        back = [(f"leaf{i:05d}", "hub") for i in range(0, 10_000, 100)]
        edges = hub_edges + back
        e = spark.createDataFrame(edges, "src string, dst string")
        s = spark.createDataFrame([("hub",)], "seed string")
        edge_set = set(edges)

        def run():
            rows = node2vec_walks(e, s, length=3, max_degree=32).collect()
            byw = {}
            for r in rows:
                byw.setdefault(r.walk_id, {})[r.step] = r.node
            return byw

        first = run()
        assert first == run()  # deterministic replay under the cap
        for steps in first.values():
            assert steps[0] == "hub"
            for t in range(1, max(steps) + 1):
                assert (steps[t - 1], steps[t]) in edge_set  # valid walk

    def test_cap_at_or_above_degree_is_identity(self, spark):
        from rdf_diff_store_spark.operators.graph import node2vec_walks

        edges = [("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"),
                 ("c", "a"), ("c", "d"), ("d", "b")]
        e = spark.createDataFrame(edges, "src string, dst string")
        s = spark.createDataFrame([("a",), ("b",)], "seed string")

        def walks(**kw):
            return sorted(
                (r.walk_id, r.step, r.node)
                for r in node2vec_walks(e, s, length=5, **kw).collect()
            )

        assert walks(max_degree=3) == walks(max_degree=None)
