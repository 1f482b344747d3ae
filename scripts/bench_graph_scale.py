"""Session-19 graph-structure family at 100×-the-test-scale:
synthesize million-node graphs IN Spark (no driver data), then time
SCC, wedge-overlap link prediction, deterministic random walks, and
meta-blocking — direct evidence that the bounded-fanout shapes
(closure on bounded-reach graphs, degree-capped wedge minting,
(src, idx) lookup-join steps, purged block self-joins) hold far
beyond the sf0.1 driver tables.

Usage: python scripts/bench_graph_scale.py [n_nodes]
Default 1,000,000 nodes / profiles; local[$SPARK_GRAFT_CPUS].
Prints one JSON line for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from rdf_diff_store_spark.operators.blocking import meta_blocking
    from rdf_diff_store_spark.operators.graph import (
        random_walks,
        scc,
        wedge_overlap,
    )
    from rdf_diff_store_spark.session import get_spark

    spark = get_spark("bench-graph-scale")
    out: dict[str, object] = {
        "metric": "graph_scale",
        "n_nodes": n,
        "cpus": spark.sparkContext.defaultParallelism,
        "unit": "sec",
    }

    # --- SCC: 4-rings (the redirect-cycle regime: bounded reach) -----
    ring = (
        spark.range(n)
        .select(
            F.concat(F.lit("u"), F.col("id")).alias("src"),
            F.concat(
                F.lit("u"), F.col("id") - (F.col("id") % 4) + (F.col("id") + 1) % 4
            ).alias("dst"),
        )
        .localCheckpoint()
    )
    # both paths on the same fixture: the closure is linear here
    # (bounded reach) and is what a redirect-collapse caller pins with
    # algorithm="closure"; fwbw is the safe default above the auto
    # threshold (its worst case is constant-factor, closure's is
    # quadratic in a giant core)
    t0 = time.time()
    n_comp = scc(ring, algorithm="closure").select("scc_id").distinct().count()
    out["scc_closure_sec"] = round(time.time() - t0, 2)
    out["scc_components"] = n_comp
    t0 = time.time()
    n_comp_f = scc(ring, algorithm="fwbw").select("scc_id").distinct().count()
    out["scc_fwbw_sec"] = round(time.time() - t0, 2)
    assert n_comp_f == n_comp

    # --- wedge overlap: bipartite, centers of degree 10 --------------
    n_centers = n // 5
    adj = (
        spark.range(n_centers * 10)
        .select(
            F.expr(f"concat('c', id % {n_centers})").alias("center"),
            F.expr(
                f"concat('l', ((id % {n_centers}) * 7 + id div {n_centers})"
                f" % {2 * n_centers})"
            ).alias("leaf"),
        )
        .localCheckpoint()
    )
    t0 = time.time()
    n_pairs = wedge_overlap(adj, max_center_degree=1000).count()
    out["wedge_sec"] = round(time.time() - t0, 2)
    out["wedge_pairs"] = n_pairs

    # --- random walks: out-degree-8 expander, n/10 walks of length 10
    deg = 8
    edges = (
        spark.range(n)
        .select(
            "id",
            F.explode(
                F.array(*[F.lit(k) for k in range(1, deg + 1)])
            ).alias("k"),
        )
        .select(
            F.concat(F.lit("v"), F.col("id")).alias("src"),
            F.concat(
                F.lit("v"), (F.col("id") * F.col("k") * 2654435761 + F.col("k")) % n
            ).alias("dst"),
        )
        .localCheckpoint()
    )
    seeds = (
        spark.range(n // 10)
        .select(F.concat(F.lit("v"), F.col("id") * 10 % n).alias("seed"))
        .localCheckpoint()
    )
    t0 = time.time()
    n_steps = random_walks(edges, seeds, length=10).count()
    out["walks_sec"] = round(time.time() - t0, 2)
    out["walk_rows"] = n_steps

    # --- HyperBall: 2-hop ANF over the same expander, b=4 ------------
    # row-per-register state: n x <=16 rows forever (the sketch-state
    # contrast to scc's closure); register-max merge combines map-side
    from rdf_diff_store_spark.operators.graph import hyperball

    t0 = time.time()
    n_est = hyperball(edges, radius=2, b=4).count()
    out["hyperball_sec"] = round(time.time() - t0, 2)
    out["hyperball_nodes"] = n_est

    # --- meta-blocking: 3 redundancy-positive keys, blocks of ~10 ----
    keys = (
        spark.range(n)
        .select(
            F.concat(F.lit("p"), F.col("id")).alias("id"),
            F.explode(
                F.array(
                    F.expr("concat('a', id div 10)"),
                    F.expr("concat('b', (id + 5) div 10)"),
                    F.expr(f"concat('c', id % {n // 8})"),
                )
            ).alias("block_key"),
        )
        .localCheckpoint()
    )
    t0 = time.time()
    n_cand = meta_blocking(keys, max_block_size=200).count()
    out["blocking_sec"] = round(time.time() - t0, 2)
    out["blocking_pairs"] = n_cand

    # --- sorted neighborhood: window-3 pairs over 1M profiles --------
    from rdf_diff_store_spark.operators.blocking import sorted_neighborhood

    prof = (
        spark.range(n)
        .select(
            F.concat(F.lit("p"), F.col("id")).alias("id"),
            F.expr("lpad(cast((id * 2654435761) % 100000000 as string), 8, '0')").alias(
                "key"
            ),
        )
        .localCheckpoint()
    )
    t0 = time.time()
    n_sn = sorted_neighborhood(prof, window=3, prefix_len=3).count()
    out["sorted_neighborhood_sec"] = round(time.time() - t0, 2)
    out["sorted_neighborhood_pairs"] = n_sn

    print(json.dumps(out))


if __name__ == "__main__":
    main()
