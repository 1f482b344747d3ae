"""Skew-handling join operators (north_star: "skew from hub entities
is handled with salted repartitioning and AQE skew-join splitting").

Two layers of defense:

1. AQE skew-join splitting is ON session-wide
   (spark.sql.adaptive.skewJoin.enabled, session.py) — Spark splits
   oversized sort-merge partitions at runtime. This is the default
   path and costs nothing to adopt.
2. `salted_join` is the explicit pre-plan remedy for the case AQE
   can't fix: a broadcast-ineligible join where one side has a few
   hub keys (the quadratically-skewed entity distribution in
   sources/pages.py is exactly this). The skewed fact side gets a
   random-but-deterministic salt in [0, n_salts); the dimension side
   is replicated n_salts times (explode); the join key becomes
   (key, salt), spreading each hub key over n_salts reducers.

Salting costs n_salts× replication of the dim side, so use it only
when dim_rows × n_salts ≪ fact_rows — the hub-entity case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact` ⋈ `dim` on column `on` with hub-key salting.

    The salt is xxhash64 of the fact row's full tuple mod n_salts —
    deterministic (re-runs produce identical partitioning; no RNG
    state on executors), uniform enough to split hubs.

    `how` is restricted to fact-side-preserving joins: the dim side is
    exploded n_salts times, so any dim-preserving join (right/full
    outer) would emit every unmatched dim row n_salts times.
    """
    safe_how = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in safe_how:
        raise ValueError(
            f"salted_join(how={how!r}): only fact-side-preserving joins are "
            f"salt-safe ({sorted(safe_how)}); a dim-preserving join would "
            f"duplicate unmatched dim rows n_salts={n_salts} times"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts)).cast("int")
    salted_fact = fact.withColumn("_salt", salt)
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(salted_dim, [on, "_salt"], how)
    return out.drop("_salt")


def skew_profile(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Key-frequency profile — the decision input for salting: compare
    max key count to the mean; ratios ≫ partition count mean a hub."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    return counts.orderBy(F.col("n").desc()).limit(top_n)


def capped_topk_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list,
    k: int,
    n_salts: int = 16,
    rank_col: str = "rk",
) -> DataFrame:
    """Keep the first ``k`` rows per group under a TOTAL order — the
    corpus-selection "domain frequency cap" (at most k pages per host
    survive into the training mix) and every other bounded-quota
    selection, built to survive hub groups.

    The naive plan — one window over ``partitionBy(group)`` — puts a
    hot host's ENTIRE row set into a single task (a 10^8-page domain
    = one straggler sorting 10^8 rows). Instead: two-level capping.

    1. Pre-cap: rows get a deterministic salt (xxhash64 of the order
       key mod ``n_salts``); a window over (group, salt) keeps each
       bucket's top-k. Any row in the group's global top-k is in its
       bucket's top-k, so this discards only rows that cannot win —
       and the hot group's sort is spread over ``n_salts`` tasks.
    2. Final: the real window over (group) runs on ≤ n_salts·k rows
       per group — bounded, skew-free by construction.

    ``order_cols`` must be a TOTAL order (tie-break with a unique id)
    or ranks are nondeterministic. Results are provably identical to
    the single-window plan (pytest pins this), so the DuckDB oracle
    can stay naive.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    salt = F.pmod(F.xxhash64(*order_cols), F.lit(n_salts))
    w1 = (
        Window.partitionBy(F.col(group_col), F.col("_salt"))
        .orderBy(*order_cols)
    )
    pre = (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_cols)
    return pre.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
