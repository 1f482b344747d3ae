"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship versioned-KG query on sf0.001.
`queries()` exposes every implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; `oracle_sql()` provides the
DuckDB-equivalent ANSI SQL for each (tables region nation customer
supplier part orders lineitem events documents embeddings are
pre-registered views).

Column names are aliased identically on both sides; doubles are
rounded on both sides so the value-hash compare is stable across
engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.graph import transitive_closure
from rdf_diff_store_spark.operators.versioned import (
    compact_changelog,
    diff,
    metadata,
    snapshot_at,
)
from rdf_diff_store_spark.schemas import load_table
from rdf_diff_store_spark.sources.relational import (
    CHANGELOG_FROM_EVENTS_SQL,
    TRIPLES_FROM_TPCH_SQL,
    changelog_from_events,
    triples_from_tpch,
)

# Version-axis probe timestamps: the events table spans 2024-01-01 →
# 2024-01-30 at every sf (TESTDATA.md).
T_MID = "2024-01-10 00:00:00"
T_LATE = "2024-01-20 00:00:00"

# ---------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: replay the events stream as a versioned graph
    changelog, reconstruct the snapshot at T_LATE, expand to triples
    (mapInPandas Turtle parse), and aggregate triple counts per
    predicate — the reference's snapshot + query lifecycle
    (SURVEY.md §3.1) end-to-end in one plan."""
    sf_dir = "/root/testdata/sf0.001"
    from rdf_diff_store_spark.operators.versioned import snapshot_triples

    changelog = changelog_from_events(spark, sf_dir)
    triples = snapshot_triples(changelog, T_LATE)
    return triples.groupBy("pred").agg(
        F.count("*").alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
    )


# ---------------------------------------------------------------------------
# helpers

_SNAPSHOT_SQL = """
WITH changelog AS ({changelog}),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY graph_id
      ORDER BY ts DESC, op DESC, coalesce(content_hash, '') DESC) AS rn
  FROM changelog WHERE ts <= TIMESTAMP '{t}'
)
SELECT graph_id, payload, content_hash FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


def _snapshot_sql(t: str) -> str:
    return _SNAPSHOT_SQL.format(changelog=CHANGELOG_FROM_EVENTS_SQL, t=t)


# ---------------------------------------------------------------------------
# versioned-store family (SURVEY.md §2A)


def q_snapshot_at(spark, sf_dir):
    """O-06/O-07: latest-wins tombstone-filtered snapshot at T_MID."""
    snap = snapshot_at(changelog_from_events(spark, sf_dir), T_MID)
    return snap.select("graph_id", "payload", "content_hash")


def q_snapshot_pre_history(spark, sf_dir):
    """Snapshot before the first version is empty (git.rs:157-158)."""
    snap = snapshot_at(changelog_from_events(spark, sf_dir), "1990-01-01 00:00:00")
    return snap.select("graph_id", "content_hash")


def q_diff_versions(spark, sf_dir):
    """O-08 at graph-version granularity: added/removed between T_MID
    and T_LATE via bidirectional anti-joins."""
    d = diff(changelog_from_events(spark, sf_dir), T_MID, T_LATE, on_triples=False)
    return d.select("graph_id", "content_hash", "change")


def q_diff_triples(spark, sf_dir):
    """O-08 at triple granularity — exercises the mapInPandas Turtle
    parser on both snapshots."""
    d = diff(changelog_from_events(spark, sf_dir), T_MID, T_LATE, on_triples=True)
    return d.select("graph_id", "subj", "pred", "obj", "change")


def q_metadata(spark, sf_dir):
    """O-09: first/last version times (epoch micros for portability)."""
    m = metadata(changelog_from_events(spark, sf_dir))
    # parquet timestamps load as TIMESTAMP_NTZ; with the session TZ
    # pinned to UTC the cast to TIMESTAMP is a pure reinterpretation
    return m.select(
        F.unix_micros(F.col("start_time").cast("timestamp")).alias("start_us"),
        F.unix_micros(F.col("end_time").cast("timestamp")).alias("end_us"),
    )


def q_compact_versions(spark, sf_dir):
    """O-01 idempotence in bulk-replay form: versions retained per
    graph after dropping consecutive identical content."""
    c = compact_changelog(changelog_from_events(spark, sf_dir))
    return c.groupBy("graph_id").agg(F.count("*").alias("n_versions"))


_ORACLE_VERSIONED = {
    "snapshot_at": _snapshot_sql(T_MID),
    "snapshot_pre_history": """
WITH changelog AS ({changelog}),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY graph_id
      ORDER BY ts DESC, op DESC, coalesce(content_hash, '') DESC) AS rn
  FROM changelog WHERE ts <= TIMESTAMP '1990-01-01 00:00:00'
)
SELECT graph_id, content_hash FROM ranked WHERE rn = 1 AND op <> 'delete'
""".format(changelog=CHANGELOG_FROM_EVENTS_SQL),
    "diff_versions": """
WITH s1 AS ({s1}), s2 AS ({s2})
SELECT graph_id, content_hash, 'added' AS change FROM s2
WHERE NOT EXISTS (SELECT 1 FROM s1
                  WHERE s1.graph_id = s2.graph_id AND s1.content_hash = s2.content_hash)
UNION ALL
SELECT graph_id, content_hash, 'removed' AS change FROM s1
WHERE NOT EXISTS (SELECT 1 FROM s2
                  WHERE s2.graph_id = s1.graph_id AND s2.content_hash = s1.content_hash)
""".format(s1=_snapshot_sql(T_MID), s2=_snapshot_sql(T_LATE)),
    "diff_triples": """
WITH s1r AS ({s1}), s2r AS ({s2}),
s1 AS (SELECT graph_id,
              regexp_extract(payload, '^<([^>]*)>', 1) AS subj,
              regexp_extract(payload, '> <([^>]*)>', 1) AS pred,
              regexp_extract(payload, '"([^"]*)"', 1) AS obj
       FROM s1r),
s2 AS (SELECT graph_id,
              regexp_extract(payload, '^<([^>]*)>', 1) AS subj,
              regexp_extract(payload, '> <([^>]*)>', 1) AS pred,
              regexp_extract(payload, '"([^"]*)"', 1) AS obj
       FROM s2r)
SELECT graph_id, subj, pred, obj, 'added' AS change FROM s2
WHERE NOT EXISTS (SELECT 1 FROM s1 WHERE s1.graph_id = s2.graph_id
                  AND s1.subj = s2.subj AND s1.pred = s2.pred AND s1.obj = s2.obj)
UNION ALL
SELECT graph_id, subj, pred, obj, 'removed' AS change FROM s1
WHERE NOT EXISTS (SELECT 1 FROM s2 WHERE s2.graph_id = s1.graph_id
                  AND s2.subj = s1.subj AND s2.pred = s1.pred AND s2.obj = s1.obj)
""".format(s1=_snapshot_sql(T_MID), s2=_snapshot_sql(T_LATE)),
    "metadata": f"""
WITH changelog AS ({CHANGELOG_FROM_EVENTS_SQL})
SELECT epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us FROM changelog
""",
    "compact_versions": f"""
WITH changelog AS ({CHANGELOG_FROM_EVENTS_SQL}),
lagged AS (
  SELECT graph_id,
         coalesce(content_hash, '__tombstone__') AS cur,
         lag(coalesce(content_hash, '__tombstone__')) OVER (
             PARTITION BY graph_id
             ORDER BY ts, op, coalesce(content_hash, '')) AS prev
  FROM changelog
)
SELECT graph_id, count(*) AS n_versions FROM lagged
WHERE prev IS NULL OR prev <> cur GROUP BY graph_id
""",
}


# ---------------------------------------------------------------------------
# SPARQL 1.1 algebra family (SURVEY.md §2B) over the TPC-H triple view


def q_sparql_bgp_join(spark, sf_dir):
    """BGP: ?c inNation ?n . ?n inRegion ?r . ?r name 'ASIA'
    → chain of hash equi-joins; the nation/region patterns are small
    and broadcast."""
    t = triples_from_tpch(spark, sf_dir)
    cust = t.filter(F.col("pred") == "inNation").select(
        F.col("subj").alias("customer"), F.col("obj").alias("nation")
    ).filter(F.col("customer").startswith("customer:"))
    nreg = t.filter(F.col("pred") == "inRegion").select(
        F.col("subj").alias("nation"), F.col("obj").alias("region")
    )
    rname = t.filter((F.col("pred") == "name") & (F.col("obj") == "ASIA")).select(
        F.col("subj").alias("region")
    )
    return cust.join(F.broadcast(nreg), "nation").join(F.broadcast(rname), "region").select(
        "customer", "nation"
    )


def q_sparql_optional(spark, sf_dir):
    """OPTIONAL ≙ left outer join: every nation with its (possibly
    absent) suppliers."""
    t = triples_from_tpch(spark, sf_dir)
    nations = t.filter((F.col("pred") == "name") & F.col("subj").startswith("nation:")).select(
        F.col("subj").alias("nation"), F.col("obj").alias("nation_name")
    )
    sup = t.filter((F.col("pred") == "inNation") & F.col("subj").startswith("supplier:")).select(
        F.col("subj").alias("supplier"), F.col("obj").alias("nation")
    )
    return nations.join(sup, "nation", "left_outer").select("nation", "nation_name", "supplier")


def q_sparql_union(spark, sf_dir):
    """UNION of two patterns."""
    t = triples_from_tpch(spark, sf_dir)
    r = t.filter((F.col("pred") == "name") & F.col("subj").startswith("region:"))
    n = t.filter((F.col("pred") == "name") & F.col("subj").startswith("nation:"))
    return r.unionByName(n).select(F.col("subj").alias("entity"), F.col("obj").alias("entity_name"))


def q_sparql_minus(spark, sf_dir):
    """MINUS / NOT EXISTS ≙ left anti join: nations with no suppliers."""
    t = triples_from_tpch(spark, sf_dir)
    nations = t.filter(F.col("pred") == "inRegion").select(F.col("subj").alias("nation"))
    sup_nations = t.filter(
        (F.col("pred") == "inNation") & F.col("subj").startswith("supplier:")
    ).select(F.col("obj").alias("nation"))
    return nations.join(sup_nations, "nation", "left_anti")


def q_sparql_exists(spark, sf_dir):
    """FILTER EXISTS ≙ left semi join: nations having customers."""
    t = triples_from_tpch(spark, sf_dir)
    nations = t.filter(F.col("pred") == "inRegion").select(F.col("subj").alias("nation"))
    cust_nations = t.filter(
        (F.col("pred") == "inNation") & F.col("subj").startswith("customer:")
    ).select(F.col("obj").alias("nation"))
    return nations.join(cust_nations, "nation", "left_semi")


def q_sparql_group_agg(spark, sf_dir):
    """GROUP BY + COUNT + HAVING over customer→nation edges."""
    t = triples_from_tpch(spark, sf_dir)
    return (
        t.filter((F.col("pred") == "inNation") & F.col("subj").startswith("customer:"))
        .groupBy(F.col("obj").alias("nation"))
        .agg(F.count("*").alias("n_customers"))
        .filter(F.col("n_customers") >= 2)
    )


def q_sparql_group_concat(spark, sf_dir):
    """GROUP_CONCAT ≙ sorted collect_list + array_join."""
    t = triples_from_tpch(spark, sf_dir)
    nreg = t.filter(F.col("pred") == "inRegion").select(
        F.col("subj").alias("nation"), F.col("obj").alias("region")
    )
    names = t.filter((F.col("pred") == "name") & F.col("subj").startswith("nation:")).select(
        F.col("subj").alias("nation"), F.col("obj").alias("nation_name")
    )
    return (
        nreg.join(names, "nation")
        .groupBy("region")
        .agg(F.array_join(F.array_sort(F.collect_list("nation_name")), ",").alias("members"))
    )


def q_sparql_distinct_order_limit(spark, sf_dir):
    """DISTINCT + ORDER BY + LIMIT (top-k): 3 largest customer keys in
    segment BUILDING."""
    t = triples_from_tpch(spark, sf_dir)
    seg = t.filter((F.col("pred") == "mktsegment") & (F.col("obj") == "BUILDING")).select(
        F.col("subj").alias("customer")
    )
    return seg.distinct().orderBy(F.col("customer").desc()).limit(3)


def q_sparql_values_bind(spark, sf_dir):
    """VALUES inline data joined to a pattern + BIND(STRLEN(...))."""
    t = triples_from_tpch(spark, sf_dir)
    vals = spark.createDataFrame([("ASIA",), ("EUROPE",)], ["region_name"])
    names = t.filter((F.col("pred") == "name") & F.col("subj").startswith("region:")).select(
        F.col("subj").alias("region"), F.col("obj").alias("region_name")
    )
    return names.join(F.broadcast(vals), "region_name").select(
        "region", "region_name", F.length("region_name").alias("name_len")
    )


def q_sparql_filter_regex(spark, sf_dir):
    """FILTER regex/STRSTARTS on literals: nations whose name matches
    'NATION_1[0-9]'."""
    t = triples_from_tpch(spark, sf_dir)
    return t.filter(
        (F.col("pred") == "name") & F.col("obj").rlike("^NATION_1[0-9]$")
    ).select(F.col("subj").alias("nation"), F.col("obj").alias("nation_name"))


def q_sparql_path_plus(spark, sf_dir):
    """Property path p+ : transitive closure of per-region nextNation
    chains via iterative doubling joins."""
    t = triples_from_tpch(spark, sf_dir)
    edges = t.filter(F.col("pred") == "nextNation").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return transitive_closure(edges).select("src", "dst")


def q_sparql_ask(spark, sf_dir):
    """ASK ≙ limit(1) existence check."""
    t = triples_from_tpch(spark, sf_dir)
    n = t.filter((F.col("pred") == "name") & (F.col("obj") == "MIDDLE EAST")).limit(1).count()
    return spark.createDataFrame([(n > 0,)], "ask boolean")


def q_sparql_construct(spark, sf_dir):
    """CONSTRUCT: rewrite customer→nation→region into a new
    customer→inRegionT edge template (2-hop join, template emit)."""
    t = triples_from_tpch(spark, sf_dir)
    cn = t.filter((F.col("pred") == "inNation") & F.col("subj").startswith("customer:")).select(
        F.col("subj").alias("customer"), F.col("obj").alias("nation")
    )
    nr = t.filter(F.col("pred") == "inRegion").select(
        F.col("subj").alias("nation"), F.col("obj").alias("region")
    )
    return cn.join(F.broadcast(nr), "nation").select(
        F.col("customer").alias("subj"),
        F.lit("inRegionT").alias("pred"),
        F.col("region").alias("obj"),
    )


_T = TRIPLES_FROM_TPCH_SQL

_ORACLE_SPARQL = {
    "sparql_bgp_join": f"""
WITH triples AS ({_T})
SELECT c.subj AS customer, c.obj AS nation
FROM triples c
JOIN triples nr ON nr.pred = 'inRegion' AND nr.subj = c.obj
JOIN triples r  ON r.pred = 'name' AND r.obj = 'ASIA' AND r.subj = nr.obj
WHERE c.pred = 'inNation' AND c.subj LIKE 'customer:%'
""",
    "sparql_optional": f"""
WITH triples AS ({_T}),
nations AS (SELECT subj AS nation, obj AS nation_name FROM triples
            WHERE pred = 'name' AND subj LIKE 'nation:%'),
sup AS (SELECT subj AS supplier, obj AS nation FROM triples
        WHERE pred = 'inNation' AND subj LIKE 'supplier:%')
SELECT n.nation, n.nation_name, s.supplier
FROM nations n LEFT JOIN sup s ON n.nation = s.nation
""",
    "sparql_union": f"""
WITH triples AS ({_T})
SELECT subj AS entity, obj AS entity_name FROM triples
WHERE pred = 'name' AND subj LIKE 'region:%'
UNION ALL
SELECT subj, obj FROM triples WHERE pred = 'name' AND subj LIKE 'nation:%'
""",
    "sparql_minus": f"""
WITH triples AS ({_T})
SELECT subj AS nation FROM triples t WHERE pred = 'inRegion'
AND NOT EXISTS (SELECT 1 FROM triples s WHERE s.pred = 'inNation'
                AND s.subj LIKE 'supplier:%' AND s.obj = t.subj)
""",
    "sparql_exists": f"""
WITH triples AS ({_T})
SELECT subj AS nation FROM triples t WHERE pred = 'inRegion'
AND EXISTS (SELECT 1 FROM triples c WHERE c.pred = 'inNation'
            AND c.subj LIKE 'customer:%' AND c.obj = t.subj)
""",
    "sparql_group_agg": f"""
WITH triples AS ({_T})
SELECT obj AS nation, count(*) AS n_customers FROM triples
WHERE pred = 'inNation' AND subj LIKE 'customer:%'
GROUP BY obj HAVING count(*) >= 2
""",
    "sparql_group_concat": f"""
WITH triples AS ({_T}),
nreg AS (SELECT subj AS nation, obj AS region FROM triples WHERE pred = 'inRegion'),
names AS (SELECT subj AS nation, obj AS nation_name FROM triples
          WHERE pred = 'name' AND subj LIKE 'nation:%')
SELECT region, string_agg(nation_name, ',' ORDER BY nation_name) AS members
FROM nreg JOIN names USING (nation) GROUP BY region
""",
    "sparql_distinct_order_limit": f"""
WITH triples AS ({_T})
SELECT DISTINCT subj AS customer FROM triples
WHERE pred = 'mktsegment' AND obj = 'BUILDING'
ORDER BY customer DESC LIMIT 3
""",
    "sparql_values_bind": f"""
WITH triples AS ({_T})
SELECT subj AS region, obj AS region_name, length(obj) AS name_len
FROM triples WHERE pred = 'name' AND subj LIKE 'region:%'
AND obj IN ('ASIA', 'EUROPE')
""",
    "sparql_filter_regex": f"""
WITH triples AS ({_T})
SELECT subj AS nation, obj AS nation_name FROM triples
WHERE pred = 'name' AND regexp_matches(obj, '^NATION_1[0-9]$')
""",
    "sparql_path_plus": f"""
WITH RECURSIVE triples AS ({_T}),
edges AS (SELECT subj AS src, obj AS dst FROM triples WHERE pred = 'nextNation'),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src, dst FROM reach
""",
    "sparql_ask": f"""
WITH triples AS ({_T})
SELECT EXISTS (SELECT 1 FROM triples WHERE pred = 'name' AND obj = 'MIDDLE EAST') AS ask
""",
    "sparql_construct": f"""
WITH triples AS ({_T})
SELECT cn.subj AS subj, 'inRegionT' AS pred, nr.obj AS obj
FROM triples cn JOIN triples nr ON nr.pred = 'inRegion' AND nr.subj = cn.obj
WHERE cn.pred = 'inNation' AND cn.subj LIKE 'customer:%'
""",
}


# ---------------------------------------------------------------------------
# relational / TPC-H-ish family (the reference's SELECT+agg surface at scale)


def q_tpch_q1(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2000-01-01")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_tpch_q5(spark, sf_dir):
    """Multi-way join through the star schema with a broadcast dim
    chain (region→nation) and an agg by nation."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def q_tpch_q6(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def q_window_topk_per_group(spark, sf_dir):
    """Top-2 orders by totalprice per priority — window row_number
    (the SPARQL-extension window surface, SURVEY.md §2B last row)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_orderpriority", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


_ORACLE_RELATIONAL = {
    "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "tpch_q3": """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
    "tpch_q5": """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
""",
    "tpch_q6": """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    "window_topk_per_group": """
SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2
""",
}


# ---------------------------------------------------------------------------
# training-data / documents family


def q_doc_token_count(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens")
    )


def q_doc_exact_dedup(spark, sf_dir):
    """Exact dedup: canonical keep = min doc_id per content hash."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text")).alias("content_md5"), "doc_id")
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_docs"))
    )


def q_doc_lang_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


def q_doc_quality_score(spark, sf_dir):
    """Quality heuristics JVM-side: alpha ratio + mean token length."""
    docs = load_table(spark, sf_dir, "documents")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    total = F.length(F.col("text"))
    n_tok = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.select(
        "doc_id",
        F.round(alpha / total, 4).alias("alpha_ratio"),
        F.round(total / n_tok, 4).alias("mean_tok_len"),
    )


_ORACLE_DOCS = {
    "doc_token_count": r"""
SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens FROM documents
""",
    "doc_exact_dedup": """
SELECT md5(text) AS content_md5, min(doc_id) AS keep_doc_id, count(*) AS n_docs
FROM documents GROUP BY md5(text)
""",
    "doc_lang_stats": """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars
FROM documents GROUP BY lang
""",
    "doc_quality_score": r"""
SELECT doc_id,
       round(len(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 / len(text), 4) AS alpha_ratio,
       round(len(text) * 1.0 / len(string_split_regex(trim(text), '\s+')), 4) AS mean_tok_len
FROM documents
""",
}


# ---------------------------------------------------------------------------
# embeddings / similarity family


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-3 neighbors for query vectors
    (vec_id < 5). Dot/norm via F.aggregate+F.zip_with — JVM-side,
    no Python. The scale path is LSH bucketing (operators.similarity);
    this is the exact baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    pairs = q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id"))

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    sim = dot(F.col("qv"), F.col("cv")) / (
        F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("cv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("cos_sim", F.round(sim, 4))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", "cos_sim", "rn")
    )


_ORACLE_EMB = {
    "ann_cosine_topk": """
SELECT query_id, neighbor_id, cos_sim, rn FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding, c.embedding), 4) AS cos_sim,
         row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY round(list_cosine_similarity(q.embedding, c.embedding), 4) DESC,
                      c.vec_id) AS rn
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id < 5
) WHERE rn <= 3
""",
}


# ---------------------------------------------------------------------------
# registry


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # §2A versioned store
        "snapshot_at": q_snapshot_at,
        "snapshot_pre_history": q_snapshot_pre_history,
        "diff_versions": q_diff_versions,
        "diff_triples": q_diff_triples,
        "metadata": q_metadata,
        "compact_versions": q_compact_versions,
        # §2B SPARQL algebra
        "sparql_bgp_join": q_sparql_bgp_join,
        "sparql_optional": q_sparql_optional,
        "sparql_union": q_sparql_union,
        "sparql_minus": q_sparql_minus,
        "sparql_exists": q_sparql_exists,
        "sparql_group_agg": q_sparql_group_agg,
        "sparql_group_concat": q_sparql_group_concat,
        "sparql_distinct_order_limit": q_sparql_distinct_order_limit,
        "sparql_values_bind": q_sparql_values_bind,
        "sparql_filter_regex": q_sparql_filter_regex,
        "sparql_path_plus": q_sparql_path_plus,
        "sparql_ask": q_sparql_ask,
        "sparql_construct": q_sparql_construct,
        # relational surface
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "window_topk_per_group": q_window_topk_per_group,
        # training-data ops
        "doc_token_count": q_doc_token_count,
        "doc_exact_dedup": q_doc_exact_dedup,
        "doc_lang_stats": q_doc_lang_stats,
        "doc_quality_score": q_doc_quality_score,
        "ann_cosine_topk": q_ann_cosine_topk,
    }


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(_ORACLE_VERSIONED)
    out.update(_ORACLE_SPARQL)
    out.update(_ORACLE_RELATIONAL)
    out.update(_ORACLE_DOCS)
    out.update(_ORACLE_EMB)
    return out
