"""RDFS forward-chaining entailment materialization over a triples frame.

Reference context: the reference answers SPARQL over stored graphs via
oxigraph (`/root/reference/src/query.rs:102` `execute_query_in_store`),
which evaluates queries against the ASSERTED triples only — any
deployment that wants inherited types visible to queries must
materialize the RDFS closure at load time. This module is that
load-time materializer for the KG-construction pipeline (north_star
"graph materialize" stage): crawl-extracted triples plus a schema
(T-box) in, the ρdf entailment closure out, ready for `store_graph`.

Rule set — the minimal deductive ρdf fragment (Muñoz, Pérez &
Gutierrez, "Minimal Deductive Systems for RDF", ESWC 2007; W3C RDF 1.1
Semantics §9.2 rule names):

* rdfs5  : subPropertyOf is transitive
* rdfs7  : (s p o), (p sp q)            → (s q o)
* rdfs2  : (s p o), (p domain c)        → (s type c)
* rdfs3  : (s p o), (p range  c)        → (o type c)
* rdfs11 : subClassOf is transitive
* rdfs9  : (x type c), (c sc d)         → (x type d)

Applied in exactly that stratified order, each rule sees the previous
rules' output (rdfs7 widens the predicate set BEFORE domain/range fire,
domain/range mint the type assertions BEFORE subclass inheritance), so
one pass reaches the fixpoint — the ρdf rules have no cycles back into
an earlier stratum when, as here, the schema vocabulary itself is not
redefined by instance triples.

Scale design (the 100 TB shape): the T-box (subClassOf / subPropertyOf
/ domain / range rows) is vocabulary-sized — thousands of rows even
for a giant KG — while the A-box is the 100 TB side. So the T-box is
closed with the doubling `transitive_closure` (log-diameter shuffles
over a tiny frame) and then BROADCAST into every rule join: each rule
application is one broadcast hash join + union, and the A-box is
never shuffled at all until the final `distinct()` dedup (one
hash-partitioned exchange over the materialized closure — unavoidable,
since the same triple can be derived along several rule paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.graph import transitive_closure

RDF_TYPE = "rdf:type"
RDFS_SUBCLASS = "rdfs:subClassOf"
RDFS_SUBPROP = "rdfs:subPropertyOf"
RDFS_DOMAIN = "rdfs:domain"
RDFS_RANGE = "rdfs:range"


def _tbox_closure(triples: DataFrame, pred: str) -> DataFrame:
    """Proper (length >= 1) transitive closure of one schema predicate,
    as (src, dst) pairs. Vocabulary-sized by assumption — the doubling
    closure runs log(diameter) shuffles over a frame this small."""
    edges = triples.filter(F.col("p") == pred).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    return transitive_closure(edges)


def rdfs_entailment(
    triples: DataFrame,
    type_pred: str = RDF_TYPE,
    subclass_pred: str = RDFS_SUBCLASS,
    subprop_pred: str = RDFS_SUBPROP,
    domain_pred: str = RDFS_DOMAIN,
    range_pred: str = RDFS_RANGE,
) -> DataFrame:
    """Materialize the ρdf entailment closure of a (s, p, o) frame.

    Returns the distinct union of asserted and entailed triples with
    the same (s, p, o) schema. Every rule join broadcasts the closed
    vocabulary-sized T-box; the instance side stays map-side.
    """
    sc_closure = F.broadcast(_tbox_closure(triples, subclass_pred))
    sp_closure = F.broadcast(_tbox_closure(triples, subprop_pred))
    domains = F.broadcast(
        triples.filter(F.col("p") == domain_pred)
        .select(F.col("s").alias("dprop"), F.col("o").alias("dclass"))
        .distinct()
    )
    ranges = F.broadcast(
        triples.filter(F.col("p") == range_pred)
        .select(F.col("s").alias("rprop"), F.col("o").alias("rclass"))
        .distinct()
    )

    # rdfs5: the subPropertyOf closure itself is entailed schema
    sp_triples = sp_closure.select(
        F.col("src").alias("s"), F.lit(subprop_pred).alias("p"), F.col("dst").alias("o")
    )
    # rdfs7: instance triples inherit every super-property
    inherited = (
        triples.join(sp_closure, triples["p"] == sp_closure["src"])
        .select("s", F.col("dst").alias("p"), "o")
    )
    # domain/range see asserted + inherited predicates (stratum 2)
    widened = triples.select("s", "p", "o").unionByName(inherited)
    # rdfs2: subject of any p with a declared domain gets typed
    dom_types = (
        widened.join(domains, widened["p"] == domains["dprop"])
        .select("s", F.lit(type_pred).alias("p"), F.col("dclass").alias("o"))
    )
    # rdfs3: object of any p with a declared range gets typed
    rng_types = (
        widened.join(ranges, widened["p"] == ranges["rprop"])
        .select(F.col("o").alias("s"), F.lit(type_pred).alias("p"),
                F.col("rclass").alias("o"))
    )
    # rdfs11: the subClassOf closure itself is entailed schema
    sc_triples = sc_closure.select(
        F.col("src").alias("s"), F.lit(subclass_pred).alias("p"), F.col("dst").alias("o")
    )
    # rdfs9: every type assertion (asserted, domain- or range-minted)
    # inherits up the closed class hierarchy (stratum 3)
    all_types = (
        widened.filter(F.col("p") == type_pred)
        .unionByName(dom_types)
        .unionByName(rng_types)
    )
    inherited_types = (
        all_types.join(sc_closure, all_types["o"] == sc_closure["src"])
        .select("s", "p", F.col("dst").alias("o"))
    )

    return (
        widened
        .unionByName(sp_triples)
        .unionByName(dom_types)
        .unionByName(rng_types)
        .unionByName(sc_triples)
        .unionByName(inherited_types)
        .distinct()
    )
