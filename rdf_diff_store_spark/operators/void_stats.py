"""VoID dataset statistics (W3C Interest Group Note "Describing
Linked Datasets with the VoID Vocabulary") — the standard statistical
self-description a published RDF dataset carries: triple/entity/class/
property counts and the per-property / per-class partitions
(void:triples, void:classes, void:properties, void:distinctSubjects,
void:distinctObjects, void:propertyPartition, void:classPartition).

The reference serves datasets (its store IS a dataset of named
graphs, /root/reference/src/graphs.rs:30-61); a production deployment
publishes VoID alongside — and at web scale these statistics are also
the query-planner's cardinality source (predicate selectivity feeds
join ordering in every SPARQL optimizer).

Scale shape: the input is treated as a triple SET (graphs are sets —
the frames extraction/entailment produce can carry duplicates, so the
operators dedupe first, one shuffle). Multi-column distinct counts
compile to Spark's Expand + partial aggregation — one pass over the
data with map-side combine, k× row expansion but never a per-count
rescan. Partitions group by predicate / class: hot predicates
(rdf:type at ~20% of any web corpus) are absorbed by partial
aggregation and AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_diff_store_spark.operators.structured import RDF_TYPE


def _as_set(triples: DataFrame) -> DataFrame:
    return triples.select("subj", "pred", "obj").distinct()


def void_summary(triples: DataFrame) -> DataFrame:
    """ONE row of dataset-level VoID counts: n_triples,
    n_distinct_subjects, n_properties, n_distinct_objects, n_classes
    (distinct rdf:type objects), n_entities (distinct typed subjects).
    All BIGINT, engine-portable."""
    t = _as_set(triples)
    is_type = F.col("pred") == RDF_TYPE
    return t.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_distinct_subjects"),
        F.countDistinct("pred").alias("n_properties"),
        F.countDistinct("obj").alias("n_distinct_objects"),
        F.countDistinct(F.when(is_type, F.col("obj"))).alias("n_classes"),
        F.countDistinct(F.when(is_type, F.col("subj"))).alias("n_entities"),
    )


def property_partitions(triples: DataFrame) -> DataFrame:
    """void:propertyPartition — per predicate: n_triples,
    n_distinct_subjects, n_distinct_objects. The cardinality table a
    SPARQL planner estimates BGP selectivity from."""
    return (
        _as_set(triples)
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("subj").alias("n_distinct_subjects"),
            F.countDistinct("obj").alias("n_distinct_objects"),
        )
    )


def class_partitions(triples: DataFrame) -> DataFrame:
    """void:classPartition — per class (rdf:type object): n_entities
    (distinct instances)."""
    return (
        _as_set(triples)
        .filter(F.col("pred") == RDF_TYPE)
        .groupBy(F.col("obj").alias("class_iri"))
        .agg(F.countDistinct("subj").alias("n_entities"))
    )
