"""rdf_diff_store_spark — a ground-up PySpark-native rebuild of the
observable contract of Informasjonsforvaltning/rdf-diff-store
(reference at /root/reference, Rust), re-expressed Spark-first.

The reference is a bitemporal-ish versioned triple store: graph
documents are upserted/deleted as git commits (one Turtle file per
graph, version key = commit unix seconds), snapshots are "repo at the
latest commit <= t", and SPARQL queries run against the snapshot
(reference: src/git.rs:151-179, src/graphs.rs:35-93, src/query.rs).

Here the same contract is a partitioned, append-only **changelog
table** of graph versions plus relational views:

  changelog(graph_id, ts, op add|delete, payload, content_hash)
    -> snapshot_at(t)   latest-wins per graph, tombstone-filtered
    -> diff(t1, t2)     bidirectional anti-joins (added / removed)
    -> triples views    SPARQL-algebra-equivalent DataFrame ops

plus the web-scale knowledge-graph construction pipeline
(extract -> mention -> link -> canonicalize -> quads) and the
training-data operators (dedup, similarity search, text analysis)
that make the engine useful over Common-Crawl-style page tables.

Everything is public PySpark DataFrame/SQL API; heavy per-row logic
runs as Arrow-vectorized pandas UDFs / mapInPandas, never per-row
Python.
"""

__version__ = "0.1.0"

from rdf_diff_store_spark.session import get_spark  # noqa: F401


def __getattr__(name):
    """Lazy re-exports of the primary operator surface — keeps package
    import session-free and Spark-free for tooling."""
    lazy = {
        "snapshot_at": ("rdf_diff_store_spark.operators.versioned", "snapshot_at"),
        "snapshot_triples": ("rdf_diff_store_spark.operators.versioned", "snapshot_triples"),
        "diff": ("rdf_diff_store_spark.operators.versioned", "diff"),
        "append_updates": ("rdf_diff_store_spark.operators.versioned", "append_updates"),
        "metadata": ("rdf_diff_store_spark.operators.versioned", "metadata"),
        "sparql_query": ("rdf_diff_store_spark.plans.sparql_text", "sparql_query"),
        "sparql_json": ("rdf_diff_store_spark.plans.sparql_text", "sparql_json"),
        "apply_update": ("rdf_diff_store_spark.plans.sparql_update", "apply_update"),
        "execute": ("rdf_diff_store_spark.plans.sparql_update", "execute"),
        "build_kg": ("rdf_diff_store_spark.pipeline.kg", "build_kg"),
        "entity_link_scores": ("rdf_diff_store_spark.pipeline.linking", "entity_link_scores"),
        "entity_link_blocked": ("rdf_diff_store_spark.pipeline.linking", "entity_link_blocked"),
        "candidate_dictionary": ("rdf_diff_store_spark.pipeline.linking", "candidate_dictionary"),
    }
    if name in lazy:
        import importlib

        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'rdf_diff_store_spark' has no attribute {name!r}")
