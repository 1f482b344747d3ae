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
