"""Structured-extraction family at 100×-the-test-scale: synthesize a
multi-million-row page table IN Spark (no driver data — format_string
over spark.range), then time the three format extractors, the
WebTables chain, and the align+skolemize JVM tail over it — evidence
that the map-only / ONE-Arrow-hop plan shapes hold far beyond the
sf0.01 driver tables and that per-page Python parse cost is the only
scaling term (embarrassingly parallel at 10^12 pages).

Usage: python scripts/bench_extract_scale.py [n_pages]
Default: 2,000,000 pages (~1.2 GB of HTML) on local[$SPARK_GRAFT_CPUS].
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
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

    from rdf_diff_store_spark.operators.structured import (
        extract_jsonld,
        extract_microdata,
        extract_rdfa,
        skolemize,
    )
    from rdf_diff_store_spark.operators.tables import (
        extract_table_cells,
        table_cells_to_triples,
    )
    from rdf_diff_store_spark.operators.vocab import align_predicates, og_mapping
    from rdf_diff_store_spark.session import get_spark

    spark = get_spark("bench-extract-scale")
    cpus = spark.sparkContext.defaultParallelism

    d = F.col("id").cast("string")
    block = F.format_string(
        '{"@context":"https://schema.org",'
        '"@id":"https://p.example.org/%s#it","@type":"Article",'
        '"name":"doc %s","wordCount":%s,'
        '"author":{"@type":"Person","name":"author %s"}}',
        d,
        d,
        (F.col("id") % 9000).cast("string"),
        (F.col("id") % 7).cast("string"),
    )
    table = F.format_string(
        "<table><tr><th>Name</th><th>Score</th></tr>"
        "<tr><td>row %s</td><td>%s</td></tr></table>",
        d,
        (F.col("id") % 97).cast("string"),
    )
    micro = F.format_string(
        '<div itemscope itemtype="https://schema.org/Product">'
        '<span itemprop="name">item %s</span>'
        '<meta itemprop="sku" content="SKU-%s"></div>',
        d,
        (F.col("id") % 100).cast("string"),
    )
    t0 = time.perf_counter()
    pages = (
        spark.range(n_pages)
        .select(
            F.concat(F.lit("https://p.example.org/"), d).alias("url"),
            F.concat(
                F.lit("<html><head>"),
                F.format_string(
                    '<meta property="og:title" content="doc %s">'
                    '<meta property="og:locale" content="en">',
                    d,
                ),
                F.lit('<script type="application/ld+json">'),
                block,
                F.lit("</script></head><body>"),
                micro,
                table,
                F.lit("<p>filler body text for realistic page weight, "
                      "padding padding padding</p></body></html>"),
            ).alias("html"),
        )
        .repartition(cpus * 4)
        .localCheckpoint()
    )
    n = pages.count()
    gen_sec = round(time.perf_counter() - t0, 2)

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn):
        best = None
        for _ in range(2):  # min of 2: first rep pays JIT/Arrow spin-up
            t = time.perf_counter()
            counts[name] = fn()
            r = time.perf_counter() - t
            best = r if best is None else min(best, r)
        timings[name] = round(best, 2)

    timed("jsonld", lambda: extract_jsonld(pages).count())
    timed("microdata", lambda: extract_microdata(pages).count())
    timed("rdfa", lambda: extract_rdfa(pages).count())
    timed(
        "tables",
        lambda: table_cells_to_triples(extract_table_cells(pages)).count(),
    )
    # the JVM tail: align og:→schema + skolemize on top of one extractor
    timed(
        "jsonld_align_skolem",
        lambda: skolemize(
            align_predicates(extract_jsonld(pages), og_mapping(spark))
        ).count(),
    )

    total_triples = sum(counts[k] for k in ("jsonld", "microdata", "rdfa", "tables"))
    total_sec = sum(timings[k] for k in ("jsonld", "microdata", "rdfa", "tables"))
    print(
        json.dumps(
            {
                "metric": "extract_scale",
                "pages": n,
                "cpus": cpus,
                "generate_sec": gen_sec,
                "timings_sec": timings,
                "triples": counts,
                "pages_per_sec_per_extractor": round(
                    n * 4 / total_sec, 1
                ),
                "triples_per_sec": round(total_triples / total_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
