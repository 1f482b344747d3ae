"""spark-submit driver for the KG-construction pipeline.

The north rule's deployment shape — run on a multi-executor cluster
via ``spark-submit --py-files`` — end to end:

    python scripts/package_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/rdf_diff_store_spark.zip \
        scripts/submit_kg.py --pages-parquet s3://.../pages \
        --work-dir /shared/kg_run --out /shared/kg_changelog

No ``sys.path`` hacks and no repo checkout needed on the cluster: the
package rides the zip, the session comes from ``getOrCreate()`` so
spark-submit's ``--master`` / ``--conf`` win (this script sets only
semantic defaults), and every stage checkpoints into ``--work-dir``
so a killed run resumes from completed stages (per-partition lineage
+ counters in metrics.jsonl — pipeline/kg.py, metrics.py).

Without ``--pages-parquet`` a deterministic synthetic Common-Crawl-
style pages table (url, warc_ts, html, text, lang) is generated —
the input_hint shape — sized by ``--n-urls``/``--n-crawls``.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages-parquet", default=None)
    ap.add_argument("--n-urls", type=int, default=1000)
    ap.add_argument("--n-crawls", type=int, default=4)
    ap.add_argument("--work-dir", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--snapshot-ts", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("rdf-diff-store-spark-kg")
        # semantic defaults only — cluster sizing comes from
        # spark-submit; AQE handles hub-entity skew at any size
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from rdf_diff_store_spark.pipeline.kg import build_kg
    from rdf_diff_store_spark.sources.pages import generate_pages

    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet)
    else:
        pages = generate_pages(
            spark, n_urls=args.n_urls, n_crawls=args.n_crawls
        )

    changelog, rec = build_kg(spark, pages, args.work_dir)
    changelog.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()

    if args.snapshot_ts:
        from rdf_diff_store_spark.operators.versioned import snapshot_at

        snap_n = snapshot_at(
            spark.read.parquet(args.out), args.snapshot_ts
        ).count()
        print(f"KG_SUBMIT_SNAPSHOT rows={snap_n} ts={args.snapshot_ts}")

    # single greppable success line for orchestration
    print(f"KG_SUBMIT_OK changelog_rows={n} out={args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
