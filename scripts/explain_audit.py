"""Automated physical-plan audit: asserts the plan properties the
engine's scale story depends on (pushdown, pruning, broadcast,
partition pruning on a days(ts)-partitioned changelog).

Usage: python scripts/explain_audit.py [sf_dir]
Exit 0 = all plan assertions hold.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

    import __spark_entry__ as e
    from pyspark.sql import functions as F

    from rdf_diff_store_spark.session import get_spark
    from rdf_diff_store_spark.sources.relational import changelog_from_events

    spark = get_spark("plan-audit")
    qs = e.queries()
    checks: list[tuple[str, bool, str]] = []

    # 1. as-of filter pushdown reaches the parquet scan
    p = plan_of(qs["snapshot_at"](spark, sf_dir))
    checks.append(("snapshot_at ts<=t pushed to scan", "LessThanOrEqual(ts" in p, "PushedFilters"))
    checks.append(("snapshot_at column pruning", "props" not in p, "ReadSchema excludes props"))

    # 2. broadcast joins on dimension sides
    p3 = plan_of(qs["tpch_q3"](spark, sf_dir))
    checks.append(("tpch_q3 broadcasts dims", p3.count("BroadcastHashJoin") >= 2, "join strategy"))

    # 3. projection pruning on documents
    pd_ = plan_of(qs["doc_token_count"](spark, sf_dir))
    checks.append(
        ("doc_token_count reads 2 columns", "struct<doc_id:bigint,text:string>" in pd_, "ReadSchema")
    )

    # 4. partition pruning on a days(ts)-partitioned changelog:
    # snapshot_at adds the derived day<=date(t) predicate, so the scan
    # must touch only the qualifying partitions
    from rdf_diff_store_spark.operators.versioned import snapshot_at, with_day_partition

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "changelog_by_day")
        with_day_partition(changelog_from_events(spark, sf_dir)).write.partitionBy(
            "day"
        ).mode("overwrite").parquet(path)
        from rdf_diff_store_spark.operators.versioned import _as_of_filter

        part = spark.read.parquet(path)
        full = part.select(F.input_file_name().alias("f")).distinct().count()
        read = (
            _as_of_filter(part, F.lit("2024-01-05 00:00:00").cast("timestamp"))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        checks.append(
            (
                "days(ts) partition pruning skips files",
                0 < read < full / 2,
                f"{read}/{full} files actually read for a day-5 as-of filter",
            )
        )
        # and snapshot_at over the partitioned table stays correct
        n = snapshot_at(part, "2024-01-05 00:00:00").count()
        checks.append(("partitioned snapshot_at answers", n > 0, f"{n} graphs"))

    # 5. no single-partition (partitionless) Window in ANY driver query
    # plan: Window without PARTITION BY moves every row to one
    # partition — the scale-killer VERDICT r01 flagged in the old
    # OFFSET implementation. A partitioned Window prints
    # `Window [fns], [part], [order]` (two "], [" separators); a
    # partitionless one prints `Window [fns], [order]` (one).
    import re as _re

    offenders: list[str] = []
    skip = {"kg_pipeline"}  # executes the full pipeline to build its plan
    for name, fn in qs.items():
        if name in skip:
            continue
        try:
            plan_str = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001
            offenders.append(f"{name}: ERROR {type(ex).__name__}")
            continue
        for line in plan_str.splitlines():
            m = _re.search(r"\bWindow \[.*$", line)
            if m and m.group(0).count("], [") == 1:
                offenders.append(name)
                break
    checks.append(
        (
            "no partitionless Window in any queries() plan",
            not offenders,
            f"offenders={offenders[:6]}" if offenders else "all plans partition their windows",
        )
    )

    # 6b. the session carries the scale-critical runtime configuration
    for conf, want in [
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ]:
        got = spark.conf.get(conf, "unset")
        checks.append((f"session conf {conf}={want}", got == want, f"got {got}"))

    # 6. anti-join diff reuses the dual-state exchange at runtime
    # (static explain duplicates the subtree; AQE dedups it)
    diff_df = qs["diff_versions"](spark, sf_dir)
    diff_df.collect()
    executed = diff_df._jdf.queryExecution().executedPlan().toString()
    checks.append(
        ("diff reuses dual-state exchange", "ReusedExchange" in executed, "executed plan")
    )

    failed = [c for c in checks if not c[1]]
    for name, ok, detail in checks:
        print(f"{'PASS' if ok else 'FAIL'}  {name} ({detail})")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
