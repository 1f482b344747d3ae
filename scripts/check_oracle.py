"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark AND its DuckDB oracle SQL, compare
row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from rdf_diff_store_spark.schemas import TESTDATA_TABLES  # noqa: E402


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return round(v, 6)
        if isinstance(v, (int, bool, str)):
            return v
        try:  # numpy scalars
            return norm(v.item())
        except AttributeError:
            return str(v)

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


# DuckDB result types that fetchall() converts losslessly to Python
# ints but pandas/Arrow (the driver's compare path) renders as float64
# or decimal128 — guaranteed value-hash mismatch vs Spark's LONG even
# though this script's fetchall-based compare would pass. sum(<int>)
# is the classic producer (HUGEINT); cast to BIGINT in the oracle SQL.
_DRIVER_HOSTILE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UBIGINT")


def _family(type_name: str) -> str:
    """Classify an engine type name into the pandas-dtype family the
    driver's hash sees. int-valued DOUBLE vs LONG passes a value
    compare (9108 == 9108.0) but hash-mismatches on the driver —
    the sparql_numeric_fns r03 failure class."""
    t = type_name.upper()
    if any(k in t for k in ("DOUBLE", "FLOAT", "REAL", "DECIMAL")):
        return "float"
    if "BOOL" in t:
        return "bool"
    if any(k in t for k in ("BIGINT", "HUGEINT", "INT", "LONG", "SHORT", "BYTE")):
        return "int"
    return "other"


def compare(name, spark_df, con, sql):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    o = con.sql(sql)
    o_rows = [tuple(r) for r in o.fetchall()]
    o_cols = list(o.columns)
    problems = []
    hostile = [
        (c, str(t))
        for c, t in zip(o_cols, o.types)
        if any(str(t).startswith(h) for h in _DRIVER_HOSTILE_TYPES)
    ]
    if hostile:
        problems.append(
            f"oracle col types {hostile} will hash-mismatch on the driver "
            "(pandas renders HUGEINT/DECIMAL as float/object) — CAST to BIGINT/DOUBLE"
        )
    s_fam = {c: _family(t) for c, t in spark_df.dtypes}
    o_fam = {c: _family(str(t)) for c, t in zip(o_cols, o.types)}
    for c in sorted(set(s_fam) & set(o_fam)):
        sf, of = s_fam[c], o_fam[c]
        if sf != of and sf != "other" and of != "other":
            problems.append(
                f"dtype family mismatch on '{c}': spark={sf} oracle={of} — "
                "identical values still hash-mismatch on the driver; CAST one side"
            )
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        problems.append(f"rowcount spark={len(s_rows)} oracle={len(o_rows)}")
    if not problems:
        sn, on = normalize(s_rows, s_cols), normalize(o_rows, o_cols)
        if sn != on:
            diffs = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            problems.append(f"values differ, first diffs: {diffs}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")

    import __spark_entry__ as entrymod
    from rdf_diff_store_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        if name not in oracles:
            print(f"{name}: NO-ORACLE (rows-only)", flush=True)
            try:
                n = fn(spark, sf_dir).count()
                print(f"  rows={n}")
            except Exception as e:  # noqa: BLE001
                failed.append(name)
                print(f"  SPARK ERROR: {e}")
            continue
        try:
            problems = compare(name, fn(spark, sf_dir), con, oracles[name])
        except Exception as e:  # noqa: BLE001
            problems = [f"exception: {type(e).__name__}: {str(e)[:500]}"]
        if problems:
            failed.append(name)
            print(f"{name}: FAIL", flush=True)
            for p in problems:
                print(f"  {p}")
        else:
            print(f"{name}: PASS", flush=True)
    # tally counts CHECKED queries only — with a name filter the old
    # len(qs) denominator printed "158/158 pass" after checking three
    print(f"\n{n_checked - len(failed)}/{n_checked} pass")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
