"""Driver-contract smoke + oracle parity for a representative subset
of queries (full sweep: scripts/check_oracle.py, run at sf0.001 and
sf0.01 before every commit)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from rdf_diff_store_spark.schemas import TESTDATA_TABLES
from scripts.check_oracle import compare

SUBSET = [
    "snapshot_at",
    "diff_triples",
    "compact_versions",
    "sparql_path_plus",
    "sparql_optional",
    "tpch_q1",
    "ann_cosine_topk",
    "doc_exact_dedup",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_every_query_has_oracle_or_is_flagged():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity_subset(spark, sf_dir, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    problems = compare(name, qs[name](spark, sf_dir), duck, oracles[name])
    assert not problems, problems
