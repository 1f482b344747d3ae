"""Driver hash-fail regression (CORRECTNESS_r01: version_history,
sessionize): every epoch/interval expression must be timezone-proof on
NTZ parquet timestamps, because the driver harness builds its own
SparkSession and need not pin spark.sql.session.timeZone=UTC the way
session.py does.

Runs all epoch-bearing queries under a deliberately hostile session
timezone (Australia/Lord_Howe: +10:30/+11, DST-bearing, half-hour
offset) and checks exact oracle parity."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from rdf_diff_store_spark.schemas import TESTDATA_TABLES
from scripts.check_oracle import compare

HOSTILE_TZ = "Australia/Lord_Howe"

# every query whose output or internal arithmetic touches a timestamp
EPOCH_QUERIES = [
    "metadata",
    "version_history",
    "sessionize",
    "asof_join",
    "event_time_windows",
    # r03: date-accessor builtins (YEAR/MONTH/DAY/HOURS over lexical
    # xsd:dateTime — must stay on timestamp_ntz, never session-tz)
    "sparql_text_builtins_datetime",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture()
def hostile_tz_spark(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", EPOCH_QUERIES)
def test_epoch_queries_under_hostile_session_tz(hostile_tz_spark, sf_dir, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    problems = compare(name, qs[name](hostile_tz_spark, sf_dir), duck, oracles[name])
    assert not problems, problems
