"""The north-rule deployment contract, end to end: package the repo
as a --py-files zip and run the KG pipeline through a REAL
spark-submit process from a foreign cwd (no repo on sys.path — the
package must come from the zip), then re-run against the same
work_dir and prove stage-checkpoint resume.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _submit(zip_path: str, tmp: str, out: str) -> str:
    cmd = [
        "spark-submit",
        "--master",
        "local[4]",
        "--conf",
        "spark.sql.shuffle.partitions=8",
        "--driver-memory",
        "4g",
        "--py-files",
        zip_path,
        os.path.join(REPO, "scripts", "submit_kg.py"),
        "--n-urls",
        "150",
        "--n-crawls",
        "3",
        "--work-dir",
        os.path.join(tmp, "work"),
        "--out",
        out,
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only source
    res = subprocess.run(
        cmd, cwd=tmp, env=env, capture_output=True, text=True, timeout=480
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "KG_SUBMIT_OK" in res.stdout
    return res.stdout


@pytest.fixture(scope="module")
def submit_env(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("submit"))
    zip_path = os.path.join(tmp, "rdf_diff_store_spark.zip")
    build = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package_pyfiles.py"), zip_path],
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert build.returncode == 0, build.stderr
    return tmp, zip_path


def _rows(path: str):
    con = duckdb.connect()
    return con.execute(
        "SELECT graph_id, op, content_hash FROM "
        f"parquet_scan('{path}/**/*.parquet', hive_partitioning=1) "
        "ORDER BY 1, 2, 3"
    ).fetchall()


class TestSparkSubmit:
    def test_pipeline_runs_and_resumes(self, submit_env):
        tmp, zip_path = submit_env
        out1 = os.path.join(tmp, "changelog1")
        _submit(zip_path, tmp, out1)

        # metrics parquet records every stage fresh on run 1
        mdir = os.path.join(tmp, "work", "_metrics")
        con = duckdb.connect()
        m1 = dict(
            con.execute(
                f"SELECT stage, bool_or(resumed) FROM parquet_scan('{mdir}/*.parquet') GROUP BY stage"
            ).fetchall()
        )
        assert m1 and not any(m1.values())

        # second run, same work_dir: stages resume from checkpoints
        # and the emitted changelog is identical
        out2 = os.path.join(tmp, "changelog2")
        _submit(zip_path, tmp, out2)
        m2 = dict(
            con.execute(
                f"SELECT stage, bool_or(resumed) FROM parquet_scan('{mdir}/*.parquet') GROUP BY stage"
            ).fetchall()
        )
        assert all(m2.values()), f"stages not resumed: {m2}"
        assert _rows(out1) == _rows(out2)

    def test_zip_is_self_contained(self, submit_env):
        tmp, zip_path = submit_env
        # every package module rides the zip (a missing submodule
        # fails only at unpickle time on an executor — check early)
        import zipfile

        names = set(zipfile.ZipFile(zip_path).namelist())
        for src in glob.glob(
            os.path.join(REPO, "rdf_diff_store_spark", "**", "*.py"),
            recursive=True,
        ):
            assert os.path.relpath(src, REPO) in names


# no teardown: pytest's tmp_path_factory retention (last 3 runs)
# bounds the dirs, and a glob over /tmp/pytest-of-* would rm-rf a
# CONCURRENT chunk's live fixture dirs (the suite runs in chunks)
