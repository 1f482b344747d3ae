"""Git-history replay: a synthetic rdf-diff-store repo (one commit per
graph change, `update:`/`delete:` messages, base64 filenames) replayed
into a changelog must reproduce the reference integration-test
timeline — 0/1/2 graphs at pre/mid/post (tests/integration_test.rs:74-90)."""

from __future__ import annotations

import os
import subprocess

import pytest

from rdf_diff_store_spark.operators.versioned import snapshot_at
from rdf_diff_store_spark.sources.git_history import (
    GitReplayError,
    read_git_history,
    replay_into_changelog,
)
from rdf_diff_store_spark.sources.turtle_files import encode_graph_filename

GRAPH_A_ID = "<#/(%¤=:"  # the reference's pathological id (integration_test.rs:22)
GRAPH_A = '@prefix si: <https://www.w3schools.com/rdf/> .\n<https://www.w3schools.com> si:author "Jan Egil Refsnes" .\n'
GRAPH_B_ID = "graph-b"
GRAPH_B = '@prefix si: <https://www.w3schools.com/rdf/> .\n<https://example.com/p> si:title "Example" .\n'

T1 = "2024-01-02T00:00:00"
T3 = "2024-01-04T00:00:00"
PRE, MID, POST = "2024-01-01 00:00:00", "2024-01-03 00:00:00", "2024-01-05 00:00:00"


def _git(repo, *args, date=None):
    env = dict(os.environ)
    if date:
        env["GIT_COMMITTER_DATE"] = date
        env["GIT_AUTHOR_DATE"] = date
    subprocess.run(["git", "-C", repo, *args], check=True, capture_output=True, env=env)


@pytest.fixture(scope="module")
def ref_repo(tmp_path_factory):
    """A git repo laid out exactly the way rdf-diff-writer commits
    (src/graphs.rs:35-93, src/git.rs:192-222)."""
    repo = str(tmp_path_factory.mktemp("refrepo"))
    _git(repo, "init", "-q", "-b", "main")
    _git(repo, "config", "user.email", "w@example.org")
    _git(repo, "config", "user.name", "writer")
    for gid, doc, ts in [(GRAPH_A_ID, GRAPH_A, T1), (GRAPH_B_ID, GRAPH_B, T3)]:
        fname = encode_graph_filename(gid)
        with open(os.path.join(repo, fname), "w", encoding="utf-8") as fh:
            fh.write(doc)
        _git(repo, "add", fname)
        _git(repo, "commit", "-q", "-m", f"update: {gid}", date=ts)
    return repo


def test_replay_reproduces_reference_timeline(spark, ref_repo):
    log = replay_into_changelog(spark, ref_repo)
    assert snapshot_at(log, PRE).count() == 0
    assert snapshot_at(log, MID).count() == 1
    assert snapshot_at(log, POST).count() == 2
    assert [r.graph_id for r in snapshot_at(log, MID).collect()] == [GRAPH_A_ID]


def test_replay_payload_roundtrip(spark, ref_repo):
    ups = read_git_history(spark, ref_repo)
    rows = {r.graph_id: r for r in ups.collect()}
    assert rows[GRAPH_A_ID].payload == GRAPH_A
    assert rows[GRAPH_A_ID].op == "add"
    # commit times became the version axis (unix seconds, NTZ)
    assert rows[GRAPH_A_ID].ts.isoformat() == T1
    assert rows[GRAPH_B_ID].ts.isoformat() == T3


def test_replay_delete_commit(spark, ref_repo, tmp_path):
    import shutil

    repo = str(tmp_path / "with_delete")
    shutil.copytree(ref_repo, repo)
    fname = encode_graph_filename(GRAPH_B_ID)
    _git(repo, "rm", "-q", fname)
    _git(repo, "commit", "-q", "-m", f"delete: {GRAPH_B_ID}", date="2024-01-06T00:00:00")
    log = replay_into_changelog(spark, repo)
    assert snapshot_at(log, POST).count() == 2
    assert [r.graph_id for r in snapshot_at(log, "2024-01-07 00:00:00").collect()] == [
        GRAPH_A_ID
    ]


def test_foreign_commit_raises_unless_lenient(spark, ref_repo, tmp_path):
    import shutil

    repo = str(tmp_path / "foreign")
    shutil.copytree(ref_repo, repo)
    with open(os.path.join(repo, "README.md"), "w") as fh:
        fh.write("hand edit\n")
    _git(repo, "add", "README.md")
    _git(repo, "commit", "-q", "-m", "docs tweak", date="2024-01-06T00:00:00")
    with pytest.raises(GitReplayError):
        read_git_history(spark, repo)
    lenient = read_git_history(spark, repo, strict=False)
    assert lenient.count() == 2  # foreign commit skipped
