"""Git-history replay source — migrate an existing rdf-diff-store git
repository (the reference's storage: one commit per graph change) into
a changelog DataFrame.

Reference contract being replayed:

* history is walked oldest → newest by commit time
  (src/git.rs:134-148, Sort::TIME | Sort::REVERSE at src/git.rs:136);
* the version key is the commit time in unix seconds
  (src/git.rs:156, git2::Time.seconds());
* each commit touches exactly one graph file and carries the message
  `update: {id}` or `delete: {id}` (src/graphs.rs:68-73 and :88);
* the file name encodes the graph id (base64 with '/'→'_', '+'→'-',
  suffix .ttl — src/graphs.rs:42-45, shared codec in
  sources/turtle_files.py).

The walk itself is driver-side and sequential — a git repo IS a
sequential history, and the reference walks it the same way; what it
produces is the distributed artifact (a GRAPH_UPDATES frame to feed
operators.versioned.append_updates). For a repository too large to
walk in one process you shard the `git log` range by commit windows
and union the frames.
"""

from __future__ import annotations

import datetime as dt
import subprocess

from pyspark.sql import DataFrame, SparkSession

from rdf_diff_store_spark.schemas import GRAPH_UPDATES
from rdf_diff_store_spark.sources.turtle_files import encode_graph_filename


class GitReplayError(ValueError):
    pass


def _git(repo_dir: str, *args: str) -> str:
    out = subprocess.run(
        ["git", "-C", repo_dir, *args],
        check=True,
        capture_output=True,
        text=True,
    )
    return out.stdout


def read_git_history(
    spark: SparkSession,
    repo_dir: str,
    branch: str = "main",
    strict: bool = True,
) -> DataFrame:
    """Walk `repo_dir`'s commit history oldest→newest and return graph
    updates (graph_id, ts, op, payload, format) — feed the result to
    append_updates / StreamingChangelogWriter to reconstruct the
    changelog an rdf-diff-store deployment implicitly stores in git.

    ts = commit time (unix seconds, as the reference's version key);
    op/graph_id come from the `update:`/`delete:` commit message;
    payload = the committed file content for updates, NULL for deletes.
    Unknown commit messages raise (strict=True) or are skipped —
    silently reinterpreting foreign commits would corrupt the version
    axis.
    """
    # %H hash, %ct committer unix seconds, %s subject — oldest first
    log = _git(
        repo_dir, "log", "--reverse", "--format=%H%x00%ct%x00%s", branch
    ).strip()
    rows: list[tuple] = []
    if log:
        for line in log.split("\n"):
            commit, ct, subject = line.split("\x00", 2)
            ts = dt.datetime.fromtimestamp(int(ct), dt.timezone.utc).replace(
                tzinfo=None
            )
            if subject.startswith("update: "):
                gid = subject[len("update: ") :]
                fname = encode_graph_filename(gid)
                payload = _git(repo_dir, "show", f"{commit}:{fname}")
                rows.append((gid, ts, "add", payload, "text/turtle"))
            elif subject.startswith("delete: "):
                gid = subject[len("delete: ") :]
                rows.append((gid, ts, "delete", None, "text/turtle"))
            elif strict:
                raise GitReplayError(
                    f"commit {commit[:12]} has a non-rdf-diff-store message "
                    f"{subject!r} (expected 'update: ...' or 'delete: ...'); "
                    "pass strict=False to skip foreign commits"
                )
    return spark.createDataFrame(rows, GRAPH_UPDATES)


def replay_into_changelog(spark: SparkSession, repo_dir: str, branch: str = "main") -> DataFrame:
    """read_git_history → canonical idempotent changelog (one call)."""
    from rdf_diff_store_spark.operators.versioned import append_updates
    from rdf_diff_store_spark.schemas import CHANGELOG

    updates = read_git_history(spark, repo_dir, branch)
    return append_updates(spark.createDataFrame([], CHANGELOG), updates)
