"""Build the --py-files artifact for cluster submission.

The north-rule deployment contract is `spark-submit --py-files
rdf_diff_store_spark.zip scripts/submit_kg.py ...` on a
multi-executor cluster: executor Python workers unpickle module-level
pandas UDFs by reference, so the package must be importable on every
executor — locally `session.py` prepends the repo root to PYTHONPATH,
on a cluster this zip does the same through Spark's file
distribution.

Usage: python scripts/package_pyfiles.py [out.zip]
Writes dist/rdf_diff_store_spark.zip by default and prints the path.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "rdf_diff_store_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "rdf_diff_store_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
