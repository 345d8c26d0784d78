"""Build the --py-files artifact for cluster submission (north_rule: "run
via spark-submit --py-files on a multi-executor cluster").

Produces dist/towhee_spark.zip containing the package (no tests, no
bytecode). Usage:

    python tools/package_pyfiles.py
    spark-submit --py-files dist/towhee_spark.zip \
        --conf spark.sql.shuffle.partitions=<4x cores> \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.adaptive.skewJoin.enabled=true \
        your_job.py

The engine has no dependencies beyond pyspark/pyarrow/pandas/numpy (already
on executors), so one zip is the whole deployment.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "towhee_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "towhee_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
