#!/usr/bin/env python
"""Build the --py-files artifact for spark-submit (north_rule packaging).

Usage::

    python tools/package.py                 # -> dist/schema_infer_plugin_spark.zip

Then on a cluster::

    spark-submit \\
        --py-files dist/schema_infer_plugin_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.adaptive.skewJoin.enabled=true \\
        --conf spark.sql.execution.arrow.pyspark.enabled=true \\
        run_validation.py --input iceberg:prod.transcripts \\
        --out s3://bucket/runs/r1 --run-id r1 --n-buckets 4096

where run_validation.py is a 3-line shim calling
``schema_infer_plugin_spark.plans.runner.main()``.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "schema_infer_plugin_spark"


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    print(build())
