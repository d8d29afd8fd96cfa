#!/usr/bin/env python
"""Build the --py-files artifact for cluster submission (north_rule:
'run via spark-submit --py-files on a multi-executor cluster').

    python tools/package.py            # -> dist/jsonschema_spark.zip
    spark-submit --py-files dist/jsonschema_spark.zip \
        --master yarn --deploy-mode cluster \
        -m jsonschema_spark spec.json s3://bucket/images/ \
        --id-cols image_id --partition-by fmt --out s3://bucket/report/

The zip contains only the package source (no tests/tools), importable
from executors' PYTHONPATH.
"""
from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "jsonschema_spark.zip")
    pkg = os.path.join(REPO, "jsonschema_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
