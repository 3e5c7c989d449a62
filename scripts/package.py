#!/usr/bin/env python
"""Build the --py-files zip for spark-submit deployments."""

import os
import sys
import zipfile


def build(dest: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "rdf_converter_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                # .json: the vendored mappings_data vocabulary files
                # (read zip-safely via importlib.resources)
                if f.endswith((".py", ".json")):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    return dest


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "rdf_converter_spark.zip"
    print(build(out))
