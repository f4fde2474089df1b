"""Package the engine for `spark-submit --py-files` (north_rule).

Creates dist/abstracts_search_spark.zip containing the package so executors
can import it on a real multi-executor cluster.
"""

from __future__ import annotations

import os
import zipfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(_REPO, "dist", "abstracts_search_spark.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    pkg = os.path.join(_REPO, "abstracts_search_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _REPO))
    return out_path


if __name__ == "__main__":
    print(make_zip())
