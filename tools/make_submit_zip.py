"""Package ``pandarus_spark`` for ``spark-submit --py-files`` (the
north_rule's deployment shape: the job ships as one zip next to a thin
driver script, no cluster-side install).

Usage: python tools/make_submit_zip.py [out_zip]   (default
``dist/pandarus_spark.zip``).  The zip contains the package only —
pure-python + numpy/pandas/pyarrow imports, all of which a Spark
cluster's python env already carries.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str | None = None) -> str:
    out_zip = out_zip or os.path.join(REPO, "dist", "pandarus_spark.zip")
    out_dir = os.path.dirname(out_zip)
    if out_dir:  # bare filename → cwd, nothing to create
        os.makedirs(out_dir, exist_ok=True)
    pkg = os.path.join(REPO, "pandarus_spark")
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
