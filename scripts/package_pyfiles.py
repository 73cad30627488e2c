#!/usr/bin/env python
"""Build the --py-files artifact for spark-submit deployment.

Produces a single zip of the `kgspark` package (sources only, no tests) that
ships to every executor via `spark-submit --py-files dist/kgspark.zip` — the
north-rule launch mode. Usage:

    python scripts/package_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str) -> str:
    os.makedirs(os.path.dirname(out_zip) or ".", exist_ok=True)
    pkg = os.path.join(REPO, "kgspark")
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                z.write(full, rel)
    return out_zip


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "kgspark.zip")
    print(build(out))
