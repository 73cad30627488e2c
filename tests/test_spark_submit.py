"""North-rule launch mode: spark-submit --py-files kgspark.zip runs the
extraction job with NO repo on sys.path — the package must be fully
self-contained in the shipped zip."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def test_spark_submit_py_files(tmp_path):
    from scripts.package_pyfiles import build

    zip_path = build(str(tmp_path / "kgspark.zip"))
    out_dir = str(tmp_path / "out")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)  # the zip must be the only source of kgspark
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_extract.py"),
         "/root/testdata/sf0.001", out_dir],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    with open(os.path.join(out_dir, "result.json")) as f:
        n = json.load(f)["triples"]
    assert n > 0
    assert f"RESULT triples={n}" in proc.stdout
