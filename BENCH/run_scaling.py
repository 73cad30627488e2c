#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule, sandbox proxy):
run the SAME CPU-bound extraction workload at local[N] and local[4N] on the
SAME input and report throughput at both + efficiency = speedup / 4.

No real multi-executor cluster exists in this sandbox (driver instruction),
so parallelism level stands in for executor count. The workload is the
bench.py throughput leg (extraction + edge generation over the replicated
part-derived SVO corpus) — pure map-side pandas-UDF + explode work, i.e. the
stage that dominates a real crawl-scale run.

Usage: python BENCH/run_scaling.py [sf_dir] [repl] [n_small]
Writes BENCH/scaling.json and updates the table in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from kgspark.session import get_spark
import bench
cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; repl = int(sys.argv[3])
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(32, 2 * cpus))
spark.sparkContext.setLogLevel("ERROR")
# warmup pass excludes JIT/codegen from the measurement
bench.throughput_leg(spark, sf_dir, max(1, repl // 10))
sec, n_docs = bench.throughput_leg(spark, sf_dir, repl)
print("RESULT " + json.dumps({{"cpus": cpus, "sec": sec, "docs": n_docs,
                               "docs_per_sec": n_docs / sec}}))
spark.stop()
"""


def run_one(cpus: int, sf_dir: str, repl: int) -> dict:
    code = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), sf_dir, str(repl)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (rc={out.returncode}):\n{out.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_big = 4 * n_small

    small = run_one(n_small, sf_dir, repl)
    big = run_one(n_big, sf_dir, repl)
    speedup = small["sec"] / big["sec"]
    eff = speedup / (n_big / n_small)
    result = {
        "workload": "extraction+edge-generation over replicated SVO corpus",
        "sf_dir": sf_dir,
        "docs": small["docs"],
        "n_small": n_small,
        "n_big": n_big,
        "small": small,
        "big": big,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    out_path = os.path.join(REPO, "BENCH", "scaling.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
