#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule, sandbox proxy).

No real multi-executor cluster exists in this sandbox, so cluster size N vs 4N
is proxied by CPU-PINNED parallelism (taskset 8 CPUs vs 32 CPUs — a local[N]
job spawns N JVM threads PLUS N Python workers, so without pinning a local[8]
run consumes up to 16 CPUs and the comparison is meaningless).

The workload is the pipeline's dominant stage at crawl scale: html -> text
extraction (the per-url byte-identity invariant) + OpenIE concept extraction +
edge generation, over a replicated part-derived SVO corpus wrapped in HTML
boilerplate. All map-side; the only serial components are Spark job scheduling
and a ~3 MB broadcast.

Because one shared-memory box cannot actually quadruple its memory bandwidth
and LLC the way 4x executors do, the report includes a HARDWARE CALIBRATION:
the same 8-vs-32 pinned comparison for (a) a cache-resident integer loop and
(b) a string-churn loop (regex split over 12 KB docs) in plain multiprocessing
— no Spark, no JVM. (b) is the achievable ceiling for this workload class on
this machine; `normalized_efficiency` = pipeline efficiency / ceiling. During
the measured legs /proc/stat shows ~100% user CPU plus hypervisor steal
bursts, i.e. the pipeline saturates whatever the box gives it.

Usage: python BENCH/run_scaling.py [sf_dir] [repl] [n_small]
Writes BENCH/scaling.json; BENCH/BASELINE.md holds the narrative table.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from kgspark.session import get_spark
import __spark_entry__ as E
from kgspark.openie import extract_concepts, CONCEPTS_TYPE
from kgspark.html import extract_text
from kgspark.edges import concept_edges

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; repl = int(sys.argv[3])
HEAVY = 8  # ~12 KB docs — realistic web-page text size
import os as _os
conf = {{"spark.driver.memory": "24g"}}
conf.update(json.loads(_os.environ.get("KGSPARK_SCALING_CONF", "{{}}")))
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  shuffle_partitions=2 * cpus,
                  extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
pages = E._parts_pages(spark, sf_dir)
n_parts = pages.count()
total = n_parts * repl
rng = spark.range(0, total, 1, 8 * cpus)
# broadcast stays small (~3 MB); heavy expansion + html wrap are parallel JVM
big = rng.join(F.broadcast(pages.select("doc_key", "ts", "source", "confidence", "content")),
               (F.col("id") % n_parts + 1) == F.col("doc_key"))
big = big.withColumn("content", F.concat_ws(" ", F.array_repeat(F.col("content"), HEAVY)))
big = big.withColumn("html", F.concat(
    F.lit("<!DOCTYPE html>\n<html><head><title>d</title><style>p{{color:#333}}</style>"
          "<script>var t='ignore';</script></head>\n<body><nav></nav>\n<p>"),
    F.col("content"),
    F.lit("</p>\n<script>console.log('f');</script></body></html>")))

@pandas_udf(CONCEPTS_TYPE)
def extract_from_html(s: pd.Series) -> pd.Series:
    return s.map(lambda h: extract_concepts(extract_text(h)))

def leg():
    c = big.select("ts", "source", "confidence",
                   F.explode(extract_from_html(F.col("html"))).alias("c")) \
         .select(F.col("c.name").alias("name"), F.col("c.parents").alias("parents"),
                 F.col("c.children").alias("children"), F.col("c.related").alias("related"),
                 "ts", "source", "confidence")
    t = concept_edges(c)
    t0 = time.time(); t.write.format("noop").mode("overwrite").save()
    return time.time() - t0

leg()  # warmup: JIT, codegen, python workers
sec = leg()
print("RESULT " + json.dumps({{"cpus": cpus, "sec": sec, "docs": total,
                               "docs_per_sec": total / sec}}))
spark.stop()
"""


def run_one(cpus: int, sf_dir: str, repl: int) -> dict:
    code = RUNNER.format(repo=REPO)
    cmd = [sys.executable, "-c", code, str(cpus), sf_dir, str(repl)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (rc={out.returncode}):\n{out.stderr[-2000:]}")


# ---------------------------------------------------------------------------
# hardware calibration (plain multiprocessing — no Spark, no JVM)
# ---------------------------------------------------------------------------

_SENT = ("Small ring is a economy part. Small ring has Brand#2. "
         "Small ring is related to Brand#2. ") * 8 * 16  # ~12 KB
_RX = re.compile(r"(?<=[.!?])\s+")


def _spin_str(q):
    t_end = time.time() + 6.0
    n = 0
    while time.time() < t_end:
        for _ in range(50):
            parts = _RX.split(_SENT + str(n))
            sum(len(p) for p in parts)
        n += 50
    q.put(n)


def _spin_int(q):
    t_end = time.time() + 6.0
    n = 0
    x = 12345
    while time.time() < t_end:
        for _ in range(10000):
            x = (x * 1103515245 + 12345) % (2 ** 31)
        n += 10000
    q.put(n)


def _calibrate(fn, procs: int) -> float:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    ps = [ctx.Process(target=fn, args=(q,)) for _ in range(procs)]
    os.sched_setaffinity(0, set(range(procs)))
    try:
        for p in ps:
            p.start()
        for p in ps:
            p.join()
    finally:
        os.sched_setaffinity(0, set(range(os.cpu_count())))
    return sum(q.get() for _ in ps) / 6.0


def calibration(n_small: int, n_big: int, reps: int = 1) -> dict:
    """reps > 1 reports the MEDIAN efficiency per workload — single-shot
    ceiling measurements swing +-0.05 on this VM (hypervisor steal), which
    would dominate the normalized number."""
    out = {}
    for name, fn in (("string_churn", _spin_str), ("int_loop", _spin_int)):
        effs, smalls, bigs = [], [], []
        for _ in range(reps):
            small = _calibrate(fn, n_small)
            big = _calibrate(fn, n_big)
            smalls.append(small)
            bigs.append(big)
            effs.append((big / small) / (n_big / n_small))
        mid = sorted(range(reps), key=lambda i: effs[i])[reps // 2]
        out[name] = {
            "small_per_sec": round(smalls[mid], 1),
            "big_per_sec": round(bigs[mid], 1),
            "efficiency": round(effs[mid], 3),
            "efficiency_reps": [round(e, 3) for e in effs],
        }
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # repl=150 (3M docs): shorter corpora leave the 32-thread leg dominated
    # by fixed scheduling/broadcast cost and understate efficiency by ~0.08
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_big = 4 * n_small

    # alternate the legs and take medians: this VM's throughput drifts over
    # minutes (hypervisor steal/throttling), so back-to-back single shots
    # systematically bias whichever leg runs second
    smalls, bigs = [], []
    for _ in range(3):
        smalls.append(run_one(n_small, sf_dir, repl))
        bigs.append(run_one(n_big, sf_dir, repl))
    small = sorted(smalls, key=lambda r: r["sec"])[1]
    big = sorted(bigs, key=lambda r: r["sec"])[1]
    speedup = small["sec"] / big["sec"]
    eff = speedup / (n_big / n_small)
    cal = calibration(n_small, n_big, reps=3)
    ceiling = cal["string_churn"]["efficiency"]
    result = {
        "workload": "html->text extraction + OpenIE + edge generation over "
                    "replicated ~12KB SVO pages (the pipeline's dominant map stage)",
        "proxy": f"CPU-pinned local[{n_small}] vs local[{n_big}] (taskset; "
                 "no real cluster in sandbox)",
        "sf_dir": sf_dir,
        "docs": small["docs"],
        "n_small": n_small,
        "n_big": n_big,
        "small": small,
        "big": big,
        "small_reps_sec": [round(r["sec"], 2) for r in smalls],
        "big_reps_sec": [round(r["sec"], 2) for r in bigs],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "hardware_calibration": cal,
        "normalized_efficiency": round(eff / ceiling, 3) if ceiling else None,
        "target": 0.8,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
