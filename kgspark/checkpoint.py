"""Checkpoint manifest — resumable, idempotent stage execution.

The reference persists one artifact between runs (the joblib embedding cache,
ref /root/reference/knowledge_graph_builder.py:83-92) and otherwise recomputes
the world on every upload (ref app.py:100-102). At 10^12-doc scale a mid-run
failure must NOT restart the world, so every named stage writes:

  <run_dir>/<stage>.parquet         — the stage output (atomic: tmp + rename)
  <run_dir>/_manifest/<stage>.json  — {stage, fingerprint, rows,
                                       per-partition lineage counters, status}

A stage re-runs only when its input fingerprint changed; otherwise the
materialized parquet is read back (snapshot-isolation-lite — the same seam an
Iceberg catalog would provide; parquet keeps the sandbox dependency-free while
io_tables abstracts the format).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Manifest:
    def __init__(self, run_dir: str):
        self.run_dir = run_dir
        self.mdir = os.path.join(run_dir, "_manifest")
        os.makedirs(self.mdir, exist_ok=True)

    def _path(self, stage: str) -> str:
        return os.path.join(self.mdir, f"{stage}.json")

    def load(self, stage: str) -> dict | None:
        p = self._path(stage)
        if not os.path.exists(p):
            return None
        with open(p, encoding="utf-8") as f:
            return json.load(f)

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        m = self.load(stage)
        return bool(
            m
            and m.get("status") == "complete"
            and m.get("fingerprint") == fingerprint
            and os.path.exists(m.get("output", ""))
        )

    def mark_complete(self, stage: str, fingerprint: str, output: str,
                      rows: int, partition_counts: list[dict],
                      elapsed_sec: float | None = None) -> None:
        rec = {
            "stage": stage,
            "status": "complete",
            "fingerprint": fingerprint,
            "output": output,
            "rows": rows,
            "partitions": partition_counts,
            "elapsed_sec": elapsed_sec,
            "rows_per_sec": (
                round(rows / elapsed_sec, 1) if elapsed_sec else None
            ),
        }
        fd, tmp = tempfile.mkstemp(dir=self.mdir, suffix=".tmp")
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(rec, f, indent=2)
        os.replace(tmp, self._path(stage))


def run_stage(
    spark: SparkSession,
    manifest: Manifest,
    stage: str,
    fingerprint: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Execute-or-resume one named stage.

    Completed (same fingerprint) -> read back the materialized output.
    Otherwise: build, write atomically, record per-partition lineage counters
    (spark_partition_id row counts — the driver-side view of which partitions
    produced what), then publish the manifest entry LAST so a crash between
    write and publish re-runs the stage (idempotent overwrite).
    """
    import time

    out_path = os.path.join(manifest.run_dir, f"{stage}.parquet")
    if manifest.is_complete(stage, fingerprint):
        return spark.read.parquet(out_path)

    t0 = time.time()
    df = build()
    tmp_path = out_path + ".tmp"
    if os.path.exists(tmp_path):
        shutil.rmtree(tmp_path, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp_path)
    if os.path.exists(out_path):
        shutil.rmtree(out_path, ignore_errors=True)
    os.replace(tmp_path, out_path)

    written = spark.read.parquet(out_path)
    pc = (
        written.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    partition_counts = [{"pid": r["pid"], "rows": r["rows"]} for r in pc]
    rows = sum(p["rows"] for p in partition_counts)
    manifest.mark_complete(
        stage, fingerprint, out_path, rows, partition_counts,
        elapsed_sec=round(time.time() - t0, 3),
    )
    return written


def run_report(spark: SparkSession, run_dir: str) -> DataFrame:
    """Pipeline run report: one row per completed stage manifest —
    (stage, rows, n_partitions, max_partition_rows, skew_ratio_ppm,
    elapsed_sec, rows_per_sec). The operational view of a build_kg run:
    which stage ate the time, and whether any stage's output is
    partition-skewed (max partition vs fair share, in exact ppm — the
    number that says "salt this key" before the next run). Reads only
    the tiny _manifest JSONs — no data files are touched.
    """
    m = Manifest(run_dir)
    rows = []
    if os.path.isdir(m.mdir):
        for fn in sorted(os.listdir(m.mdir)):
            if not fn.endswith(".json"):
                continue
            rec = m.load(fn[:-5])
            if not rec or rec.get("status") != "complete":
                continue
            parts = rec.get("partitions") or []
            n_parts = len(parts)
            mx = max((p["rows"] for p in parts), default=0)
            total = rec.get("rows") or 0
            fair = total // n_parts if n_parts else 0
            skew = (mx * 1_000_000) // fair if fair else 0
            rows.append((
                rec["stage"], int(total), int(n_parts), int(mx),
                int(skew), float(rec.get("elapsed_sec") or 0.0),
                float(rec.get("rows_per_sec") or 0.0),
            ))
    return spark.createDataFrame(
        rows,
        "stage string, rows long, n_partitions long, "
        "max_partition_rows long, skew_ratio_ppm long, "
        "elapsed_sec double, rows_per_sec double",
    )
