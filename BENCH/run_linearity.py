#!/usr/bin/env python
"""Row-linearity evidence for the 100x-scale claim (r3 verdict item 9).

Runs the suite's 5 heaviest queries over replicated sf0.1 corpora at 1x, 2x,
4x, 8x rows and records time-vs-rows slopes. The replication keeps NEAR-DUP
DENSITY CONSTANT while rows grow — the property that separates a banded/
blocked plan (time ~ rows) from an all-pairs plan (time ~ rows^2):

  - documents: replica k prefixes every token with "r{k}_" — a bijection on
    the vocabulary, so every within-replica shingle/TF-IDF/near-dup
    relationship is preserved exactly while replicas share zero shingles
    (cross-replica candidate count is exactly 0 by construction);
  - embeddings: replica k multiplies each vector element-wise by a
    deterministic ±1 mask — an ISOMETRY of R^d (all intra-replica distances
    and cosines preserved exactly) that decorrelates replicas, so cluster
    structure is replicated, not merged.

Protocol (drift-proof, same as BENCH/run_scaling.py): one warmed session,
round-robin reps (rep loop OUTER) so one query's reps spread across the
VM's throttling envelope; per-(query, scale) MEDIAN reported.

Usage: python BENCH/run_linearity.py [reps] [scales...]   (idle machine!)
Writes BENCH/linearity.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/kgscale"

HEAVY = ["kg_topics", "kg_topics_density", "kg_dbscan_topics",
         "dedup_ngram", "ann_pq",
         # r4 heavies (round-5 verdict item 6). ann_ivfpq's contract
         # query already scales with the replicated embeddings table;
         # the CDC and Jaro-Winkler legs are operator-level because
         # their contract queries bound work by doc_id/customer-table
         # synthesis that replication does not grow.
         "ann_ivfpq", "multimodal_cdc_lin", "link_jw_lin"]


def _op_cdc_lin(spark, d):
    # gear-free CDC over EVERY scaled doc's first 150 bytes — the
    # chunk + MinHash-band machinery at k× rows, constant dup density
    # (replica token prefixes change the bytes, so chunk hashes only
    # collide within a replica)
    from pyspark.sql import functions as F

    from kgspark.multimodal import cdc_near_dups

    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    media = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.substring("text", 1, 150), "UTF-8").alias("payload"),
    )
    return cdc_near_dups(media, threshold_ppm=300_000)


def _op_jw_lin(spark, d):
    # blocked Jaro-Winkler over scaled docs; the block key carries the
    # replica index (doc_id div 10M) so block sizes stay constant as
    # rows grow — candidate pairs scale linearly by construction
    from pyspark.sql import functions as F

    from kgspark.linkrec import jaro_winkler_pairs

    docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
    recs = docs.select(
        F.col("doc_id").alias("rec_id"),
        F.concat(
            F.col("source"), F.lit("|"),
            F.expr("doc_id div 10000000"), F.lit("|"),
            (F.col("doc_id") % 200).cast("string"),
        ).alias("block_key"),
        F.substring("text", 1, 24).alias("text"),
    )
    return jaro_winkler_pairs(recs, min_sim=0.9)


def build_scaled(spark, k: int) -> str:
    """Materialize the k-x replicated corpus (documents + embeddings)."""
    from pyspark.sql import functions as F

    out = os.path.join(WORK, f"x{k}")
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    d_parts, e_parts = [], []
    for r in range(k):
        salt = F.lit(f"r{r}_")
        d_parts.append(
            docs.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(salt, t),
                    ),
                    " ",
                ).alias("text"),
                "lang", "source", "n_chars",
            )
        )
        # deterministic ±1 mask per (replica, dim): sign of a hash — an
        # isometry within the replica, ~orthogonal across replicas
        mask = F.array(
            *[
                F.when(
                    F.crc32(F.lit(f"m{r}_{j}")) % 2 == 0, F.lit(1.0)
                ).otherwise(F.lit(-1.0))
                for j in range(dim)
            ]
        )
        e_parts.append(
            emb.select(
                (F.col("vec_id") + r * 10_000_000).alias("vec_id"),
                F.zip_with(
                    "embedding", mask, lambda v, m: (v * m).cast("float")
                ).alias("embedding"),
                "label",
            )
        )
    d = d_parts[0]
    for p in d_parts[1:]:
        d = d.unionByName(p)
    e = e_parts[0]
    for p in e_parts[1:]:
        e = e.unionByName(p)
    d.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    e.repartition(8).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    open(marker, "w").write("ok")
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    scales = [int(s) for s in sys.argv[2:]] or [1, 2, 4, 8]

    import __spark_entry__ as entry
    from kgspark.session import get_spark

    spark = get_spark(
        "linearity",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    qs["multimodal_cdc_lin"] = _op_cdc_lin
    qs["link_jw_lin"] = _op_jw_lin
    dirs = {k: build_scaled(spark, k) for k in scales}
    # warmup (JVM/codegen/python workers)
    for q in HEAVY:
        qs[q](spark, dirs[scales[0]]).count()

    times: dict = {q: {k: [] for k in scales} for q in HEAVY}
    rows: dict = {q: {} for q in HEAVY}
    for rep in range(reps):
        for k in scales:
            for q in HEAVY:
                t0 = time.time()
                n = qs[q](spark, dirs[k]).count()
                dt = time.time() - t0
                times[q][k].append(round(dt, 2))
                rows[q][k] = n
                print(f"rep{rep} x{k} {q}: {dt:.2f}s rows={n}", flush=True)
                spark.catalog.clearCache()

    out = {"base": BASE, "reps": reps, "scales": scales, "queries": {}}
    for q in HEAVY:
        med = {k: statistics.median(times[q][k]) for k in scales}
        base_t = med[scales[0]]
        out["queries"][q] = {
            "median_s": med,
            "raw": times[q],
            "result_rows": rows[q],
            # time ratio vs row ratio at the largest scale: ~1 = linear,
            # ~scale = quadratic
            "slope_ratio_at_max": round(
                (med[scales[-1]] / base_t) / (scales[-1] / scales[0]), 3
            ),
        }
    path = os.path.join(REPO, "BENCH", "linearity.json")
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out["queries"], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
