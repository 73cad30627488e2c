#!/usr/bin/env python
"""spark-submit entry point: pages -> triples extraction job.

The north-rule launch mode — the kgspark package arrives via --py-files, so
this script imports it with no repo on sys.path:

    spark-submit --master <master> \
        --py-files dist/kgspark.zip \
        scripts/submit_extract.py <sf_dir> <out_dir>

Reads the `part` table under <sf_dir>, derives the SVO page corpus, runs the
OpenIE extraction + fwd/rev edge generation DAG, and writes the deduplicated
triples parquet to <out_dir>/triples.parquet plus a one-line _SUCCESS-style
row-count marker the caller can assert on.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # spark-submit owns master/deploy config; only app-level conf here
    spark = (
        SparkSession.builder.appName("kgspark-extract")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from kgspark.edges import concept_edges
    from kgspark.openie import extract_concepts_udf

    p = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    cap = F.concat(F.upper(F.substring("p_name", 1, 1)), F.expr("substring(p_name, 2)"))
    typ = F.concat(F.lower("p_type"), F.lit(" part"))
    content = F.concat(
        cap, F.lit(" is a "), typ, F.lit(". "),
        cap, F.lit(" has "), F.col("p_brand"), F.lit("."),
    )
    pages = p.select(
        content.alias("content"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit("part").alias("source"),
        F.lit(0.8).alias("confidence"),
    )
    concepts = pages.select(
        "ts", "source", "confidence",
        F.explode(extract_concepts_udf(F.col("content"))).alias("c"),
    ).select(
        "ts", "source", "confidence",
        F.col("c.name").alias("name"),
        F.col("c.parents").alias("parents"),
        F.col("c.children").alias("children"),
        F.col("c.related").alias("related"),
    )
    triples = concept_edges(concepts).select("subj", "pred", "obj", "weight").distinct()
    out_path = os.path.join(out_dir, "triples.parquet")
    triples.write.mode("overwrite").parquet(out_path)
    n = spark.read.parquet(out_path).count()
    with open(os.path.join(out_dir, "result.json"), "w") as f:
        json.dump({"triples": n}, f)
    print(f"RESULT triples={n}")
    spark.stop()


if __name__ == "__main__":
    main()
