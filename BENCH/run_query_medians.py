#!/usr/bin/env python
"""Rep-median timings for the heaviest bench queries (drift-proof protocol).

This VM's throughput drifts over minutes (hypervisor steal/throttling under
sustained load), so two single-shot suite runs can disagree 2x on the same
query with an unchanged plan (kg_dbscan_topics measured 11.7 s and 25.1 s in
back-to-back round-2 suite runs). BENCH/run_scaling.py already fights this by
ALTERNATING legs and taking medians; this harness extends the same protocol
to the per-query suite's heavy hitters:

  - one warmed Spark session (JIT/codegen/python workers paid once, as in
    bench.py);
  - ROUND-ROBIN reps (rep loop outer, query loop inner) so the reps of any
    one query are spread across the run's drift envelope rather than
    clustered in one throttling window;
  - persisted blocks freed between queries (same as bench.py) so each rep
    re-executes the full plan;
  - per-query MEDIAN of the reps reported, raw reps kept for the record.

Usage: python BENCH/run_query_medians.py [sf_dir] [reps]
Writes BENCH/query_medians.json; run on an idle machine only.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the heaviest queries of the suite (everything that measured >4 s in a
# recent single-shot run) — the set where drift actually matters; the
# continuation-session heavies (PQ/winnow/PPR/walk-pairs) joined in r3
HEAVY_QUERIES = [
    "kg_topics",
    "kg_topics_density",
    "kg_dbscan_topics",
    "dedup_ngram",
    "dedup_simhash64",
    "kg_connected_components",
    "kg_extract_triples",
    "kg_tfidf",
    "kg_pagerank",
    "dedup_minhash",
    "ann_pq",
    "embed_pq",
    "dedup_winnow_pairs",
    "dedup_winnow",
    "kg_ppr",
    "kg_walk_pairs",
    "kg_inverse_preds",
    "kg_assortativity",
    # r4 heavies (round-5 verdict item 2: one-shot numbers on this VM
    # are not comparable — winnow_pairs "regressed" 2.36x with no code
    # change; these join the medians protocol)
    "ann_ivfpq",
    "multimodal_cdc_dedup",
    "link_jw",
    "kg_single_linkage",
    # round-5-new heavies
    "multimodal_cdc_gear",
    "text_unigram",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from kgspark.session import get_spark

    spark = get_spark(
        "kgspark-query-medians",
        master=f"local[{cpus}]",
        shuffle_partitions=max(32, 2 * cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    def _materialize(df):
        df.write.format("noop").mode("overwrite").save()

    def _drop_blocks():
        for _rid, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            rdd.unpersist()

    _materialize(qs["rel_pricing_summary"](spark, sf_dir))  # warmup

    raw: dict[str, list[float]] = {q: [] for q in HEAVY_QUERIES}
    for rep in range(reps):
        for name in HEAVY_QUERIES:
            t0 = time.time()
            _materialize(qs[name](spark, sf_dir))
            raw[name].append(round(time.time() - t0, 3))
            _drop_blocks()
        print(f"# rep {rep + 1}/{reps} done", file=sys.stderr)

    result = {
        "protocol": "round-robin alternating reps, median per query, "
                    "single warmed session, persisted blocks freed between "
                    "queries (idle machine)",
        "sf_dir": sf_dir,
        "cpus": cpus,
        "reps": reps,
        "queries": {
            q: {"median_sec": round(statistics.median(v), 3), "reps_sec": v}
            for q, v in raw.items()
        },
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(REPO, "BENCH", "query_medians.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
