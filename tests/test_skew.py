

def test_partition_report_exact(spark):
    import hashlib

    from kgspark.skew import partition_report

    rows = [("a", "b"), ("a", "c"), ("b", "a"), ("c", "c2"), ("c", "a")]
    df = spark.createDataFrame(rows, "subj string, obj string")
    k = 4

    def bucket(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:6], 16) % k

    out = {r["partition"]: (r["n_nodes"], r["n_edges"], r["n_cut"],
                            r["cut_ppm"])
           for r in partition_report(df, k=k).collect()}
    from collections import defaultdict
    exp = defaultdict(lambda: [set(), 0, 0])
    for s, o in rows:
        p = bucket(s)
        exp[p][0].add(s)
        exp[p][1] += 1
        if bucket(o) != p:
            exp[p][2] += 1
    assert out == {
        p: (len(ns), ne, nc, (1_000_000 * nc) // ne)
        for p, (ns, ne, nc) in exp.items()
    }
    import pytest as _p
    with _p.raises(ValueError, match="k >= 1"):
        partition_report(df, k=0)


def test_partition_report_k1_no_cuts(spark):
    from kgspark.skew import partition_report

    df = spark.createDataFrame([("a", "b"), ("b", "c")],
                               "subj string, obj string")
    rows = partition_report(df, k=1).collect()
    assert len(rows) == 1
    assert rows[0]["n_cut"] == 0 and rows[0]["cut_ppm"] == 0
