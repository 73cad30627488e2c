"""Bitext mining tests: brute-force Python replica of the banded-LSH +
ratio-margin pipeline, plus hub-suppression behavior."""

from __future__ import annotations

import math

from kgspark.bitext import mine_bitext

DIM = 16
BANDS, BITS, K = 8, 8, 4


def _vec(*pairs):
    v = [0.0] * DIM
    for i, x in pairs:
        v[i] = x
    return v


# left shard: 3 sources. right shard: a true mate for 0 and 2, a hub that
# sits near BOTH 0 and 2, and a far distractor.
LEFT = {
    0: _vec((0, 1.0), (1, 0.2)),
    2: _vec((2, 1.0), (3, 0.3)),
    4: _vec((5, 1.0), (6, -0.4)),
}
RIGHT = {
    101: _vec((0, 1.0), (1, 0.2)),            # exact mate of 0
    103: _vec((2, 0.9), (3, 0.35)),           # near mate of 2
    105: _vec((0, 0.7), (1, 0.1), (2, 0.7), (3, 0.2)),  # hub: near 0 AND 2
    107: _vec((7, 1.0)),                      # unrelated
}


def _bands_of(v):
    out = []
    for b in range(BANDS):
        val = 0
        for i in range(BITS):
            idx = b + i * BANDS
            if idx < len(v) and v[idx] > 0:
                val |= 1 << i
        out.append(val)
    return out


def _cos_ppm(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return int(round(round(dot / (na * nb), 6) * 1e6))


def _replica(margin_ppm=1_050_000):
    lb = {i: _bands_of(v) for i, v in LEFT.items()}
    rb = {j: _bands_of(v) for j, v in RIGHT.items()}
    scored = {}
    for i in LEFT:
        for j in RIGHT:
            if any(a == b for a, b in zip(lb[i], rb[j])):
                c = _cos_ppm(LEFT[i], RIGHT[j])
                if c > 0:
                    scored[(i, j)] = c
    def top(key_side):
        agg = {}
        for (i, j), c in scored.items():
            k = i if key_side == 0 else j
            agg.setdefault(k, []).append((-c, (j if key_side == 0 else i), c))
        out = {}
        for k, lst in agg.items():
            lst.sort()
            head = [c for _, _, c in lst[:K]]
            out[k] = (sum(head), len(head))
        return out
    nl, nr = top(0), top(1)
    rows = {}
    for (i, j), c in scored.items():
        sl, cl = nl[i]
        sr, cr = nr[j]
        m = math.floor(2e6 * c * cl * cr / (sl * cr + sr * cl))
        cur = rows.get(i)
        if cur is None or (-m, j) < (-cur[2], cur[0]):
            rows[i] = (j, c, m)
    return {
        i: (j, c, m)
        for i, (j, c, m) in rows.items()
        if m >= margin_ppm
    }


def _shards(spark):
    l = spark.createDataFrame(
        [(i, v) for i, v in LEFT.items()], "id long, embedding array<double>"
    )
    r = spark.createDataFrame(
        [(j, v) for j, v in RIGHT.items()], "id long, embedding array<double>"
    )
    return l, r


def test_mine_bitext_matches_brute_force(spark):
    l, r = _shards(spark)
    got = {
        row["src"]: (row["tgt"], row["cos_ppm"], row["margin_ppm"])
        for row in mine_bitext(l, r, k=K).collect()
    }
    assert got == _replica()
    assert len(got) >= 1  # the planted exact mate must survive


def test_exact_mate_wins_over_hub(spark):
    l, r = _shards(spark)
    got = {row["src"]: row for row in mine_bitext(l, r, k=K).collect()}
    # src 0's best is its exact copy (cos_ppm = 1e6), not the hub 105
    assert got[0]["tgt"] == 101
    assert got[0]["cos_ppm"] == 1_000_000
    assert got[0]["margin_ppm"] > 1_000_000


def test_hub_margin_suppressed(spark):
    l, r = _shards(spark)
    # with a very low threshold, src 2 is still mated to its true near
    # mate 103, not the hub, because the hub's fat neighborhood deflates
    # its margin
    got = {row["src"]: row for row in mine_bitext(l, r, k=K, margin_ppm=0).collect()}
    assert got[2]["tgt"] == 103
    # exactly one row per src, and src 4 (no positive-cos candidate mate
    # with margin above 0) appears at most once
    assert all(isinstance(v["margin_ppm"], int) for v in got.values())


# ---------------------------------------------------------------------------
# mirror_hosts (lives here to avoid another Spark-session test module)
# ---------------------------------------------------------------------------

T1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
T2 = "one two three four five six seven eight nine ten eleven twelve"
T3 = "totally different content about nothing shared with the others here"


def _shset(texts, n=5):
    out = set()
    for t in texts:
        toks = t.split(" ")
        if len(toks) >= n:
            out |= {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        else:
            out.add(" ".join(toks))
    return out


def test_mirror_hosts_exact_jaccard(spark):
    from kgspark.web import mirror_hosts

    rows = [("h1", T1), ("h1", T2), ("m1", T1), ("h2", T3)]
    df = spark.createDataFrame(rows, "host string, text string")
    got = {(r["host_a"], r["host_b"]): r
           for r in mirror_hosts(df, threshold_ppm=0).collect()}
    a = _shset([T1, T2])
    b = _shset([T1])
    inter = len(a & b)
    union = len(a | b)
    key = ("h1", "m1")
    assert key in got
    assert got[key]["n_inter"] == inter
    assert got[key]["n_union"] == union
    assert got[key]["jaccard_ppm"] == math.floor(1e6 * inter / union)
    # h2 shares nothing: no pair involving it survives even at threshold 0
    assert not any("h2" in k for k in got)


def test_mirror_hosts_threshold(spark):
    from kgspark.web import mirror_hosts

    rows = [("h1", T1), ("h1", T2), ("m1", T1), ("h2", T3)]
    df = spark.createDataFrame(rows, "host string, text string")
    # the h1/m1 jaccard is well under 900000: a high threshold empties it
    assert mirror_hosts(df, threshold_ppm=900_000).count() == 0


# ---------------------------------------------------------------------------
# transitive_reduction
# ---------------------------------------------------------------------------

def test_transitive_reduction_flags(spark):
    from kgspark.taxo import transitive_reduction

    # chain a->b->c->d with asserted shortcuts a->d (longest path 3) and
    # b->d (2); diamond x->y1->z, x->y2->z keeps both non-redundant, but
    # the extra x->z edge is redundant
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"), ("b", "d"),
             ("x", "y1"), ("x", "y2"), ("y1", "z"), ("y2", "z"), ("x", "z"),
             ("s", "s")]  # self-loop must be dropped
    df = spark.createDataFrame(edges, "child string, parent string")
    got = {(r["child"], r["parent"]): (r["max_hops"], r["redundant"])
           for r in transitive_reduction(df, max_depth=8).collect()}
    assert got[("a", "d")] == (3, 1)
    assert got[("b", "d")] == (2, 1)
    assert got[("x", "z")] == (2, 1)
    assert got[("a", "b")] == (1, 0)
    assert got[("y1", "z")] == (1, 0)
    assert ("s", "s") not in got
    assert len(got) == 10


def test_chrf_pairs_exact_scores(spark):
    from kgspark.bitext import chrf_pairs

    rows = [
        (1, "hello world", "hello world"),   # identical -> 1e6
        (2, "hello world", "goodbye moon"),  # near-zero overlap
        (3, "abcabc", "abc"),                # clipped multiset counts
        (4, "ab", "ab"),                     # both under n -> sentinel
        (5, "abcdef", "xy"),                 # hyp under n -> chrf 0
        (6, None, "abc"),                    # NULL ref
    ]
    df = spark.createDataFrame(rows, "pair_id long, ref string, hyp string")
    out = {r.id: r for r in chrf_pairs(df).collect()}
    r1 = out[1]
    # 'helloworld' has 8 3-grams; all match
    assert (r1.matches, r1.n_ref_grams, r1.n_hyp_grams) == (8, 8, 8)
    assert r1.chrf_ppm == 1_000_000
    assert out[2].chrf_ppm < 100_000
    # ref 'abcabc': grams abc,bca,cab,abc -> counts {abc:2,bca:1,cab:1};
    # hyp 'abc': {abc:1}; clipped match = 1
    r3 = out[3]
    assert (r3.matches, r3.n_ref_grams, r3.n_hyp_grams) == (1, 4, 1)
    assert r3.chrf_ppm == (5 * 1_000_000 * 1) // (4 * 4 + 1)
    assert out[4].chrf_ppm == -1
    assert (out[5].matches, out[5].chrf_ppm) == (0, 0)
    assert out[6].chrf_ppm == 0  # ref empty, hyp has a gram
    # recall weighting: dropping half the hyp hurts less than dropping
    # half the ref (beta=2 favors recall of the reference)
    asym = spark.createDataFrame(
        [(1, "abcdefghij", "abcde"), (2, "abcde", "abcdefghij")],
        "pair_id long, ref string, hyp string",
    )
    a = {r.id: r.chrf_ppm for r in chrf_pairs(asym).collect()}
    assert a[2] > a[1]
