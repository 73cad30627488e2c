

def test_link_coherent_context_flips_the_prior(spark):
    from kgspark.web import link_coherent

    pairs = spark.createDataFrame(
        [("http://s1.com/p", "https://citya.com/x", "Paris"),
         ("http://s2.com/p", "https://citya.com/x", "paris"),
         ("http://s5.com/p", "https://citya.com/x", "paris"),
         ("http://s3.com/p", "https://hostb.com/x", "paris"),
         ("http://s9.com/p", "https://hostb.com/x", "Paris"),
         ("http://s3.com/q", "https://france.com/x", "France"),
         ("http://s9.com/q", "https://france.com/x", "france"),
         ("http://s4.com/q", "https://france.com/x", "france")],
        "url string, link string, anchor string",
    )
    mentions = spark.createDataFrame(
        [(1, "Paris"), (1, "France"), (2, "paris"), (3, "nope")],
        "doc_id long, mention string",
    )
    got = {
        (r.doc_id, r.mention): (r.linked_host, r.prior_ppm,
                                r.coherence_ppm, r.score)
        for r in link_coherent(mentions, pairs).collect()
    }
    # doc 1 has unambiguous context france.com, whose inlinkers {s3,s9}
    # coincide with hostb.com's -> coherence 1e6 flips paris to hostb
    assert got[(1, "Paris")] == ("hostb.com", 400000, 1000000, 1400000)
    assert got[(1, "France")] == ("france.com", 1000000, 0, 1000000)
    # doc 2 has no context -> prior baseline wins
    assert got[(2, "paris")] == ("citya.com", 600000, 0, 600000)
    # unknown mention passes through with NULLs
    assert got[(3, "nope")] == (None, None, None, None)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="k"):
        link_coherent(mentions, pairs, k=0)


def test_nil_mentions_clusters_unknown_surfaces(spark):
    from kgspark.web import nil_mentions

    priors = spark.createDataFrame(
        [("paris", "citya.com", 3, 0.6)],
        "anchor string, dst_host string, n long, prior double",
    )
    mentions = spark.createDataFrame(
        [(1, "Paris"), (1, "Zorgon"), (2, "zorgon"), (2, "zorgon"),
         (3, "Blip"), (4, "  ")],
        "doc_id long, mention string",
    )
    got = {
        r.nil_surface: (r.n_mentions, r.n_docs, r.min_doc)
        for r in nil_mentions(mentions, priors).collect()
    }
    # paris is known; blank normalizes away; zorgon pools across docs
    assert got == {"zorgon": (3, 2, 1), "blip": (1, 1, 3)}
