"""Structured-data extraction, N-Triples serialization, temporal KG.

Crafted-input unit tests for kgspark/structdata.py (meta tags, HTML
tables, JSON-LD triples), kgspark/rdf.py (canonical N-Triples lines) and
kgspark/temporal.py (SCD-2 intervals, as-of snapshots). The contract
queries prove the same operators against DuckDB oracles at sf0.01; these
tests pin the edge semantics the synthesized corpus can't reach
(attribute-order variants, deep JSON-LD nesting, escape chains, tie
breaks).
"""

from __future__ import annotations

from kgspark.rdf import ntriples_lines
from kgspark.structdata import html_tables, jsonld_triples, meta_tags
from kgspark.temporal import asof_snapshot, triple_intervals


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def test_meta_tags_attribute_order_and_charset_drop(spark):
    html = (
        '<head><meta charset="utf-8"/>'
        '<meta content="rev" property="og:type"/>'
        '<meta name="author" content="ada"/></head>'
    )
    out = meta_tags(_pages(spark, [("u1", html)])).collect()
    got = {(r.tag_no, r.prop, r.content) for r in out}
    # charset tag (no property/name) is dropped; tag_no counts ALL meta
    # tags so the survivors keep their document positions 2 and 3
    assert got == {(2, "og:type", "rev"), (3, "author", "ada")}


def test_meta_tags_content_before_property(spark):
    # attribute order must not matter: content= preceding property=
    html = '<meta content="x" property="p"/>'
    [r] = meta_tags(_pages(spark, [("u", html)])).collect()
    assert (r.prop, r.content) == ("p", "x")


def test_html_tables_two_tables_markup_stripped(spark):
    html = (
        "<table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td><b>a</b></td><td> b </td></tr></table>"
        '<p>x</p><table id="t2"><tr><td>solo</td></tr></table>'
    )
    out = html_tables(_pages(spark, [("u", html)])).collect()
    got = {(r.table_no, r.row_no, r.col_no, r.cell) for r in out}
    assert got == {
        (1, 1, 1, "h1"), (1, 1, 2, "h2"),
        (1, 2, 1, "a"), (1, 2, 2, "b"),
        (2, 1, 1, "solo"),
    }


def _jsonld_page(payloads):
    return "".join(
        f'<script type="application/ld+json">{p}</script>' for p in payloads
    )


def test_jsonld_nested_blank_labels_and_arrays(spark):
    payload = (
        '{"@id":"https://e/1","@type":"Article",'
        '"author":{"name":"ada","affil":{"name":"acme"}},'
        '"keywords":["a","b"],"wordCount":7,"free":true}'
    )
    rows = jsonld_triples(
        _pages(spark, [("u", _jsonld_page([payload]))])
    ).collect()
    got = {(r.subj, r.pred, r.obj) for r in rows}
    assert got == {
        ("https://e/1", "@type", "Article"),
        ("https://e/1", "author", "_:b1.1.1"),
        ("_:b1.1.1", "name", "ada"),
        ("_:b1.1.1", "affil", "_:b1.1.2"),
        ("_:b1.1.2", "name", "acme"),
        ("https://e/1", "keywords", "a"),
        ("https://e/1", "keywords", "b"),
        ("https://e/1", "wordCount", "7"),
        ("https://e/1", "free", "true"),
    }
    assert all(r.block_no == 1 and r.node_no == 1 for r in rows)


def test_jsonld_toplevel_array_and_error_row(spark):
    page = _jsonld_page(['[{"a":"x"},{"@id":"n2","b":"y"}]', "{broken"])
    rows = jsonld_triples(_pages(spark, [("u", page)])).collect()
    got = {(r.block_no, r.node_no, r.subj, r.pred, r.obj) for r in rows}
    assert got == {
        (1, 1, "_:b1.1", "a", "x"),
        (1, 2, "n2", "b", "y"),
        (2, 0, "", "@error", "json_decode"),
    }


def test_jsonld_no_blocks_yields_nothing(spark):
    assert jsonld_triples(
        _pages(spark, [("u", "<html><body>plain</body></html>")])
    ).count() == 0


def test_ntriples_escape_chain_and_term_kinds(spark):
    triples = spark.createDataFrame(
        [
            ("https://s/1", "https://p/1", "https://o/1"),
            ("_:b1", "rel", "_:b2"),
            ("alice", "says", 'q"\\' + "\n\t\rz"),
        ],
        "subj string, pred string, obj string",
    )
    lines = {r.subj: r.line for r in ntriples_lines(triples).collect()}
    assert lines["https://s/1"] == "<https://s/1> <https://p/1> <https://o/1> ."
    assert lines["_:b1"] == "_:b1 <https://kg.example.org/prop/rel> _:b2 ."
    # backslash escaped FIRST, then quote and the control characters
    assert lines["alice"] == (
        "<https://kg.example.org/alice> <https://kg.example.org/prop/says> "
        '"q\\"\\\\\\n\\t\\rz" .'
    )


def _obs(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, ts long"
    )


def test_triple_intervals_runs_and_open_interval(spark):
    obs = _obs(spark, [
        ("e", "p", "a", 1), ("e", "p", "a", 2), ("e", "p", "b", 3),
        ("e", "p", "a", 5), ("e", "q", "z", 4),
    ])
    rows = triple_intervals(obs).collect()
    got = {
        (r.subj, r.pred, r.obj, r.valid_from, r.valid_to, r.n_obs)
        for r in rows
    }
    assert got == {
        ("e", "p", "a", 1, 3, 2),   # re-observation extends, n_obs=2
        ("e", "p", "b", 3, 5, 1),
        ("e", "p", "a", 5, None, 1),  # value can recur as a NEW interval
        ("e", "q", "z", 4, None, 1),
    }


def test_asof_snapshot_filter_and_tiebreak(spark):
    obs = _obs(spark, [
        ("e", "p", "old", 1), ("e", "p", "new", 5), ("e", "p", "late", 9),
        ("e", "q", "a", 5), ("e", "q", "b", 5),   # ts tie -> desc obj
        ("f", "p", "only_after", 8),
    ])
    rows = asof_snapshot(obs, 5).collect()
    got = {(r.subj, r.pred, r.obj, r.as_of_ts) for r in rows}
    assert got == {("e", "p", "new", 5), ("e", "q", "b", 5)}


def test_microdata_content_vs_text_value(spark):
    html = (
        '<div itemscope><span itemprop="name"> Ada </span>'
        '<meta itemprop="wc" content="42"/>'
        '<a itemprop="url" href="/x">home</a>'
        '<b>no prop</b></div>'
    )
    from kgspark.structdata import microdata_items

    out = microdata_items(_pages(spark, [("u", html)])).collect()
    got = {(r.item_no, r.prop, r.value) for r in out}
    assert got == {(1, "name", "Ada"), (2, "wc", "42"), (3, "url", "home")}


def test_rdfa_properties_value_resolution(spark):
    html = (
        '<div vocab="https://schema.org/" typeof="Article">'
        '<span property="name"> Ada </span>'
        '<meta property="wc" content="42"/>'
        '<a property="url" href="/x">home</a>'
        '<link property="sameAs" resource="https://wd.example.org/Q1"/>'
        '<meta property="both" content="lit" href="/iri"/>'
        '<b>no prop</b></div>'
    )
    from kgspark.structdata import rdfa_properties

    out = rdfa_properties(_pages(spark, [("u", html)])).collect()
    got = {(r.item_no, r.prop, r.value, r.is_iri) for r in out}
    assert got == {
        (1, "name", "Ada", 0),             # immediate text, trimmed
        (2, "wc", "42", 0),                # content= literal
        (3, "url", "/x", 1),               # href= -> IRI object
        (4, "sameAs", "https://wd.example.org/Q1", 1),  # resource= IRI
        (5, "both", "lit", 0),             # content= beats href=
    }


def test_breadcrumb_trails_and_edges(spark):
    html1 = (
        '<nav aria-label="breadcrumb"><ol>'
        '<li><a href="/">Home</a></li>'
        '<li><a href="/sci">Science</a></li>'
        '<li><span aria-current="page"> Physics </span></li>'
        '</ol></nav>'
    )
    html2 = (
        '<nav aria-label="breadcrumb">'
        '<a href="/">Home</a><a href="/sci">Science</a>'
        '<span aria-current="page">Chemistry</span></nav>'
        '<nav aria-label="main"><a href="/x">not a crumb</a></nav>'
    )
    from kgspark.structdata import breadcrumb_edges, breadcrumb_trails

    trails = breadcrumb_trails(
        _pages(spark, [("u1", html1), ("u2", html2), ("u3", "<p>none</p>")]))
    got = {(r.url, r.pos, r.label, r.href) for r in trails.collect()}
    assert got == {
        ("u1", 1, "Home", "/"), ("u1", 2, "Science", "/sci"),
        ("u1", 3, "Physics", ""),
        ("u2", 1, "Home", "/"), ("u2", 2, "Science", "/sci"),
        ("u2", 3, "Chemistry", ""),
    }
    edges = {(r.parent, r.child): r.n_pages
             for r in breadcrumb_edges(trails).collect()}
    assert edges == {("Home", "Science"): 2, ("Science", "Physics"): 1,
                     ("Science", "Chemistry"): 1}


def test_fuse_facts_weighted_vote_and_missing_source(spark):
    from kgspark.fusion import fuse_facts

    obs = spark.createDataFrame(
        [
            ("e", "p", "x", "s1"), ("e", "p", "x", "s1"),
            ("e", "p", "y", "s2"),              # heavier single vote wins
            ("e", "q", "a", "s3"), ("e", "q", "b", "s3"),  # tie -> asc obj
            ("f", "p", "z", "s_unknown"),       # weight-0 vote still counts
        ],
        "subj string, pred string, obj string, source string",
    )
    w = spark.createDataFrame(
        [("s1", 100), ("s2", 300), ("s3", 50)],
        "source string, weight_ppm long",
    )
    got = {
        (r.subj, r.pred): (r.obj, r.score_ppm, r.n_votes, r.n_candidates)
        for r in fuse_facts(obs, w).collect()
    }
    assert got[("e", "p")] == ("y", 300, 1, 2)
    assert got[("e", "q")] == ("a", 50, 1, 2)
    assert got[("f", "p")] == ("z", 0, 1, 1)


def test_copy_detection_shared_minority_fingerprint(spark):
    from kgspark.fusion import copy_detection

    obs = spark.createDataFrame(
        [("e", "p", "x", s) for s in ("s1", "s2", "s3")]  # majority
        + [("e", "p", "w", "s4"), ("e", "p", "w", "s5")]  # shared error
        + [("f", "p", "y", s) for s in ("s1", "s2", "s4", "s5")],
        "subj string, pred string, obj string, source string",
    )
    got = {(r.source_a, r.source_b):
           (r.shared_total, r.shared_minority, r.copy_ppm)
           for r in copy_detection(obs).collect()}
    # honest pair: all shared values are the plurality
    assert got[("s1", "s2")] == (2, 0, 0)
    # copier pair: half their overlap is a shared minority value
    assert got[("s4", "s5")] == (2, 1, 500000)
    # pairs sharing a single claim fall under min_shared
    assert ("s1", "s4") not in got
    # max-df guard drops web-wide claims from the pair join
    guarded = {(r.source_a, r.source_b): (r.shared_total, r.shared_minority)
               for r in copy_detection(
                   obs, min_shared=1, max_sources_per_claim=2).collect()}
    assert guarded == {("s4", "s5"): (1, 1)}


def test_triple_provenance_rollup(spark):
    from kgspark.fusion import triple_provenance

    obs = spark.createDataFrame(
        [
            ("e", "p", "x", "s1", 3), ("e", "p", "x", "s2", 7),
            ("e", "p", "x", "s1", 5), ("e", "p", "y", "s1", 9),
        ],
        "subj string, pred string, obj string, source string, ts long",
    )
    got = {
        (r.subj, r.pred, r.obj):
            (r.n_obs, r.n_sources, r.first_seen, r.last_seen)
        for r in triple_provenance(obs).collect()
    }
    assert got[("e", "p", "x")] == (3, 2, 3, 7)
    assert got[("e", "p", "y")] == (1, 1, 9, 9)


def test_sameas_rewrite_transitive_chain_collapses(spark):
    from kgspark.canon import sameas_rewrite

    triples = spark.createDataFrame(
        [
            ("a", "p", "q"), ("b", "p", "q"),   # a~b~c: both collapse
            ("c", "r", "b"),                    # obj rewrites too
            ("z", "p", "q"),                    # untouched entity
        ],
        "subj string, pred string, obj string",
    )
    sameas = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "a string, b string"
    )
    got = {
        (r.subj, r.pred, r.obj): r.n_merged
        for r in sameas_rewrite(triples, sameas).collect()
    }
    assert got == {("a", "p", "q"): 2, ("a", "r", "a"): 1, ("z", "p", "q"): 1}


def test_entity_card_truncation_and_order(spark):
    from kgspark.graph_api import entity_card

    triples = spark.createDataFrame(
        [("e", "b", str(i)) for i in range(5)] + [("e", "a", "x"),
                                                  ("f", "p", "q")],
        "subj string, pred string, obj string",
    )
    got = {r.subj: (r.n_facts, r.card)
           for r in entity_card(triples, max_facts=3).collect()}
    # cap keeps the 3 lexicographically-first facts; n_facts counts all 6
    assert got["e"] == (6, "a=x|b=0|b=1")
    assert got["f"] == (1, "p=q")


def test_fact_churn_census(spark):
    from kgspark.temporal import fact_churn

    obs = _obs(spark, [
        ("e", "p", "a", 1), ("e", "p", "b", 2), ("e", "p", "b", 3),
        ("f", "p", "z", 1),
        ("e", "q", "x", 1), ("e", "q", "y", 2), ("e", "q", "x", 3),
    ])
    obs = obs.withColumn("__dummy", obs.ts).drop("__dummy")
    got = {r.pred: (r.n_keys, r.n_obs, r.n_intervals, r.n_changed_keys,
                    r.max_intervals)
           for r in fact_churn(obs).collect()}
    assert got["p"] == (2, 4, 3, 1, 2)   # e/p: 2 runs; f/p: 1 run
    assert got["q"] == (1, 3, 3, 1, 3)   # x->y->x = 3 runs


def test_canonical_clusters_groups_declared_targets(spark):
    from kgspark.web import canonical_clusters

    mk = '<link rel="canonical" href="%s"/>'
    pages = _pages(spark, [
        ("u1", mk % "https://c/1"), ("u2", mk % "https://c/1"),
        ("u2", mk % "https://c/1"),          # same url twice
        ("u3", mk % "https://c/2"),
        ("u4", "<html>no tag</html>"),
    ])
    got = {r.canonical: (r.n_pages, r.n_urls, r.min_url)
           for r in canonical_clusters(pages).collect()}
    assert got == {"https://c/1": (3, 2, "u1"), "https://c/2": (1, 1, "u3")}


def test_shape_report_kind_and_cardinality(spark):
    from kgspark.schema_induce import shape_report

    triples = spark.createDataFrame(
        [
            ("s1", "age", "41"), ("s1", "age", "xx"),      # 1 type-bad
            ("s2", "age", "7"),
            ("s1", "link", "https://a"), ("s1", "link", "http://b"),
            ("s1", "link", "https://c"),                   # s1 over cap 2
            ("s2", "link", "nope"),                        # type-bad
        ],
        "subj string, pred string, obj string",
    )
    shapes = spark.createDataFrame(
        [("age", "int", 9), ("link", "iri", 2)],
        "pred string, kind string, max_per_subj int",
    )
    got = {r.pred: (r.n_triples, r.n_type_bad, r.n_subj, r.n_subj_over_card)
           for r in shape_report(triples, shapes).collect()}
    assert got["age"] == (3, 1, 2, 0)
    assert got["link"] == (4, 1, 2, 1)


def test_table_triples_header_layout(spark):
    from kgspark.structdata import table_triples

    html = (
        "<table><tr><th>name</th><th>color</th></tr>"
        "<tr><td>a</td><td>red</td></tr>"
        "<tr><td>b</td><td></td></tr>"          # empty obj -> dropped
        "<tr><td></td><td>blue</td></tr>"       # empty subj -> dropped
        "<tr><td>c</td><td>green</td><td>9</td></tr>"  # no header col 3
        "</table>"
    )
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    got = {
        (r.subj, r.pred, r.obj, r.row_no)
        for r in table_triples(html_tables(pages)).collect()
    }
    assert got == {("a", "color", "red", 2), ("c", "color", "green", 5)}


def test_table_triples_attribute_layout(spark):
    from kgspark.structdata import table_triples

    html = (
        "<table><tr><td>born</td><td>1912</td></tr>"
        "<tr><td>field</td><td>logic</td></tr>"
        "<tr><td>orphan</td></tr>"              # no value cell -> dropped
        "</table>"
    )
    pages = spark.createDataFrame([("u", html)], "url string, html string")
    got = {
        (r.subj, r.pred, r.obj)
        for r in table_triples(html_tables(pages), layout="attribute").collect()
    }
    assert got == {("u", "born", "1912"), ("u", "field", "logic")}


def test_table_triples_bad_layout_raises(spark):
    import pytest as _pytest
    from kgspark.structdata import table_triples

    pages = spark.createDataFrame([("u", "<table></table>")],
                                  "url string, html string")
    with _pytest.raises(ValueError, match="layout"):
        table_triples(html_tables(pages), layout="pivot")


def test_interval_conflicts_overlap_and_open_intervals(spark):
    from kgspark.temporal import interval_conflicts

    obs = spark.createDataFrame(
        [
            # source A: ceo=x for [0,40), ceo=z from 40 (open)
            ("co", "ceo", "x", 0, "A"), ("co", "ceo", "x", 20, "A"),
            ("co", "ceo", "z", 40, "A"),
            # source B: ceo=y for [10,30), ceo=z from 30 (open)
            ("co", "ceo", "y", 10, "B"), ("co", "ceo", "z", 30, "B"),
            # agreeing fact elsewhere: never a conflict
            ("co", "hq", "paris", 0, "A"), ("co", "hq", "paris", 5, "B"),
        ],
        "subj string, pred string, obj string, ts long, source string",
    )
    got = {
        (r.obj_a, r.obj_b, r.overlap_from, r.overlap_to)
        for r in interval_conflicts(obs).collect()
    }
    assert ("x", "y", 10, 30) in got   # A:x[0,40) vs B:y[10,30)
    assert ("x", "z", 30, 40) in got   # A:x[0,40) vs B:z[30,open)
    # A:z[40,None) vs B:z[30,None): same obj -> no conflict
    assert not any(a == "z" and b == "z" for a, b, _, _ in got)
    # A:z[40,None) vs B:y[10,30): disjoint -> no conflict
    assert ("z", "y", 40, 30) not in got and ("z", "y", 10, 30) not in got
    assert len(got) == 2


def test_truth_discovery_reinforcement_beats_majority_split(spark):
    from kgspark.fusion import truth_discovery

    # good sources g1,g2 corroborate each other on A/C/D while the
    # liars l1,l2,l3 each assert unique junk there; on B the liars
    # gang up on y (3 votes vs 2). Uniform voting loses B; by round 3
    # the goods' compounded trust (ratio > 1.5x) flips B to x.
    goods, liars = ["g1", "g2"], ["l1", "l2", "l3"]
    rows = []
    for fact in ["A", "C", "D"]:
        rows += [(fact, "p", "x", g) for g in goods]
        rows += [(fact, "p", f"junk_{fact}_{s}", s) for s in liars]
    rows += [("B", "p", "x", g) for g in goods]
    rows += [("B", "p", "y", s) for s in liars]
    obs = spark.createDataFrame(
        rows, "subj string, pred string, obj string, source string",
    )
    got = {r.subj: (r.obj, r.conf_ppm, r.n_candidates)
           for r in truth_discovery(obs, rounds=3).collect()}
    assert got["A"][0] == "x" and got["A"][2] == 4
    assert got["B"][0] == "x" and got["B"][2] == 2
    # reinforcement: winner confidence strictly above the uniform share
    assert got["B"][1] > 500_000


def test_truth_discovery_deterministic_tie(spark):
    from kgspark.fusion import truth_discovery

    obs = spark.createDataFrame(
        [("A", "p", "b", "s1"), ("A", "p", "a", "s2")],
        "subj string, pred string, obj string, source string",
    )
    rows = truth_discovery(obs, rounds=2).collect()
    assert len(rows) == 1 and rows[0].obj == "a"  # tie -> ascending obj


def test_reify_statement_shape(spark):
    import hashlib

    from kgspark.rdf import reify

    t = spark.createDataFrame(
        [("a", "has", "b", "web", 480000),
         ("a", "has", "b", "web", 480000)],  # dup collapses
        "subj string, pred string, obj string, source string, w long",
    )
    out = reify(t, qualifiers=("source", "w")).collect()
    ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    st = "_:st" + hashlib.md5("a\x1ehas\x1eb".encode()).hexdigest()
    got = {(r["subj"], r["pred"], r["obj"]) for r in out}
    assert got == {
        (st, ns + "type", ns + "Statement"),
        (st, ns + "subject", "a"),
        (st, ns + "predicate", "has"),
        (st, ns + "object", "b"),
        (st, "https://kg.example.org/qual/source", "web"),
        (st, "https://kg.example.org/qual/w", "480000"),
    }


def test_reify_feeds_ntriples(spark):
    from kgspark.rdf import ntriples_lines, reify

    t = spark.createDataFrame(
        [("a", "has", "b")], "subj string, pred string, obj string"
    )
    lines = [r["line"] for r in ntriples_lines(reify(t)).collect()]
    assert len(lines) == 4
    assert all(l.startswith("_:st") and l.endswith(" .") for l in lines)
    # rdf:subject points at the minted IRI of the original subject
    assert any(
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#subject> "
        '"a"' in l or
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#subject> "
        "<https://kg.example.org/a>" in l
        for l in lines
    )


def test_ntriples_star_line(spark):
    from kgspark.rdf import ntriples_star_lines

    t = spark.createDataFrame(
        [("a", "has", "b", 480000),
         ("https://x.org/s", "has", 'say "hi"\n', 7)],
        "subj string, pred string, obj string, w long",
    )
    got = {r["subj"]: r["line"] for r in ntriples_star_lines(
        t, "https://kg.example.org/qual/w", "w"
    ).collect()}
    assert got["a"] == (
        "<< <https://kg.example.org/a> <https://kg.example.org/prop/has> "
        '"b" >> <https://kg.example.org/qual/w> "480000" .'
    )
    assert got["https://x.org/s"] == (
        "<< <https://x.org/s> <https://kg.example.org/prop/has> "
        '"say \\"hi\\"\\n" >> <https://kg.example.org/qual/w> "7" .'
    )


def test_jsonld_lines_roundtrip_parse(spark):
    import json as _json

    from kgspark.structdata import jsonld_lines

    t = spark.createDataFrame(
        [("a", "has", "b2"), ("a", "has", "b1"),
         ("a", "https://schema.org/name", 'say "hi"\n'),
         ("https://x.org/e", "p", "v")],
        "subj string, pred string, obj string",
    )
    got = {r["subj"]: r["line"] for r in jsonld_lines(t).collect()}
    d = _json.loads(got["https://kg.example.org/a"])
    assert d["@id"] == "https://kg.example.org/a"
    assert d["https://kg.example.org/prop/has"] == ["b1", "b2"]  # sorted
    assert d["https://schema.org/name"] == ['say "hi"\n']
    d2 = _json.loads(got["https://x.org/e"])
    assert d2 == {"@id": "https://x.org/e",
                  "https://kg.example.org/prop/p": ["v"]}
    # keys sorted canonically (after @id)
    keys = list(d.keys())[1:]
    assert keys == sorted(keys)


def test_jsonld_lines_roundtrips_with_parser(spark):
    import json as _json

    from kgspark.structdata import jsonld_lines

    t = spark.createDataFrame(
        [("e1", "p", "x"), ("e1", "q", "y"), ("e2", "p", "z")],
        "subj string, pred string, obj string",
    )
    lines = [r["line"] for r in jsonld_lines(t).collect()]
    # every line is standalone JSON and the triple multiset survives
    back = set()
    for ln in lines:
        d = _json.loads(ln)
        for k, vs in d.items():
            if k == "@id":
                continue
            for v in vs:
                back.add((d["@id"], k, v))
    assert back == {
        ("https://kg.example.org/e1", "https://kg.example.org/prop/p", "x"),
        ("https://kg.example.org/e1", "https://kg.example.org/prop/q", "y"),
        ("https://kg.example.org/e2", "https://kg.example.org/prop/p", "z"),
    }


def test_turtle_lines_blocks_and_prefixes(spark):
    from kgspark.rdf import turtle_lines

    t = spark.createDataFrame(
        [
            ("ent1", "knows", "ent2-literal"),
            ("ent1", "knows", 'a"b\nc'),
            ("ent1", "https://schema.org/name", "Alice"),
            ("_:b0", "rel", "https://x.example.com/y"),
            ("has space", "p q", "v"),
        ],
        "subj string, pred string, obj string",
    )
    got = {r.line for r in turtle_lines(t).collect()}
    assert "@prefix kg: <https://kg.example.org/> ." in got
    assert "@prefix kgp: <https://kg.example.org/prop/> ." in got
    # objects sorted by rendered term; predicates sorted by rendered term
    # ('<https://schema.org/name>' < 'kgp:knows' in binary order)
    assert (
        'kg:ent1 <https://schema.org/name> "Alice" ; '
        'kgp:knows "a\\"b\\nc", "ent2-literal" .' in got
    )
    assert "_:b0 kgp:rel <https://x.example.com/y> ." in got
    # non-PN_LOCAL names fall back to full IRIs
    assert (
        "<https://kg.example.org/has space> "
        '<https://kg.example.org/prop/p q> "v" .' in got
    )
    assert len(got) == 5


def test_nquads_lines_graph_terms(spark):
    from kgspark.rdf import nquads_lines

    rows = [
        ("a", "p", "lit", "crawl1"),                 # minted graph
        ("b", "p", "lit", "https://g.example/g1"),   # IRI graph
        ("c", "p", "lit", "_:bg"),                   # blank graph
        ("d", "p", "lit", None),                     # default graph
        ("e", "p", "lit", ""),                       # empty = default
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, graph string"
    )
    got = {r.subj: r.line for r in nquads_lines(df).collect()}
    b = "<https://kg.example.org/{}> <https://kg.example.org/prop/p> \"lit\""
    assert got["a"] == b.format("a") + " <https://kg.example.org/graph/crawl1> ."
    assert got["b"] == b.format("b") + " <https://g.example/g1> ."
    assert got["c"] == b.format("c") + " _:bg ."
    # default graph -> plain triple line, no 4th term
    assert got["d"] == b.format("d") + " ."
    assert got["e"] == b.format("e") + " ."
    # ntriples keep_cols passthrough unchanged when unused
    from kgspark.rdf import ntriples_lines
    base = ntriples_lines(df.select("subj", "pred", "obj"))
    assert base.columns == ["subj", "pred", "obj", "line"]


def test_rdf_collection_roundtrip(spark):
    from kgspark.rdf import _RDF_NS, collection_decode, collection_triples

    rows = [
        ("s1", "ex:tags", ["a", "b", "c"]),
        ("s2", "ex:tags", ["solo"]),
        ("s3", "ex:tags", []),          # empty -> (s3, p, rdf:nil)
        ("s1", "ex:alts", ["x", "y"]),  # second list on the same subject
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, items array<string>")
    enc = collection_triples(df)
    tr = enc.collect()
    # head links: one per input row; empty list points at rdf:nil
    heads = {(r.subj, r.pred): r.obj for r in tr
             if not r.pred.endswith(("first", "rest"))}
    assert heads[("s3", "ex:tags")] == _RDF_NS + "nil"
    assert heads[("s1", "ex:tags")].startswith("_:l")
    # chain arithmetic: 3+1+2 cells, each with first+rest
    firsts = [r for r in tr if r.pred == _RDF_NS + "first"]
    rests = [r for r in tr if r.pred == _RDF_NS + "rest"]
    assert len(firsts) == len(rests) == 6
    assert sum(1 for r in rests if r.obj == _RDF_NS + "nil") == 3
    # decode is the exact inverse, order preserved
    dec = {(r.subj, r.pred, r.pos): r.item
           for r in collection_decode(enc).collect()}
    assert dec == {
        ("s1", "ex:tags", 0): "a", ("s1", "ex:tags", 1): "b",
        ("s1", "ex:tags", 2): "c", ("s2", "ex:tags", 0): "solo",
        ("s1", "ex:alts", 0): "x", ("s1", "ex:alts", 1): "y",
    }
    # bounded walk truncates long chains instead of looping
    short = collection_decode(enc, max_len=2).collect()
    assert max(r.pos for r in short) == 1
    # decode of a graph with no collections is an empty typed frame
    none = spark.createDataFrame(
        [("a", "knows", "b")], "subj string, pred string, obj string")
    empty = collection_decode(none)
    assert empty.count() == 0
    assert empty.columns == ["subj", "pred", "pos", "item"]
