"""RDF 1.1 N-Triples serialization — the interchange sink of a KG build.

The reference materializes its graph as a JSON envelope
(knowledge_graph_builder.py:744-768 via json_validator.py); a web-scale
KG additionally needs the line-oriented RDF interchange format every
triple store ingests (W3C RDF 1.1 N-Triples, canonical form §4): one
`<subj> <pred> obj .` line per triple, IRIs in angle brackets, literals
quoted with ECHAR escapes. Line-oriented output is also the
Spark-friendly shape — each row is independent, so the sink is a
map-only select that writes as text with no shuffle.

Escaping is the canonical-form chain (backslash first, then quote and
the control characters) implemented with `replace` column ops — pure
JVM, byte-replicable in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _escape_literal(col: Column) -> Column:
    """ECHAR escapes in canonical order: \\ " \\n \\r \\t (RDF 1.1
    N-Triples §4; backslash must be first or it re-escapes its own
    output)."""
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def _term(col: Column) -> Column:
    """Render an object term: IRIs (http/https) and blank nodes (`_:`)
    pass through as resources; everything else is a quoted literal."""
    is_iri = col.startswith("http://") | col.startswith("https://")
    is_blank = col.startswith("_:")
    return (
        F.when(is_iri, F.concat(F.lit("<"), col, F.lit(">")))
        .when(is_blank, col)
        .otherwise(F.concat(F.lit('"'), _escape_literal(col), F.lit('"')))
    )


def ntriples_lines(triples: DataFrame, subj_col: str = "subj",
                   pred_col: str = "pred", obj_col: str = "obj",
                   base_iri: str = "https://kg.example.org/",
                   pred_base: str = "https://kg.example.org/prop/",
                   keep_cols: tuple = (),
                   ) -> DataFrame:
    """Serialize a (subj, pred, obj) table to canonical N-Triples lines:
    (subj, pred, obj, line). Subjects/objects that are already IRIs or
    blank nodes pass through; bare subject names are minted under
    `base_iri`; predicates are minted under `pred_base` unless already
    IRIs. Objects follow the resource-vs-literal rule of `_term`.

    Map-only column expressions; write the `line` column with
    `df.select("line").write.text(...)` for a shuffle-free sink.
    """
    s = F.col(subj_col)
    s_res = (
        F.when(
            s.startswith("http://") | s.startswith("https://"),
            F.concat(F.lit("<"), s, F.lit(">")),
        )
        .when(s.startswith("_:"), s)
        .otherwise(F.concat(F.lit("<"), F.lit(base_iri), s, F.lit(">")))
    )
    p = F.col(pred_col)
    p_res = F.when(
        p.startswith("http://") | p.startswith("https://"),
        F.concat(F.lit("<"), p, F.lit(">")),
    ).otherwise(F.concat(F.lit("<"), F.lit(pred_base), p, F.lit(">")))
    line = F.concat(
        s_res, F.lit(" "), p_res, F.lit(" "), _term(F.col(obj_col)),
        F.lit(" ."),
    )
    return triples.select(
        F.col(subj_col).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"),
        *[F.col(c) for c in keep_cols],
        line.alias("line"),
    )


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def statement_id(subj: Column, pred: Column, obj: Column) -> Column:
    """Deterministic blank-node statement id: `_:st` + md5 over the terms
    joined with the RS control separator (chr(30) cannot appear in the
    term values the cleaners emit, so the keying is unambiguous)."""
    sep = F.lit("\x1e")
    return F.concat(
        F.lit("_:st"),
        F.md5(F.concat(subj, sep, pred, sep, obj)),
    )


def reify(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    qualifiers: tuple[str, ...] = (),
    qual_base: str = "https://kg.example.org/qual/",
) -> DataFrame:
    """Standard RDF reification (RDF 1.1 Semantics §RDF reification): each
    input triple becomes a blank statement node carrying rdf:type
    rdf:Statement, rdf:subject / rdf:predicate / rdf:object, plus one
    qualifier triple per column named in ``qualifiers`` (cast to string,
    minted under ``qual_base``) — provenance and confidence expressed IN
    RDF, ingestible by any store (the pure-RDF counterpart of this repo's
    triple_provenance rollups).

    Returns a (subj, pred, obj) triple table — feed it to
    :func:`ntriples_lines` for serialization. Statement ids are
    content-keyed (:func:`statement_id`), so re-runs and duplicate
    observations converge on the same node: the output is set-semantics
    distinct. Map-only per row (4 + len(qualifiers) output rows each),
    one final distinct.
    """
    s, p, o = F.col(subj_col), F.col(pred_col), F.col(obj_col)
    st = statement_id(s, p, o)
    parts = [
        triples.select(
            st.alias("subj"),
            F.lit(_RDF_NS + "type").alias("pred"),
            F.lit(_RDF_NS + "Statement").alias("obj"),
        ),
        triples.select(
            st.alias("subj"), F.lit(_RDF_NS + "subject").alias("pred"),
            s.alias("obj"),
        ),
        triples.select(
            st.alias("subj"), F.lit(_RDF_NS + "predicate").alias("pred"),
            p.alias("obj"),
        ),
        triples.select(
            st.alias("subj"), F.lit(_RDF_NS + "object").alias("pred"),
            o.alias("obj"),
        ),
    ]
    for q in qualifiers:
        parts.append(
            triples.select(
                st.alias("subj"),
                F.lit(qual_base + q).alias("pred"),
                F.col(q).cast("string").alias("obj"),
            )
        )
    acc = parts[0]
    for part in parts[1:]:
        acc = acc.unionByName(part)
    return acc.distinct()


def ntriples_star_lines(
    triples: DataFrame,
    qual_pred: str,
    qual_col: str,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    base_iri: str = "https://kg.example.org/",
    pred_base: str = "https://kg.example.org/prop/",
) -> DataFrame:
    """RDF-star statement-level annotation lines (W3C RDF-star CG report
    2021 §2: quoted triples): one

        << <s> <p> o >> <qual_pred> "value" .

    line per input row — the compact alternative to :func:`reify` when
    the consumer speaks RDF-star (Jena, Oxigraph, Stardog). Term
    rendering/minting matches :func:`ntriples_lines`; the annotation
    value comes from ``qual_col`` (cast to string, escaped literal).
    Map-only; returns (subj, pred, obj, line).
    """
    s, p, o = F.col(subj_col), F.col(pred_col), F.col(obj_col)
    s_t = (
        F.when(
            s.startswith("http://") | s.startswith("https://"),
            F.concat(F.lit("<"), s, F.lit(">")),
        )
        .when(s.startswith("_:"), s)
        .otherwise(F.concat(F.lit("<"), F.lit(base_iri), s, F.lit(">")))
    )
    p_t = F.when(
        p.startswith("http://") | p.startswith("https://"),
        F.concat(F.lit("<"), p, F.lit(">")),
    ).otherwise(F.concat(F.lit("<"), F.lit(pred_base), p, F.lit(">")))
    q_t = F.concat(F.lit("<"), F.lit(qual_pred), F.lit(">"))
    v_t = F.concat(F.lit('"'),
                   _escape_literal(F.col(qual_col).cast("string")),
                   F.lit('"'))
    line = F.concat(
        F.lit("<< "), s_t, F.lit(" "), p_t, F.lit(" "), _term(o),
        F.lit(" >> "), q_t, F.lit(" "), v_t, F.lit(" ."),
    )
    return triples.select(
        s.alias("subj"), p.alias("pred"), o.alias("obj"),
        line.alias("line"),
    )


_PN_LOCAL_RE = "^[A-Za-z_][A-Za-z0-9_]*$"


def turtle_lines(triples: DataFrame, subj_col: str = "subj",
                 pred_col: str = "pred", obj_col: str = "obj",
                 base_iri: str = "https://kg.example.org/",
                 pred_base: str = "https://kg.example.org/prop/",
                 ) -> DataFrame:
    """W3C Turtle serialization with prefix compression: one row per
    SUBJECT — `kg:s kgp:p1 "a", "b" ; kgp:p2 <iri> .` — plus two
    `@prefix` header rows (subj = ''). Same term model as
    ntriples_lines (the reference's JSON envelope analogue,
    knowledge_graph_builder.py:744-768): IRIs pass through, blank nodes
    pass through, bare subjects/predicates are minted under kg:/kgp:
    when they are valid PN_LOCAL names (conservative [A-Za-z0-9_]
    subset) and fall back to full IRIs otherwise; non-IRI objects are
    ECHAR-escaped literals.

    Plan: two shuffle levels (subj,pred -> subj), both map-side-combined
    string folds; object lists and predicate lists are sorted arrays, so
    the emitted block is a pure function of the triple SET (any engine
    replicates it). Returns (subj, line).
    """
    s, p = F.col(subj_col), F.col(pred_col)
    sterm = (
        F.when(s.startswith("http://") | s.startswith("https://"),
               F.concat(F.lit("<"), s, F.lit(">")))
        .when(s.startswith("_:"), s)
        .when(s.rlike(_PN_LOCAL_RE), F.concat(F.lit("kg:"), s))
        .otherwise(F.concat(F.lit("<"), F.lit(base_iri), s, F.lit(">")))
    )
    pterm = (
        F.when(p.startswith("http://") | p.startswith("https://"),
               F.concat(F.lit("<"), p, F.lit(">")))
        .when(p.rlike(_PN_LOCAL_RE), F.concat(F.lit("kgp:"), p))
        .otherwise(F.concat(F.lit("<"), F.lit(pred_base), p, F.lit(">")))
    )
    preds = (
        triples.select(
            F.col(subj_col).alias("subj"),
            sterm.alias("sterm"),
            pterm.alias("pterm"),
            _term(F.col(obj_col)).alias("oterm"),
        )
        .groupBy("subj", "sterm", "pterm")
        .agg(F.array_join(
            F.array_sort(F.collect_list("oterm")), ", ").alias("olist"))
    )
    body = (
        preds.groupBy("subj", "sterm")
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pterm", "olist"))),
                lambda t: F.concat(t["pterm"], F.lit(" "), t["olist"]),
            ),
            " ; ",
        ).alias("plist"))
        .select(
            "subj",
            F.concat("sterm", F.lit(" "), "plist", F.lit(" .")).alias("line"),
        )
    )
    hdr = triples.sparkSession.createDataFrame(
        [("", f"@prefix kg: <{base_iri}> ."),
         ("", f"@prefix kgp: <{pred_base}> .")],
        "subj string, line string",
    )
    return hdr.unionByName(body)


def nquads_lines(quads: DataFrame, subj_col: str = "subj",
                 pred_col: str = "pred", obj_col: str = "obj",
                 graph_col: str = "graph",
                 base_iri: str = "https://kg.example.org/",
                 pred_base: str = "https://kg.example.org/prop/",
                 graph_base: str = "https://kg.example.org/graph/",
                 ) -> DataFrame:
    """RDF 1.1 N-Quads: the named-graph serialization — an N-Triples
    statement plus an optional graph-label term before the dot. Graph
    labels that are IRIs or blank nodes pass through, bare names mint
    under `graph_base`, and NULL/empty graph means the DEFAULT graph:
    the line is a plain triple (per the N-Quads spec, where the graph
    term is simply absent). Returns (subj, pred, obj, graph, line);
    map-only, shuffle-free — the provenance-preserving sink for
    multi-source KG builds (one named graph per source/crawl).
    """
    t = quads.select(
        F.col(subj_col).alias("subj"), F.col(pred_col).alias("pred"),
        F.col(obj_col).alias("obj"), F.col(graph_col).alias("graph"),
    )
    base = ntriples_lines(
        t, base_iri=base_iri, pred_base=pred_base,
        keep_cols=("graph",),
    ).withColumn("__stmt",
                 F.expr("substring(line, 1, length(line) - 2)"))
    g = F.coalesce(F.col("graph"), F.lit(""))
    g_res = (
        F.when(g == "", F.lit(""))
        .when(
            g.startswith("http://") | g.startswith("https://"),
            F.concat(F.lit(" <"), g, F.lit(">")),
        )
        .when(g.startswith("_:"), F.concat(F.lit(" "), g))
        .otherwise(F.concat(F.lit(" <"), F.lit(graph_base), g,
                            F.lit(">")))
    )
    return base.select(
        "subj", "pred", "obj", "graph",
        F.concat(F.col("__stmt"), g_res, F.lit(" .")).alias("line"),
    )


def collection_triples(
    df: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    items_col: str = "items",
) -> DataFrame:
    """Encode an array column as an RDF Collection (the rdf:first /
    rdf:rest / rdf:nil linked list, RDF 1.1 Concepts §5.2) — THE spec
    mechanism for ordered values, which plain repeated predicates
    cannot express. Completes the rdf.py serialization layer
    (ntriples/turtle/nquads/reify/star) with ordered containers.

    Cell labels are deterministic blank nodes
    `_:l` + md5(subj|pred|index) (the statement_id posture), so the
    encoding is engine-replicable and collision-free per (subj, pred)
    list. An empty array encodes as (subj, pred, rdf:nil) — the spec's
    empty collection. Map-only: one posexplode, three projected arms,
    no shuffle.

    Emits (subj, pred, obj) triples: the head link plus per-cell
    rdf:first / rdf:rest chains.
    """
    first = F.lit(_RDF_NS + "first")
    rest = F.lit(_RDF_NS + "rest")
    nil = _RDF_NS + "nil"
    s, p = F.col(subj_col), F.col(pred_col)

    def cell(i):
        return F.concat(
            F.lit("_:l"),
            F.md5(F.concat(s, F.lit("|"), p, F.lit("|"),
                           i.cast("string"))),
        )

    n = F.size(F.col(items_col))
    head = df.select(
        s.alias("subj"), p.alias("pred"),
        F.when(n == 0, F.lit(nil)).otherwise(cell(F.lit(0)))
        .alias("obj"),
    )
    ex = df.select(
        s.alias("__s"), p.alias("__p"), n.alias("__n"),
        F.posexplode(items_col).alias("i", "item"),
    )
    sx, px = F.col("__s"), F.col("__p")

    def cellx(i):
        return F.concat(
            F.lit("_:l"),
            F.md5(F.concat(sx, F.lit("|"), px, F.lit("|"),
                           i.cast("string"))),
        )

    firsts = ex.select(
        cellx(F.col("i")).alias("subj"), first.alias("pred"),
        F.col("item").alias("obj"),
    )
    rests = ex.select(
        cellx(F.col("i")).alias("subj"), rest.alias("pred"),
        F.when(F.col("i") == F.col("__n") - 1, F.lit(nil))
        .otherwise(cellx(F.col("i") + 1)).alias("obj"),
    )
    return head.unionByName(firsts).unionByName(rests)


def collection_decode(
    triples: DataFrame,
    max_len: int = 32,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Decode RDF Collections back to positional rows (subj, pred, pos,
    item) — the bounded chain walk inverse of collection_triples:
    round k joins every live cursor to its cell's rdf:first (emit) and
    rdf:rest (advance), so ALL lists across the whole graph advance in
    lockstep and `pos` is just the round number. Chains longer than
    `max_len` truncate (the bounded-rounds posture: k-hop joins, never
    a recursive driver loop per list); cycles cannot trap the walk for
    the same reason. Round-trip identity decode(encode(x)) == x is the
    pytest contract.

    Scale shape: `max_len` hash joins on the cell key, frontier
    monotonically shrinking as lists end; first/rest link tables are
    built once.
    """
    from kgspark.session import materialize

    first = _RDF_NS + "first"
    rest = _RDF_NS + "rest"
    nil = _RDF_NS + "nil"
    s, p, o = F.col(subj_col), F.col(pred_col), F.col(obj_col)
    firsts = materialize(
        triples.where(p == first).select(
            s.alias("cell"), o.alias("item"))
    )
    rests = materialize(
        triples.where(p == rest).select(s.alias("cell"), o.alias("nxt"))
    )
    cur = materialize(
        triples.where((p != first) & (p != rest) & (o != nil))
        .select(s.alias("subj"), p.alias("pred"), o.alias("cell"))
    )
    out = None
    for k in range(max_len):
        if cur.isEmpty():
            break
        got = cur.join(firsts, "cell").select(
            "subj", "pred", F.lit(k).cast("long").alias("pos"), "item"
        )
        out = got if out is None else out.unionByName(got)
        cur = materialize(
            cur.join(rests, "cell")
            .where(F.col("nxt") != nil)
            .select("subj", "pred", F.col("nxt").alias("cell"))
        )
    if out is None:
        schema = "subj string, pred string, pos long, item string"
        return triples.sparkSession.createDataFrame([], schema)
    return out
