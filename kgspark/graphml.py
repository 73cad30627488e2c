"""GraphML export — the property-graph interchange sink.

The reference ships its graph to a vendored HTML/JS viewer (ref
/root/reference/knowledge_graph_builder.py:744-768 + static assets); the
interchange format that graph TOOLS (Gephi, yEd, NetworkX, igraph) ingest
is GraphML (graphml.graphdrawing.org, the XML schema). This sink emits
the document as a deterministic LINE TABLE — (section, sort_key, line) —
so the write stays distributed and shuffle-free: every row is computed
map-only from one edge/node, and a consumer materializes the file with
``orderBy("section", "sort_key").write.text(...)`` (or streams sections
separately at scale; the XML frame is 6 constant lines).

XML escaping is the canonical chain (& first, then < > " ') with
``replace`` column ops — pure JVM, byte-replicable in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>',
    '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
    '<key id="label" for="edge" attr.name="label" attr.type="string"/>',
    '<key id="weight" for="edge" attr.name="weight" attr.type="long"/>',
    '<graph id="G" edgedefault="directed">',
)
_FOOTER = ("</graph>", "</graphml>")


def xml_escape(col: Column) -> Column:
    """Canonical XML escape chain: & must go first or it re-escapes its
    own output; " and ' are escaped so values are attribute-safe."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    c = F.replace(c, F.lit(">"), F.lit("&gt;"))
    c = F.replace(c, F.lit('"'), F.lit("&quot;"))
    c = F.replace(c, F.lit("'"), F.lit("&apos;"))
    return c


def graphml_lines(
    edges: DataFrame,
    src: str = "subj",
    label: str = "pred",
    dst: str = "obj",
    weight: str | None = None,
) -> DataFrame:
    """Serialize a directed edge table to GraphML document lines.

    Returns (section, sort_key, line): section 0 = the 5 header lines,
    1 = one ``<node id=".."/>`` per distinct endpoint, 2 = one
    ``<edge source=".." target=".."><data key="label">..</data></edge>``
    per distinct edge (plus a weight ``<data>`` when ``weight`` names a
    column — pass an INTEGER column; float-to-string formatting is not
    portable), 3 = the 2 footer lines. Ordering by (section, sort_key)
    yields a valid, canonical document; the table itself is unordered and
    each row derives from one input row (map-only, no shuffle beyond the
    endpoint distinct).
    """
    sess = edges.sparkSession
    hdr = sess.createDataFrame(
        [(0, f"{i:02d}", ln) for i, ln in enumerate(_HEADER)]
        + [(3, f"{i:02d}", ln) for i, ln in enumerate(_FOOTER)],
        "section int, sort_key string, line string",
    )
    e = edges.select(
        xml_escape(F.col(src).cast("string")).alias("_s"),
        xml_escape(F.col(label).cast("string")).alias("_l"),
        xml_escape(F.col(dst).cast("string")).alias("_d"),
        *(
            [F.col(weight).cast("long").cast("string").alias("_w")]
            if weight else []
        ),
    ).distinct()
    nodes = (
        e.select(F.col("_s").alias("id"))
        .union(e.select(F.col("_d").alias("id")))
        .distinct()
        .select(
            F.lit(1).alias("section"),
            F.col("id").alias("sort_key"),
            F.concat(F.lit('<node id="'), F.col("id"), F.lit('"/>'))
            .alias("line"),
        )
    )
    w_part = (
        [F.lit('<data key="weight">'), F.col("_w"), F.lit("</data>")]
        if weight else []
    )
    edge_lines = e.select(
        F.lit(2).alias("section"),
        F.concat("_s", "_l", "_d").alias("sort_key"),
        F.concat(
            F.lit('<edge source="'), F.col("_s"),
            F.lit('" target="'), F.col("_d"), F.lit('">'),
            F.lit('<data key="label">'), F.col("_l"), F.lit("</data>"),
            *w_part,
            F.lit("</edge>"),
        ).alias("line"),
    )
    return hdr.unionByName(nodes).unionByName(edge_lines)
