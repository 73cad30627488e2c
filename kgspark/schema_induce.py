"""Dynamic schema induction from nested JSON (ref create_dynamic_schema,
/root/reference/knowledge_graph_builder.py:408-427 — dead code in the
reference's build path, implemented as API surface per SURVEY.md §7.4.6).

Reference semantics, distributed: walk each JSON document's nesting and
accumulate DISTINCT
  classes        every dict key, Title-cased
  relationships  (Parent, hasChild, Child) for nested dicts
  properties     (Parent, python-type-name) for scalar leaves
The per-document walk runs in an Arrow-batched pandas UDF emitting
(kind, a, b) rows; global distinct is one shuffle (ref's set-accumulation as
a relational op, SURVEY.md A10/Set3)."""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

_ROW = StructType(
    [
        StructField("kind", StringType()),  # class | relationship | property
        StructField("a", StringType()),
        StructField("rel", StringType()),
        StructField("b", StringType()),
    ]
)

# python-type names matching the reference's str(type(value).__name__)
_TYPE_NAMES = {bool: "bool", int: "int", float: "float", str: "str",
               type(None): "NoneType"}


def analyze_document(json_text: str) -> list[dict]:
    """One JSON document -> schema observation rows (ref :412-426)."""
    try:
        data = json.loads(json_text) if isinstance(json_text, str) else None
    except (ValueError, TypeError):
        return []
    if data is None:
        return []
    out: list[dict] = []

    def walk(value, parent_key=None):
        if isinstance(value, dict):
            for k, v in value.items():
                out.append({"kind": "class", "a": k.title(), "rel": None, "b": None})
                if parent_key:
                    out.append({
                        "kind": "relationship", "a": parent_key.title(),
                        "rel": "has" + k.title(), "b": k.title(),
                    })
                walk(v, k)
        elif isinstance(value, list):
            for item in value:
                walk(item, parent_key)
        else:
            if parent_key:
                out.append({
                    "kind": "property", "a": parent_key.title(),
                    "rel": None,
                    "b": _TYPE_NAMES.get(type(value), type(value).__name__),
                })

    walk(data)
    return out


@pandas_udf(ArrayType(_ROW))
def _analyze_udf(texts: pd.Series) -> pd.Series:
    return texts.map(analyze_document)


def induce_schema(df: DataFrame, json_col: str = "raw_json") -> DataFrame:
    """documents of JSON text -> distinct (kind, a, rel, b) schema rows."""
    return (
        df.select(F.explode(_analyze_udf(F.col(json_col))).alias("r"))
        .select("r.kind", "r.a", "r.rel", "r.b")
        .distinct()
    )


def shape_report(
    triples: DataFrame,
    shapes: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    kind_col: str = "kind",
    max_card_col: str = "max_per_subj",
) -> DataFrame:
    """SHACL-lite shape validation census: per shaped predicate, how many
    assertions conform to the declared object kind and how many subjects
    exceed the declared per-subject cardinality -> (pred, n_triples,
    n_type_bad, n_subj, n_subj_over_card). Object kinds are detected
    syntactically: 'int' = all-digits, 'iri' = http(s) scheme, 'text' =
    anything else (the W3C SHACL datatype/maxCount constraint pair,
    reduced to the lexical checks a string triple store can make).
    Unshaped predicates are not reported — shapes drive the audit.

    The shape table is schema-sized and broadcasts; the two censuses are
    partial-aggregated groupBys ((pred) and (pred, subj)) joined on the
    predicate-sized result.
    """
    detected = (
        F.when(F.col(obj_col).rlike("^[0-9]+$"), F.lit("int"))
        .when(
            F.col(obj_col).startswith("http://")
            | F.col(obj_col).startswith("https://"),
            F.lit("iri"),
        )
        .otherwise(F.lit("text"))
    )
    j = triples.join(
        F.broadcast(
            shapes.select(
                F.col(pred_col).alias("__p"),
                F.col(kind_col).alias("__kind"),
                F.col(max_card_col).alias("__maxc"),
            )
        ),
        triples[pred_col] == F.col("__p"),
    ).select(
        F.col(subj_col).alias("subj"), F.col("__p").alias("pred"),
        (detected != F.col("__kind")).cast("int").alias("__bad"),
        F.col("__maxc").alias("__maxc"),
    )
    by_pred = j.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.sum("__bad").cast("long").alias("n_type_bad"),
    )
    by_subj = (
        j.groupBy("pred", "subj")
        .agg(F.count(F.lit(1)).alias("__n"), F.max("__maxc").alias("__maxc"))
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subj"),
            F.sum(F.when(F.col("__n") > F.col("__maxc"), 1).otherwise(0))
            .cast("long").alias("n_subj_over_card"),
        )
    )
    return by_pred.join(by_subj, "pred")


def align_classes(
    typing_a: DataFrame,
    typing_b: DataFrame,
    min_overlap: int = 2,
    instance: str = "instance",
    cls: str = "cls",
) -> DataFrame:
    """Extensional ontology alignment (Euzenat & Shvaiko, *Ontology
    Matching*, ch. 5: extension-based techniques): match the classes of
    two independently induced typings over a SHARED instance space by
    instance-set overlap.

    typing_a / typing_b: (instance, cls) membership tables (an instance
    may carry several classes). For every class pair sharing at least
    ``min_overlap`` instances the output row carries exact-integer
    evidence: (cls_a, cls_b, n_a, n_b, n_common, jaccard_ppm, verdict)
    with jaccard_ppm = 1e6 * |A∩B| // (|A| + |B| - |A∩B|) and verdict
    `equivalent` (A = B as sets), `a_in_b` / `b_in_a` (subsumption), or
    `overlap`. Label-based matching composes separately (fuzzy.py
    SymSpell over class names); this op is the extensional leg.

    Plan: one join on the instance key -> pair counts (partial aggregation
    before the pair shuffle), class sizes broadcast back — candidate pairs
    are only those that genuinely co-occur on an instance, never the
    |A| x |B| class product.
    """
    a = typing_a.select(
        F.col(instance).alias("i"), F.col(cls).alias("cls_a")
    ).distinct()
    b = typing_b.select(
        F.col(instance).alias("i"), F.col(cls).alias("cls_b")
    ).distinct()
    na = a.groupBy("cls_a").agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = b.groupBy("cls_b").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    inter = (
        a.join(b, "i")
        .groupBy("cls_a", "cls_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .where(F.col("n_common") >= min_overlap)
    )
    out = inter.join(na, "cls_a").join(nb, "cls_b")
    verdict = (
        F.when(
            (F.col("n_common") == F.col("n_a"))
            & (F.col("n_common") == F.col("n_b")),
            F.lit("equivalent"),
        )
        .when(F.col("n_common") == F.col("n_a"), F.lit("a_in_b"))
        .when(F.col("n_common") == F.col("n_b"), F.lit("b_in_a"))
        .otherwise(F.lit("overlap"))
    )
    return out.select(
        "cls_a", "cls_b", "n_a", "n_b", "n_common",
        F.expr("(1000000 * n_common) div (n_a + n_b - n_common)")
        .cast("long").alias("jaccard_ppm"),
        verdict.alias("verdict"),
    )


def fd_mine(
    triples: DataFrame,
    min_support: int = 10,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Unary functional-dependency discovery between predicates (TANE's
    g3 error, Huhtala et al. 1999, restated for SPO data): for an ordered
    predicate pair (p, q), does a subject's p-value determine its
    q-value?

    Evidence tuples are the subject-joined value pairs (v_p, v_q); the
    dependency confidence is the g3 ratio

        fd_ppm = 1e6 * sum over v_p-groups of max single-v_q count
                 // n_pairs

    — exactly 1e6 iff the FD holds, and the complement is the minimum
    fraction of tuples to delete to make it hold. Multi-valued
    predicates contribute their value cross product, the standard
    binary-relation reading. Pairs with fewer than ``min_support``
    evidence tuples are dropped (an FD 'holding' over 3 rows is noise).

    Returns (p, q, n_pairs, n_groups, n_kept, fd_ppm) for p != q.
    Complements the existing schema miners: cardinality profiles say how
    MANY values a predicate takes, quasi-IFP finds KEY-like predicates,
    AMIE mines compositional rules — fd_mine finds value-level
    determinations (e.g. brand -> type) that drive normalization and
    error detection.

    Plan: one subject-key self-join bounded by per-subject schema width,
    then three keyed aggregations — no windows, no driver loops.
    """
    r = triples.select(
        F.col(subj).alias("_s"), F.col(pred).alias("_p"),
        F.col(obj).alias("_v"),
    ).distinct()
    pairs = (
        r.alias("a")
        .join(r.alias("b"),
              (F.col("a._s") == F.col("b._s"))
              & (F.col("a._p") != F.col("b._p")))
        .select(
            F.col("a._p").alias("p"), F.col("b._p").alias("q"),
            F.col("a._v").alias("vp"), F.col("b._v").alias("vq"),
        )
    )
    cell = pairs.groupBy("p", "q", "vp", "vq").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    grp = cell.groupBy("p", "q", "vp").agg(
        F.max("c").cast("long").alias("keep"),
        F.sum("c").cast("long").alias("tot"),
    )
    out = grp.groupBy("p", "q").agg(
        F.sum("tot").cast("long").alias("n_pairs"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("keep").cast("long").alias("n_kept"),
    ).where(F.col("n_pairs") >= min_support)
    return out.select(
        "p", "q", "n_pairs", "n_groups", "n_kept",
        F.expr("(1000000 * n_kept) div n_pairs").cast("long")
        .alias("fd_ppm"),
    )


def datatype_profile(
    triples: DataFrame,
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Per-predicate literal datatype census — which range a predicate's
    objects actually inhabit (the xsd-typing step of ontology induction:
    a predicate that is 99% integer wants xsd:integer in the induced
    schema; a mixed one wants a cleanup rule first). Complements
    domain_range (kgspark.graph_algs), which types ENTITY endpoints via
    is_a — this types LITERAL endpoints by lexical form.

    Classes are disjoint ASCII regexes evaluated in priority order
    (int, decimal, date, bool, everything else = str) — the Java∩RE2
    regex subset, so the census is engine-stable; no locale- or
    engine-dependent TRY_CAST parsing is involved. Emits (pred, n,
    n_int, n_decimal, n_date, n_bool, n_str, major) where major is the
    modal class with the fixed tiebreak order int > decimal > date >
    bool > str.

    Scale shape: map-only classification (JVM regex columns) + one
    pred-keyed partial-agg rollup; the pred dimension is tiny.
    """
    o = F.coalesce(F.col(obj_col), F.lit(""))
    is_int = o.rlike("^-?[0-9]+$")
    is_dec = o.rlike("^-?[0-9]+[.][0-9]+$")
    is_date = o.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
    is_bool = o.isin("true", "false")
    cls = (
        F.when(is_int, "int")
        .when(is_dec, "decimal")
        .when(is_date, "date")
        .when(is_bool, "bool")
        .otherwise("str")
    )
    g = (
        triples.select(F.col(pred_col).alias("pred"), cls.alias("__c"))
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            *[
                F.sum(F.when(F.col("__c") == c, 1).otherwise(0))
                .cast("long").alias(f"n_{c}")
                for c in ("int", "decimal", "date", "bool", "str")
            ],
        )
    )
    major = (
        F.when(
            (F.col("n_int") >= F.col("n_decimal"))
            & (F.col("n_int") >= F.col("n_date"))
            & (F.col("n_int") >= F.col("n_bool"))
            & (F.col("n_int") >= F.col("n_str")), "int")
        .when(
            (F.col("n_decimal") >= F.col("n_date"))
            & (F.col("n_decimal") >= F.col("n_bool"))
            & (F.col("n_decimal") >= F.col("n_str")), "decimal")
        .when(
            (F.col("n_date") >= F.col("n_bool"))
            & (F.col("n_date") >= F.col("n_str")), "date")
        .when(F.col("n_bool") >= F.col("n_str"), "bool")
        .otherwise("str")
    )
    return g.select(
        "pred", "n", "n_int", "n_decimal", "n_date", "n_bool", "n_str",
        major.alias("major"),
    )


def inclusion_deps(
    cols: list[tuple[str, DataFrame, str]],
    min_containment_ppm: int = 0,
) -> DataFrame:
    """Inclusion-dependency (foreign-key candidate) discovery across
    tables (De Marchi 2002 / SINDY, Kruse et al. 2015 — the
    data-profiling step behind join-graph inference): for every
    ordered column pair (A, B), containment_ppm =
    |distinct(A) ∩ distinct(B)| * 1e6 div |distinct(A)| — 1e6 means
    A ⊆ B, an FK candidate. `cols` is [(label, df, column), ...];
    values compare after a string cast (the unary SINDY encoding, so
    BIGINT 5 and VARCHAR '5' unify — document-level type profiling is
    datatype_profile's job). Pairs sharing no value are omitted.

    Scale shape: one distinct per column unioned into a single
    (column_id, value) table — ONE shuffle keyed on value does all
    pairwise intersections at once (the SINDY trick: cost is value
    multiplicity squared in columns-per-value, bounded by the column
    count, never |A| x |B|). Sizes are a tiny per-column aggregate
    joined back broadcast.

    Returns (col_a, col_b, n_a, n_common, containment_ppm).
    """
    from kgspark.session import materialize

    if len(cols) < 2:
        raise ValueError("inclusion_deps: need at least 2 columns")
    labels = [lb for lb, _, _ in cols]
    if len(set(labels)) != len(labels):
        raise ValueError("inclusion_deps: duplicate column labels")
    parts = [
        df.select(
            F.lit(label).alias("cid"),
            F.col(c).cast("string").alias("v"),
        ).where(F.col("v").isNotNull()).distinct()
        for label, df, c in cols
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u = materialize(u)
    sizes = u.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n"))
    pairs = (
        u.select(F.col("cid").alias("ca"), "v")
        .join(u.select(F.col("cid").alias("cb"), "v"), "v")
        .where(F.col("ca") != F.col("cb"))
        .groupBy("ca", "cb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.withColumnsRenamed({"cid": "ca", "n": "n_a"})),
            "ca",
        )
        .select(
            F.col("ca").alias("col_a"), F.col("cb").alias("col_b"),
            "n_a", "n_common",
            F.expr("n_common * 1000000L div n_a").cast("long")
            .alias("containment_ppm"),
        )
        .where(F.col("containment_ppm") >= min_containment_ppm)
    )


def ucc_discover(df: DataFrame, cols: list[str]) -> DataFrame:
    """Unique-column-combination (candidate-key) discovery up to size 2
    — the profiling complement to fd_mine (FDs) and inclusion_deps
    (foreign keys): a combo is a key candidate iff its distinct count
    equals the row count (Heise et al., DUCC, PVLDB 2013 — here the
    bounded-lattice slice: all singles + all pairs of the pinned
    `cols`).

    One wide shuffle does every combo at once: each row EXPLODES into
    one (combo, key) pair per combo — the same one-pass posture as
    inclusion_deps' value-keyed shuffle — then a single distinct +
    count-by-combo. NULLs participate as a sentinel value (SQL
    UNIQUE-constraint semantics would skip them; profiling wants them
    counted), and pair keys join on an \\x1f separator over
    string-casts, which only needs per-engine injectivity, never
    cross-engine byte equality.

    Emits (combo, n_distinct, n_rows, ratio_ppm, is_unique,
    is_minimal): a pair is minimal iff unique and neither member is
    unique alone.

    Scale shape: the exploded stream is |cols|+C(|cols|,2) × rows —
    map-side partial distinct collapses it before the exchange; at a
    wider lattice you'd prune supersets of discovered keys between
    levels (the DUCC walk) instead of exploding every level.
    """
    from itertools import combinations

    if len(cols) < 2:
        raise ValueError("ucc_discover needs >= 2 columns")
    sep = F.lit("\x1f")

    def key_of(c):
        return F.coalesce(F.col(c).cast("string"), F.lit("<NULL>"))

    entries = [(c, key_of(c)) for c in cols]
    entries += [
        (f"{a},{b}", F.concat(key_of(a), sep, key_of(b)))
        for a, b in combinations(cols, 2)
    ]
    kv = df.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(cid).alias("combo"), k.alias("k"))
                for cid, k in entries
            ])
        ).alias("e")
    ).select("e.*")
    per = kv.distinct().groupBy("combo").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
    nrows = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    base = per.crossJoin(F.broadcast(nrows))
    singles = base.where(~F.col("combo").contains(",")).select(
        F.col("combo").alias("m"),
        (F.col("n_distinct") == F.col("n_rows")).alias("mu"),
    )
    parts = F.split("combo", ",")
    out = (
        base.withColumn("a", parts[0])
        .withColumn(
            "b", F.when(F.size(parts) > 1, parts[1])
        )
        .join(
            F.broadcast(singles.withColumnsRenamed({"m": "a", "mu": "ua"})),
            "a", "left",
        )
        .join(
            F.broadcast(singles.withColumnsRenamed({"m": "b", "mu": "ub"})),
            "b", "left",
        )
    )
    uniq = F.col("n_distinct") == F.col("n_rows")
    minimal = F.when(
        F.col("b").isNull(), uniq
    ).otherwise(uniq & ~F.col("ua") & ~F.col("ub"))
    return out.select(
        "combo", "n_distinct", "n_rows",
        F.expr("(n_distinct * 1000000L) div n_rows")
        .cast("long").alias("ratio_ppm"),
        uniq.cast("int").alias("is_unique"),
        minimal.cast("int").alias("is_minimal"),
    )


def profile_columns(
    df: DataFrame,
    cols: list[str],
    top_k: int = 5,
) -> DataFrame:
    """Relational column profiler — the Deequ/crawler primitive a
    pipeline runs before trusting a new table: one row per profiled
    column with (n, n_null, ndv, min_v, max_v, top_values), all over
    the STRING-cast value space so the report is type-uniform and the
    hash-oracle never sees an unhashable array (top_values is the
    rank-ordered "value:count|value:count|…" string — the list-column
    canonicalization pin).

    ndv/min/max/top-k are EXACT (this is a profiler, not a sketch —
    the sketch family in kgspark/sketch.py covers the approximate
    tier). Pins: ranks by (count desc, value asc); NULLs count into
    n_null only and never into ndv/min/max/top.

    Scale shape (the SINDY posture): every column's values melt into
    ONE exploded (col_name, value) stream in a single scan, so one
    value-keyed groupBy computes every column's per-value counts and
    one column-keyed aggregate folds the stats — two shuffles total
    regardless of how many columns are profiled. Per-value state is
    the distinct-value space, not the row count.
    """
    from pyspark.sql import Window

    melted = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.col(c).cast("string").alias("v"),
                )
                for c in cols
            ])
        ).alias("m")
    ).select("m.col_name", "m.v")
    per_value = melted.groupBy("col_name", "v").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    nulls = (
        per_value.where(F.col("v").isNull())
        .select("col_name", F.col("cnt").alias("n_null"))
    )
    vals = per_value.where(F.col("v").isNotNull())
    w = Window.partitionBy("col_name").orderBy(
        F.desc("cnt"), F.asc("v")
    )
    ranked = vals.withColumn("rk", F.row_number().over(w))
    stats = vals.groupBy("col_name").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("ndv"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    top = (
        ranked.where(F.col("rk") <= top_k)
        .groupBy("col_name")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("rk",
                                     F.concat_ws(":", "v", "cnt")
                                     .alias("s"))
                        )
                    ),
                    lambda x: x["s"],
                ),
                "|",
            ).alias("top_values")
        )
    )
    base = per_value.select("col_name").distinct()
    return (
        base.join(stats, "col_name", "left")
        .join(nulls, "col_name", "left")
        .join(top, "col_name", "left")
        .select(
            "col_name",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.coalesce("n_null", F.lit(0)).cast("long").alias("n_null"),
            F.coalesce("ndv", F.lit(0)).cast("long").alias("ndv"),
            # '' sentinels: NULL output cells break the driver's
            # pandas sort canonicalization (all-null-column case)
            F.coalesce("min_v", F.lit("")).alias("min_v"),
            F.coalesce("max_v", F.lit("")).alias("max_v"),
            F.coalesce("top_values", F.lit("")).alias("top_values"),
        )
    )


def expect_checks(
    df: DataFrame,
    checks: list[dict],
) -> DataFrame:
    """Deequ-style declarative data-quality gate — the expectations
    runner a pipeline puts in front of training after
    :func:`profile_columns` told it what the table looks like. Each
    check is a dict: {"name": ..., "col": ..., "kind": ...} with kind-
    specific params:

      not_null                 value IS NOT NULL
      unique                   no value (incl. NULL) occurs twice
      min / max (long)         numeric bounds, NULL violates
      in_set  (values: list)   membership, NULL violates
      matches (pattern: str)   Java∩RE2∩DuckDB regex full-ish match
                               via rlike, NULL violates

    Returns one row per check: (name, col, kind, n_rows, n_bad,
    pass_flag) with exact integer counts — a report, not an exception,
    so a 100 TB job records quality instead of dying on row one.

    Scale shape: every row-level check folds in ONE map-side aggregate
    pass over the table (a conditional sum per check — no joins, no
    shuffle beyond the 1-row reduce); each `unique` check adds one
    value-keyed groupBy (the unavoidable shuffle for a distinctness
    claim). Check list is schema-sized.
    """
    spark = df.sparkSession
    n_rows = df.count()
    row_aggs = []
    row_meta = []
    uniq_results = []
    for c in checks:
        name, col, kind = c["name"], c["col"], c["kind"]
        v = F.col(col)
        if kind == "not_null":
            bad = v.isNull()
        elif kind == "min":
            bad = v.isNull() | (v < F.lit(int(c["value"])))
        elif kind == "max":
            bad = v.isNull() | (v > F.lit(int(c["value"])))
        elif kind == "in_set":
            bad = v.isNull() | ~v.isin(list(c["values"]))
        elif kind == "matches":
            bad = v.isNull() | ~v.rlike(c["pattern"])
        elif kind == "unique":
            dup = (
                df.groupBy(v.alias("__v"))
                .agg(F.count(F.lit(1)).alias("__n"))
                .where(F.col("__n") > 1)
                .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("long")
                     .alias("n_bad"))
                .collect()[0]["n_bad"]
            )
            uniq_results.append((name, col, kind, int(dup)))
            continue
        else:
            raise ValueError(f"expect_checks: unknown kind {kind!r}")
        row_meta.append((name, col, kind))
        row_aggs.append(
            F.sum(F.when(bad, 1).otherwise(0)).cast("long")
            .alias(f"__c{len(row_aggs)}")
        )
    rows = []
    if row_aggs:
        agg_row = df.agg(*row_aggs).collect()[0]
        for i, (name, col, kind) in enumerate(row_meta):
            nb = int(agg_row[f"__c{i}"] or 0)
            rows.append((name, col, kind, n_rows, nb, int(nb == 0)))
    for name, col, kind, nb in uniq_results:
        rows.append((name, col, kind, n_rows, nb, int(nb == 0)))
    return spark.createDataFrame(
        rows,
        "name string, col string, kind string, n_rows long,"
        " n_bad long, pass_flag int",
    )
