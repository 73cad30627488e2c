"""Graph read API — the reference's query surface over the triples table.

The reference's rdflib store is never populated, so its `query_graph` always
returns [] (ref /root/reference/knowledge_graph_builder.py:27, 675-686); we
implement the DECLARED semantics against the real triples DataFrame
(SURVEY.md §7.4.2). Secondary APIs: node history (:688-715), relationship
confidence (:717-723), relationship validation (:725-738).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.session import materialize


def query_graph(triples: DataFrame, query: str) -> DataFrame:
    """Case-insensitive substring match on subject OR object (ref :679-686),
    projected as (subject, relation, object)."""
    q = query.lower()
    return triples.where(
        F.lower(F.col("subj")).contains(q) | F.lower(F.col("obj")).contains(q)
    ).select(
        F.col("subj").alias("subject"),
        F.col("pred").alias("relation"),
        F.col("obj").alias("object"),
    )


import re as _re

_PATH_RE = _re.compile(
    r"^(\^?)(!?)([^+*{}|^?!]+(?:\|[^+*{}|^?!]+)*)"
    r"(\+|\*|\?|\{(\d+),(\d+)\})?$"
)


def _is_var(t: str) -> bool:
    return isinstance(t, str) and t.startswith("?")


def _pred_rel(
    triples: DataFrame, p_t: str, subj: str, pred: str, obj: str,
    max_path_hops: int,
    s_const: str | None = None,
    o_const: str | None = None,
) -> tuple[DataFrame, bool]:
    """Compile a predicate TERM into a relation.

    Returns (df, has_pred_col). Simple constants / variables keep the raw
    triples columns (has_pred_col=True). SPARQL-1.1 property-path subset —
    ``^p`` inverse, ``a|b`` alternation, ``p+`` / ``p{m,n}`` bounded-length
    paths — compiles to a two-column (subj, obj) endpoint relation
    (has_pred_col=False). Paths are BOUNDED (``+`` means 1..max_path_hops,
    the repo-wide bounded-closure posture: true Kleene closure depth is
    data-dependent and unbounded, a non-starter for a deterministic
    distributed job); each extra hop is one distinct self-join, so the plan
    is max_hops shuffles over the (deduplicated) pair set — never a
    materialized path table.

    s_const / o_const: the pattern's CONSTANT endpoints, if any. A path
    closure with a constant endpoint is seeded from that endpoint (forward
    from the subject, or over reversed edges from the object) so the
    frontier only ever holds pairs reachable from the constant — at scale
    the difference between a node neighbourhood and the full transitive
    closure. The caller re-applies the endpoint equality afterwards, so
    seeding is purely a pruning step.
    """
    if _is_var(p_t):
        return triples, True
    if "/" in p_t:
        # SPARQL sequence path a/b/...: compose segment endpoint
        # relations left-to-right with joins on the chain variable.
        # Constant-endpoint seeding propagates into the outermost
        # segments only (the inner frontier is already bounded by the
        # composition joins); variables cannot appear inside a path.
        segs = [s for s in p_t.split("/") if s]
        if len(segs) < 2:
            raise ValueError(f"bgp_match: bad sequence path {p_t!r}")
        rel = None
        for i, seg in enumerate(segs):
            if _is_var(seg):
                raise ValueError(
                    f"bgp_match: variable segment in sequence path {p_t!r}"
                )
            df, has_pred = _pred_rel(
                triples, seg, subj, pred, obj, max_path_hops,
                s_const=s_const if i == 0 else None,
                o_const=o_const if i == len(segs) - 1 else None,
            )
            step = df.select(
                F.col(subj).alias("s"), F.col(obj).alias("o")
            ).distinct()
            if rel is None:
                rel = step
            else:
                rel = (
                    rel.join(
                        step.select(
                            F.col("s").alias("o"),
                            F.col("o").alias("__o2"),
                        ),
                        "o",
                    )
                    .select("s", F.col("__o2").alias("o"))
                    .distinct()
                )
        return (
            rel.select(F.col("s").alias(subj), F.col("o").alias(obj)),
            False,
        )
    m = _PATH_RE.match(p_t)
    if not m:
        raise ValueError(f"bgp_match: cannot parse predicate term {p_t!r}")
    inv, neg, alts, path_suffix = (
        m.group(1), m.group(2), m.group(3).split("|"), m.group(4)
    )
    if neg:
        # SPARQL 1.1 negated property set !(a|b): any predicate OUTSIDE
        # the set, one hop only (a negated closure is unbounded by
        # construction — rejected, the bounded-closure posture)
        if path_suffix:
            raise ValueError(
                f"bgp_match: negated property set cannot take a path "
                f"suffix: {p_t!r}"
            )
        df = triples.where(~F.col(pred).isin(alts))
        s_col, o_col = (obj, subj) if inv else (subj, obj)
        return (
            df.select(F.col(s_col).alias(subj), F.col(o_col).alias(obj)),
            False,
        )
    if len(alts) == 1:
        df = triples.where(F.col(pred) == F.lit(alts[0]))
    else:
        df = triples.where(F.col(pred).isin(alts))
    s_col, o_col = (obj, subj) if inv else (subj, obj)
    if not path_suffix:
        if inv or len(alts) > 1:
            # normalize to endpoint relation (pred identity is lost, as in
            # SPARQL alternation)
            return (
                df.select(F.col(s_col).alias(subj), F.col(o_col).alias(obj)),
                False,
            )
        return df, True
    if path_suffix == "+":
        lo, hi = 1, max_path_hops
    elif path_suffix == "*":
        # zero-or-more, bounded: 0..max_path_hops (zero-length = identity)
        lo, hi = 0, max_path_hops
    elif path_suffix == "?":
        lo, hi = 0, 1
    else:
        lo, hi = int(m.group(5)), int(m.group(6))
    if lo < 0 or hi < lo:
        raise ValueError(f"bgp_match: bad path bounds in {p_t!r}")
    edges = df.select(
        F.col(s_col).alias("s"), F.col(o_col).alias("o")
    ).distinct()
    reverse = s_const is None and o_const is not None
    if reverse:  # walk backwards from the constant object
        edges = edges.select(
            F.col("o").alias("s"), F.col("s").alias("o")
        )
        seed = o_const
    else:
        seed = s_const
    cur = edges.where(F.col("s") == F.lit(seed)) if seed is not None else edges
    acc = cur if (lo <= 1 and hi >= 1) else None
    for hop in range(2, hi + 1):
        cur = (
            cur.alias("a")
            .join(edges.alias("b"), F.col("a.o") == F.col("b.s"))
            .select(F.col("a.s").alias("s"), F.col("b.o").alias("o"))
            .distinct()
        )
        if hop >= lo:
            acc = cur if acc is None else acc.unionByName(cur)
    if lo == 0:
        # zero-length path: every graph term relates to itself (SPARQL
        # 1.1 §9.3) — seeded, that is just the seed row; unseeded, the
        # node set of the graph (NOT the pred-filtered edge set)
        if seed is not None:
            ident = triples.sparkSession.createDataFrame(
                [(seed, seed)], "s string, o string"
            )
        else:
            ident = (
                triples.select(F.col(subj).alias("s"))
                .unionByName(triples.select(F.col(obj).alias("s")))
                .distinct()
                .select("s", F.col("s").alias("o"))
            )
        acc = ident if acc is None else acc.unionByName(ident)
    if reverse:
        acc = acc.select(F.col("o").alias("s"), F.col("s").alias("o"))
    out = acc.distinct().select(
        F.col("s").alias(subj), F.col("o").alias(obj)
    )
    return out, False


def _compile_pattern(
    triples: DataFrame,
    pat: tuple[str, str, str],
    pat_i: int,
    subj: str,
    pred: str,
    obj: str,
    max_path_hops: int,
) -> tuple[DataFrame, frozenset[str], int]:
    """One (s, p, o) term triple -> (binding DataFrame, variable set,
    n_constants). Shared by required / optional / union compilation."""
    s_t, p_t, o_t = pat
    df, has_pred = _pred_rel(
        triples, p_t, subj, pred, obj, max_path_hops,
        s_const=None if _is_var(s_t) else s_t,
        o_const=None if _is_var(o_t) else o_t,
    )
    if has_pred and not _is_var(p_t):
        n_const = 1  # the simple-constant pred filter is already applied
        terms = ((subj, s_t), (obj, o_t))
    elif has_pred:
        n_const = 0
        terms = ((subj, s_t), (pred, p_t), (obj, o_t))
    else:  # endpoint relation: pred consumed by the path/alt/inverse compile
        n_const = 1
        terms = ((subj, s_t), (obj, o_t))
    for col, term in terms:
        if not _is_var(term):
            df = df.where(F.col(col) == F.lit(term))
            n_const += 1
    # repeated variable inside one pattern => equality constraint
    seen: dict[str, str] = {}
    for col, term in terms:
        if _is_var(term):
            if term in seen:
                df = df.where(F.col(seen[term]) == F.col(col))
            else:
                seen[term] = col
    proj = [F.col(c).alias(v[1:]) for v, c in seen.items()]
    if proj:
        df = df.select(*proj)
    else:  # constants-only existence guard: 1-row broadcast semi
        df = df.select(F.lit(1).alias(f"__exists_{pat_i}")).limit(1)
    return df, frozenset(v[1:] for v in seen), n_const


_FILTER_OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "contains": lambda a, b: a.contains(b),
    "strstarts": lambda a, b: a.startswith(b),
    "strends": lambda a, b: a.endswith(b),
}


def _apply_filters(
    df: DataFrame, filters: Sequence[tuple[str, str, str]],
    bound: set[str],
) -> DataFrame:
    """SPARQL FILTER subset: each (lhs, op, rhs) with ``?var`` or constant
    terms, op in =, !=, <, <=, >, >=, contains, strstarts, strends, regex
    (Java∩RE2-subset pattern), in (rhs = list of constants) — string
    comparisons are lexicographic on both engines. Filters are plain
    column predicates applied after the binding joins — Catalyst pushes
    single-pattern filters back through the join on its own."""
    for lhs, op, rhs in filters:
        if op == "in":
            if _is_var(lhs) and lhs[1:] not in bound:
                raise ValueError(f"bgp_match: filter var {lhs} is unbound")
            if not isinstance(rhs, (list, tuple)) or not rhs:
                raise ValueError(
                    "bgp_match: 'in' filter needs a non-empty constant list"
                )
            le = F.col(lhs[1:]) if _is_var(lhs) else F.lit(lhs)
            df = df.where(le.isin(list(rhs)))
            continue
        if op == "regex":
            # SPARQL FILTER regex(?x, "pat"): rhs is a CONSTANT pattern
            # in the ASCII Java∩RE2 subset (the repo-wide regex rule)
            if _is_var(lhs) and lhs[1:] not in bound:
                raise ValueError(f"bgp_match: filter var {lhs} is unbound")
            if not isinstance(rhs, str) or _is_var(rhs):
                raise ValueError(
                    "bgp_match: 'regex' filter needs a constant pattern"
                )
            le = F.col(lhs[1:]) if _is_var(lhs) else F.lit(lhs)
            df = df.where(le.rlike(rhs))
            continue
        if op not in _FILTER_OPS:
            raise ValueError(f"bgp_match: unknown filter op {op!r}")
        for t in (lhs, rhs):
            if _is_var(t) and t[1:] not in bound:
                raise ValueError(f"bgp_match: filter var {t} is unbound")
        le = F.col(lhs[1:]) if _is_var(lhs) else F.lit(lhs)
        re_ = F.col(rhs[1:]) if _is_var(rhs) else F.lit(rhs)
        df = df.where(_FILTER_OPS[op](le, re_))
    return df


def bgp_match(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    distinct: bool = True,
    allow_product: bool = False,
    optional_patterns: Sequence[tuple[str, str, str]] = (),
    filters: Sequence[tuple[str, str, str]] = (),
    max_path_hops: int = 6,
    values: tuple[Sequence[str], Sequence[Sequence[str]]] | None = None,
    binds: Sequence[tuple[str, str]] = (),
    order_by: Sequence[tuple[str, bool]] = (),
    limit_n: int | None = None,
    offset_n: int = 0,
) -> DataFrame:
    """Conjunctive triple-pattern (SPARQL basic-graph-pattern) matching.

    Each pattern is an (s, p, o) term triple; a term starting with ``?`` is
    a variable, anything else an exact-match constant. The result has one
    string column per distinct variable, one row per satisfying binding
    (set semantics by default). This upgrades the reference's query surface
    — substring scan only (ref /root/reference/knowledge_graph_builder.py:
    679-686) — to real conjunctive queries over the same triples table.

    Predicate terms additionally support a SPARQL 1.1 property-path subset:
    ``^p`` (inverse), ``a|b`` (alternation), ``p+`` (1..max_path_hops-hop
    path), ``p*`` (0..max_path_hops), ``p?`` (0..1), ``p{m,n}``
    (m..n-hop path, m may be 0) and ``a/b`` sequences of any of these —
    see ``_pred_rel`` for the bounded-closure posture and
    zero-length-path semantics. One precedence deviation from the SPARQL
    grammar (which has no parentheses here to disambiguate): ``/`` binds
    LOOSEST, so ``a|b/c`` means ``(a|b)/c`` — alternation applies within
    a segment.

    Plan shape (the 100 TB posture): every pattern compiles to a constant
    filter + projection over the SAME triples scan — predicate constants
    reach the parquet reader as pushed filters, so a pred-partitioned
    triples table prunes to the touched predicates. Patterns are then
    joined pairwise on their shared variables in greedy most-constants-
    first order (the classic selectivity heuristic); every join is a hash
    join on binding columns, and AQE broadcasts whichever side a selective
    constant has made small. Nothing runs on the driver except plan
    construction over len(patterns) items.

    A pattern set whose join graph is disconnected requires a Cartesian
    product of binding tables; that is a scale error, so it raises unless
    ``allow_product=True`` (constants-only existence patterns are exempt —
    they join as broadcast 1-row guards).

    optional_patterns: SPARQL OPTIONAL semantics — each pattern LEFT-joins
    onto the required bindings via its shared variables (>= 1 required,
    else it raises: an unconstrained optional is a product). Variables
    bound only by optional patterns come back as '' for rows without a
    match (unbound-as-empty keeps the result a flat string table).
    Multiple optional matches multiply rows, exactly as SPARQL does.

    filters: SPARQL FILTER subset over bound variables — see
    ``_apply_filters``.

    values: SPARQL VALUES — ``(["?v", ...], [[row...], ...])``, an inline
    binding table INNER-joined onto the solution on its shared variables
    (SPARQL's join semantics; rows must be non-None strings — UNDEF is
    outside this subset). With no shared variable the table multiplies the
    solutions, which is safe because it is a broadcast literal. The join
    happens BEFORE optional unbound-as-'' coalescing, so a '' row never
    matches an unmatched optional. Scale: always a broadcast hash join
    against a literal-sized table.

    binds: SPARQL BIND subset — ``(("?new", "<sql expr over bound
    column names>"), ...)`` appended in order as string-cast computed
    columns (map-side, no shuffle); each new variable is visible to later
    binds and to ``filters``. The expression references the bare column
    names (``concat(t, ':', b)``), not ``?``-prefixed terms.

    order_by / limit_n / offset_n: SPARQL solution modifiers (ORDER BY,
    LIMIT, OFFSET). ``order_by`` is ``(("?var", ascending), ...)``; the
    remaining bound variables are appended ascending as a tiebreak so the
    cut is a TOTAL order — a LIMIT under a partial order is
    nondeterministic across engines and across reruns, which is a
    correctness bug at any scale. Scale posture: ORDER BY + LIMIT k
    compiles to Spark's TakeOrderedAndProject — a per-partition
    (offset+k)-row heap followed by a single-reducer merge of tiny
    per-partition tops — NOT a global sort-shuffle; ORDER BY alone (no
    limit) is an honest range-partitioned global sort, so pass a limit
    whenever the consumer only needs the head. OFFSET without ORDER BY is
    rejected (meaningless under hash-partitioned nondeterminism).
    """
    if not patterns:
        raise ValueError("bgp_match: need at least one pattern")

    compiled: list[tuple[DataFrame, frozenset[str], int]] = []
    for pat_i, pat in enumerate(patterns):
        compiled.append(
            _compile_pattern(
                triples, pat, pat_i, subj, pred, obj, max_path_hops
            )
        )

    # greedy join order: seed with the most-constant pattern that binds a
    # variable (existence guards attach as 1-row broadcasts), then always
    # attach a pattern sharing >= 1 already-bound variable
    compiled.sort(key=lambda t: (-bool(t[1]), -t[2]))
    acc, bound, _ = compiled[0]
    rest = compiled[1:]
    while rest:
        idx = next(
            (i for i, (_, vs, _) in enumerate(rest) if (vs & bound) or not vs),
            None,
        )
        if idx is None:
            if not allow_product:
                raise ValueError(
                    "bgp_match: pattern join graph is disconnected (would "
                    "need a Cartesian product); pass allow_product=True to "
                    "force it"
                )
            idx = 0
        nxt, vs, _ = rest.pop(idx)
        if not vs:  # existence guard
            acc = acc.crossJoin(F.broadcast(nxt))
        elif vs & bound:
            acc = acc.join(nxt, on=sorted(vs & bound), how="inner")
            bound |= vs
        else:
            acc = acc.crossJoin(nxt)
            bound |= vs
    if not bound:  # all patterns were existence guards: 0/1-row verdict
        return acc.select(F.lit(True).alias("exists")).limit(1)

    optional_only: set[str] = set()
    for pat_i, pat in enumerate(optional_patterns):
        df, vs, _ = _compile_pattern(
            triples, pat, 10_000 + pat_i, subj, pred, obj, max_path_hops
        )
        shared = vs & bound
        if not shared:
            raise ValueError(
                "bgp_match: optional pattern shares no variable with the "
                "required patterns (would be a Cartesian product)"
            )
        acc = acc.join(df, on=sorted(shared), how="left")
        optional_only |= vs - bound
        bound |= vs

    if values is not None:
        vvars, vrows = values
        if not vvars or not vrows:
            raise ValueError("bgp_match: values needs variables and rows")
        for v in vvars:
            if not _is_var(v):
                raise ValueError(f"bgp_match: values term {v!r} is not a "
                                 "?variable")
        names = [v[1:] for v in vvars]
        for r in vrows:
            if len(r) != len(names) or any(x is None for x in r):
                raise ValueError(
                    "bgp_match: every values row needs one non-None string "
                    "per variable (UNDEF is outside this subset)"
                )
        vdf = triples.sparkSession.createDataFrame(
            [tuple(r) for r in vrows],
            ", ".join(f"{n} string" for n in names),
        ).distinct()
        shared_v = sorted(set(names) & bound)
        if shared_v:
            acc = acc.join(F.broadcast(vdf), on=shared_v, how="inner")
        else:
            acc = acc.crossJoin(F.broadcast(vdf))
        optional_only -= set(names)  # a values var is never unbound
        bound |= set(names)

    out = acc.select(
        *[
            F.coalesce(F.col(v), F.lit("")).alias(v)
            if v in optional_only else F.col(v)
            for v in sorted(bound)
        ]
    )
    bound = set(bound)
    for var, expr in binds:
        if not _is_var(var):
            raise ValueError(f"bgp_match: bind target {var!r} is not a "
                             "?variable")
        name = var[1:]
        if name in bound:
            raise ValueError(f"bgp_match: bind var {var} is already bound")
        out = out.withColumn(name, F.expr(expr).cast("string"))
        bound.add(name)
    out = _apply_filters(out, filters, bound)
    out = out.distinct() if distinct else out

    if offset_n and not order_by:
        raise ValueError(
            "bgp_match: OFFSET without ORDER BY skips an arbitrary subset "
            "under hash partitioning — pass order_by"
        )
    if order_by:
        keyed: list[str] = []
        sort_cols = []
        for var, asc in order_by:
            if not _is_var(var):
                raise ValueError(
                    f"bgp_match: order_by term {var!r} is not a ?variable"
                )
            name = var[1:]
            if name not in bound:
                raise ValueError(f"bgp_match: order_by var {var} is unbound")
            sort_cols.append(F.col(name).asc() if asc else F.col(name).desc())
            keyed.append(name)
        # total-order tiebreak: remaining vars ascending, name order
        sort_cols += [F.col(v).asc() for v in sorted(bound) if v not in keyed]
        out = out.orderBy(*sort_cols)
        if offset_n:
            out = out.offset(offset_n)
    if limit_n is not None:
        out = out.limit(limit_n)
    return out


def bgp_union(
    triples: DataFrame,
    branches: Sequence[dict],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    distinct: bool = True,
    max_path_hops: int = 6,
) -> DataFrame:
    """SPARQL UNION over BGP branches.

    Each branch is a dict accepted by :func:`bgp_match` — ``{"patterns":
    [...], "optional_patterns": [...], "filters": [...]}`` (only
    ``patterns`` required). The result schema is the sorted union of every
    branch's variables; a variable a branch does not bind comes back as
    ``''`` for that branch's rows (the same unbound-as-empty convention as
    OPTIONAL, keeping the result a flat string table). ``distinct=True``
    dedupes ACROSS branches, i.e. SELECT DISTINCT over the UNION.

    Plan shape: each branch is an independent join tree over the shared
    triples scan; the union is a zero-shuffle concatenation (Spark
    unionByName), so branches parallelize freely and the only added cost
    of the union itself is the final distinct when requested.
    """
    if not branches:
        raise ValueError("bgp_union: need at least one branch")
    outs: list[DataFrame] = []
    for br in branches:
        outs.append(
            bgp_match(
                triples,
                br["patterns"],
                subj=subj,
                pred=pred,
                obj=obj,
                distinct=False,
                allow_product=bool(br.get("allow_product", False)),
                optional_patterns=br.get("optional_patterns", ()),
                filters=br.get("filters", ()),
                max_path_hops=max_path_hops,
            )
        )
    all_vars = sorted({c for o in outs for c in o.columns})
    aligned = [
        o.select(
            *[
                (F.col(v) if v in o.columns else F.lit("")).alias(v)
                for v in all_vars
            ]
        )
        for o in outs
    ]
    acc = aligned[0]
    for o in aligned[1:]:
        acc = acc.unionByName(o)
    return acc.distinct() if distinct else acc


def bgp_minus(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    minus_patterns: Sequence[tuple[str, str, str]],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    distinct: bool = True,
    max_path_hops: int = 6,
) -> DataFrame:
    """SPARQL MINUS: keep the bindings of `patterns` that are NOT
    compatible with any binding of `minus_patterns` on their SHARED
    variables — the negation piece of the BGP algebra (OPTIONAL/UNION/
    FILTER/aggregate/CONSTRUCT are siblings on this engine).

    Per the SPARQL 1.1 spec, a MINUS branch sharing NO variable with the
    left side removes nothing (vacuous compatibility is NOT elimination) —
    that degenerate call raises here instead, because it is always a query
    bug. Variables bound only inside the minus branch are projected away
    before the anti-join, exactly as MINUS scopes them.

    Plan shape: one left_anti hash join on the shared variable columns —
    the minus side is a binding table like any other, so selective
    constants broadcast it; nothing new shuffles beyond the two BGPs.
    """
    left = bgp_match(
        triples, patterns, subj=subj, pred=pred, obj=obj,
        distinct=False, max_path_hops=max_path_hops,
    )
    right = bgp_match(
        triples, minus_patterns, subj=subj, pred=pred, obj=obj,
        distinct=False, max_path_hops=max_path_hops,
    )
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        raise ValueError(
            "bgp_minus: minus_patterns share no variable with patterns — "
            "SPARQL MINUS would remove nothing"
        )
    out = left.join(right.select(*shared).distinct(), shared, "left_anti")
    return out.distinct() if distinct else out


def bgp_filter_exists(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    exists_clauses: Sequence[dict],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    distinct: bool = True,
    max_path_hops: int = 6,
) -> DataFrame:
    """SPARQL ``FILTER EXISTS`` / ``FILTER NOT EXISTS`` over BGP bindings.

    Each clause is a dict accepted by :func:`bgp_match` (``patterns``
    required; ``filters`` / ``optional_patterns`` optional) plus a
    ``negate`` flag: ``negate=False`` keeps the outer solutions for which
    the clause's BGP has at least one compatible binding (FILTER EXISTS),
    ``negate=True`` keeps those with none (FILTER NOT EXISTS). Clauses
    apply conjunctively in order. This completes the negation corner of
    the engine's SPARQL algebra next to :func:`bgp_minus` — the two
    diverge exactly where the spec says they do: a clause sharing NO
    variable with the outer BGP is vacuous under MINUS (and ``bgp_minus``
    raises), but under EXISTS it is a global guard — EXISTS keeps
    everything iff the branch has any solution at all, NOT EXISTS keeps
    everything iff it has none. The reference has no negation surface at
    all (substring scan only, /root/reference/knowledge_graph_builder.py:
    679-686).

    In this conjunctive subset the inner branch correlates with the outer
    solution only through shared variables, so SPARQL's substitution
    semantics coincide exactly with a semi-join; variables bound only
    inside the branch stay existential (projected away before the join).

    Plan shape (100 TB posture): one left_semi (EXISTS) or left_anti
    (NOT EXISTS) hash join per clause on the shared variable columns —
    never a row-multiplying join, so solution cardinality only shrinks;
    selective constants inside a branch make its binding table small and
    AQE broadcasts it. The uncorrelated-guard case joins a broadcast
    ``limit(1)`` verdict row, costing one tiny job regardless of outer
    size.
    """
    out = bgp_match(
        triples, patterns, subj=subj, pred=pred, obj=obj,
        distinct=False, max_path_hops=max_path_hops,
    )
    for cl in exists_clauses:
        negate = bool(cl.get("negate", False))
        branch = bgp_match(
            triples,
            cl["patterns"],
            subj=subj,
            pred=pred,
            obj=obj,
            distinct=False,
            optional_patterns=cl.get("optional_patterns", ()),
            filters=cl.get("filters", ()),
            max_path_hops=max_path_hops,
        )
        shared = sorted(set(out.columns) & set(branch.columns))
        how = "left_anti" if negate else "left_semi"
        if shared:
            out = out.join(branch.select(*shared).distinct(), shared, how)
        else:
            # uncorrelated guard: 0-or-1-row broadcast verdict on a
            # constant key — keeps/drops ALL outer rows
            guard = branch.select(F.lit(1).alias("__g")).limit(1)
            out = (
                out.withColumn("__g", F.lit(1))
                .join(F.broadcast(guard), "__g", how)
                .drop("__g")
            )
    return out.distinct() if distinct else out


def bgp_ask(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    filters: Sequence[tuple[str, str, str]] = (),
    optional_patterns: Sequence[tuple[str, str, str]] = (),
    max_path_hops: int = 6,
) -> DataFrame:
    """SPARQL ``ASK`` — does the BGP have at least one solution?

    Returns a single-row DataFrame ``(ask: boolean)``. Completes the
    engine's SPARQL query-form surface next to SELECT (:func:`bgp_match`),
    aggregates (:func:`bgp_aggregate`) and CONSTRUCT
    (:func:`bgp_construct`); the reference answers existence questions
    only by substring scan (/root/reference/knowledge_graph_builder.py:
    679-686).

    Plan shape (100 TB posture): ``limit(1)`` sits directly on the
    binding plan, so Spark plants a LocalLimit under the exchange — each
    task short-circuits after its first satisfying binding and the
    CollectLimit takes one row from the first non-empty partition; the
    aggregate then folds 0-or-1 rows. Constants in the pattern reach the
    scan as pushed filters, so a selective ASK touches only the pruned
    partitions.
    """
    hits = bgp_match(
        triples, patterns, subj=subj, pred=pred, obj=obj,
        distinct=False, filters=filters,
        optional_patterns=optional_patterns, max_path_hops=max_path_hops,
    )
    return hits.limit(1).agg((F.count(F.lit(1)) > 0).alias("ask"))


def bgp_construct(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    template: Sequence[tuple[str, str, str]],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    distinct: bool = True,
    optional_patterns: Sequence[tuple[str, str, str]] = (),
    filters: Sequence[tuple[str, str, str]] = (),
    max_path_hops: int = 6,
) -> DataFrame:
    """SPARQL CONSTRUCT: instantiate `template` triples from the bindings
    of a basic graph pattern — the graph-to-graph rewrite primitive
    (reshape predicates, materialize views, derive edges). Template terms
    are the same ``?var`` / constant syntax as patterns; the result is the
    constructed graph (subj, pred, obj), deduplicated by default (a graph
    is a SET of triples, per the SPARQL 1.1 spec).

    Instantiations touching a variable an OPTIONAL left unbound ('' under
    this engine's unbound-as-empty convention) are skipped, exactly as
    SPARQL drops incomplete template triples.

    Plan shape: the binding table is computed ONCE (materialized — its
    join tree must not replay per template entry), each template entry is
    a map-only projection over it, and the union is a zero-shuffle
    concatenation; the only added shuffle is the final distinct.
    """
    if not template:
        raise ValueError("bgp_construct: need at least one template triple")
    bindings = materialize(
        bgp_match(
            triples,
            patterns,
            subj=subj,
            pred=pred,
            obj=obj,
            distinct=False,
            optional_patterns=optional_patterns,
            filters=filters,
            max_path_hops=max_path_hops,
        )
    )
    outs: list[DataFrame] = []
    for ts, tp, to in template:
        cols, guards = [], []
        for term, name in ((ts, "subj"), (tp, "pred"), (to, "obj")):
            if _is_var(term):
                v = term[1:]
                if v not in bindings.columns:
                    raise ValueError(
                        f"bgp_construct: template variable ?{v} is not "
                        "bound by the patterns"
                    )
                cols.append(F.col(v).alias(name))
                guards.append(F.col(v) != F.lit(""))
            else:
                cols.append(F.lit(term).alias(name))
        out = bindings
        for g in guards:
            out = out.where(g)
        outs.append(out.select(*cols))
    acc = outs[0]
    for o in outs[1:]:
        acc = acc.unionByName(o)
    return acc.distinct() if distinct else acc


def get_node_history(triples: DataFrame, nodes: DataFrame, node_id: str) -> DataFrame:
    """Union of node-created + relationship events for one node, ordered by
    timestamp (ref :688-715: `history.sort(key=timestamp)`)."""
    created = nodes.where(F.col("node_id") == node_id).select(
        F.lit("node_created").alias("event"),
        F.col("node_id").alias("subj"),
        F.lit(None).cast("string").alias("pred"),
        F.lit(None).cast("string").alias("obj"),
        "ts", "source", "confidence",
    )
    rels = triples.where(
        (F.col("subj") == node_id) | (F.col("obj") == node_id)
    ).select(
        F.lit("relationship").alias("event"),
        "subj", "pred", "obj", "ts", "source", "confidence",
    )
    return created.unionByName(rels).orderBy("ts", "event", "pred", "obj")


def get_relationship_confidence(triples: DataFrame, subj: str, obj: str) -> float:
    """Point lookup; 0.0 when the edge is absent (ref :717-723)."""
    row = (
        triples.where((F.col("subj") == subj) & (F.col("obj") == obj))
        .select("confidence")
        .limit(1)
        .collect()
    )
    return float(row[0]["confidence"]) if row else 0.0


def validate_relationship(
    triples: DataFrame, subj: str, pred: str, obj: str
) -> dict:
    """Lookup + predicate-equality verdict (ref :725-738)."""
    row = (
        triples.where((F.col("subj") == subj) & (F.col("obj") == obj))
        .select("pred", "confidence")
        .limit(1)
        .collect()
    )
    if not row:
        return {"exists": False, "type_matches": False, "confidence": 0.0}
    return {
        "exists": True,
        "type_matches": row[0]["pred"] == pred,
        "confidence": float(row[0]["confidence"]),
    }


def relation_profile(triples: DataFrame) -> DataFrame:
    """Per-predicate cardinality profile: (pred, n_edges, n_subj, n_obj,
    max_out, max_in, functional, inverse_functional) — the KG schema
    quality census (OWL-style functionality detection from data). A
    predicate with max_out == 1 behaves as a function subj -> obj
    (safe to key a dimension table on); max_in == 1 marks an
    inverse-functional (identifier-like) predicate. Exact integers only.

    Shape: two two-level aggregations ((pred, subj) then pred; same for
    obj) plus one flat count — all partial-aggregated groupBys on keys
    the data is already skew-diluted on (pred alone is low-cardinality,
    but the first level groups on (pred, node), which spreads hot
    predicates across the cluster before the tiny per-pred rollup)."""
    out_deg = (
        triples.groupBy("pred", "subj")
        .agg(F.count(F.lit(1)).alias("__o"))
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subj"),
            F.max("__o").cast("long").alias("max_out"),
            F.sum("__o").cast("long").alias("n_edges"),
        )
    )
    in_deg = (
        triples.groupBy("pred", "obj")
        .agg(F.count(F.lit(1)).alias("__i"))
        .groupBy("pred")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obj"),
            F.max("__i").cast("long").alias("max_in"),
        )
    )
    return out_deg.join(in_deg, "pred").select(
        "pred", "n_edges", "n_subj", "n_obj", "max_out", "max_in",
        (F.col("max_out") == 1).alias("functional"),
        (F.col("max_in") == 1).alias("inverse_functional"),
    )


def entity_card(
    triples: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    max_facts: int = 12,
) -> DataFrame:
    """Per-entity summary card — (subj, n_facts, card) where card is the
    first `max_facts` outgoing assertions rendered `pred=obj`, sorted
    lexicographically and pipe-joined: the concise-bounded-description
    export a serving layer or an LLM-context builder reads per entity.
    n_facts counts ALL facts, so a truncated card is detectable
    (n_facts > max_facts).

    The cap is applied BEFORE collect_list, so a hub entity with millions
    of assertions never materializes an unbounded array: one window +
    groupBy on the same key — a single shuffle, and the per-group state
    is max_facts strings.
    """
    fact = F.concat(F.col(pred_col), F.lit("="), F.col(obj_col))
    ranked = triples.select(
        F.col(subj_col).alias("subj"), fact.alias("__fact")
    ).select(
        "subj", "__fact",
        F.row_number().over(
            Window.partitionBy("subj").orderBy("__fact")
        ).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy("subj")).alias("__tot"),
    )
    return (
        ranked.where(F.col("__rn") <= max_facts)
        .groupBy("subj")
        .agg(
            F.max("__tot").cast("long").alias("n_facts"),
            F.array_join(F.sort_array(F.collect_list("__fact")), "|")
            .alias("card"),
        )
    )


def paths_between(
    triples: DataFrame,
    starts: DataFrame,
    ends: DataFrame,
    max_hops: int = 3,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """Enumerate SIMPLE directed paths from any start node to any end node
    within max_hops edges: (start, end_node, hops, path) where path is the
    human-readable chain "a -pred-> b -pred-> c" — the "how does X relate
    to Y" explanation query the reference's UI answers by eyeballing the
    rendered graph (ref templates/index.html force layout; no API exists).

    starts/ends: one-column DataFrames of node names (first column used).

    Semantics: simple paths only (a per-path visited set blocks revisits),
    every qualifying path is emitted (not just shortest — kg_sssp covers
    that), deterministic output. Path ENUMERATION is exponential in the
    worst case by nature; the hop bound is the contract (bounded_closure
    posture) and the intended inputs are pred-filtered or taxonomy-like
    subgraphs. Use bounded_closure for reachability-only questions.

    Scale shape: semi-naive frontier expansion — each round joins the
    CURRENT frontier (paths of length r) against the edge table on one
    key, shuffle partitioned by node; the visited check is a JVM-side
    array_contains on a bounded (<= max_hops) array. Ends are joined once
    per round so finished paths leave the frontier's lineage via
    materialize().
    """
    if max_hops < 1:
        raise ValueError(f"paths_between needs max_hops >= 1, got {max_hops}")
    e = materialize(
        triples.select(
            F.col(subj_col).alias("s"), F.col(pred_col).alias("p"),
            F.col(obj_col).alias("o"),
        ).distinct()
    )
    st = starts.select(F.col(starts.columns[0]).alias("start")).distinct()
    en = materialize(
        ends.select(F.col(ends.columns[0]).alias("end_node")).distinct()
    )
    frontier = st.select(
        "start",
        F.col("start").alias("node"),
        F.col("start").alias("path"),
        F.array(F.col("start")).alias("visited"),
    )
    out = None
    for hop in range(1, max_hops + 1):
        frontier = materialize(
            frontier.join(e, frontier["node"] == e["s"])
            .where(~F.array_contains(F.col("visited"), F.col("o")))
            .select(
                "start",
                F.col("o").alias("node"),
                F.concat(
                    F.col("path"), F.lit(" -"), F.col("p"), F.lit("-> "),
                    F.col("o"),
                ).alias("path"),
                F.array_append(F.col("visited"), F.col("o")).alias("visited"),
            )
        )
        hit = frontier.join(
            en, frontier["node"] == en["end_node"]
        ).select(
            "start", "end_node", F.lit(hop).cast("long").alias("hops"), "path"
        )
        out = hit if out is None else out.unionByName(hit)
        if frontier.limit(1).count() == 0:
            break
    return out


_BGP_AGGS = {
    "count": lambda v: F.count(F.lit(1)),
    "count_distinct": lambda v: F.countDistinct(F.col(v)),
    "min": lambda v: F.min(F.col(v)),
    "max": lambda v: F.max(F.col(v)),
    "sum": lambda v: F.sum(F.col(v).cast("long")),
    # SPARQL GROUP_CONCAT, separator pinned to ';' and elements sorted —
    # an unordered concat is nondeterministic under any parallel engine
    "group_concat": lambda v: F.array_join(
        F.sort_array(F.collect_list(F.col(v))), ";"
    ),
    "group_concat_distinct": lambda v: F.array_join(
        F.sort_array(F.collect_set(F.col(v))), ";"
    ),
    # SPARQL AVG in exact integer ppm: (sum·1e6) div count — fp64 AVG
    # would be summation-order-dependent across partitions
    "avg_ppm": lambda v: F.expr(
        f"(sum(cast(`{v}` as bigint)) * 1000000) div count(`{v}`)"
    ),
    # SPARQL SAMPLE pinned to min: 'any value' is nondeterministic
    # distributed, the minimum is the same value on every engine
    "sample": lambda v: F.min(F.col(v)),
}


def bgp_aggregate(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    group_by: Sequence[str],
    aggs: Sequence[tuple[str, str | None, str]],
    having: Sequence[tuple[str, str, object]] = (),
    **kwargs,
) -> DataFrame:
    """SPARQL GROUP BY + aggregates over the BGP engine.

    ``group_by``: variables (``?x``) to group on; ``aggs``: (op, var,
    alias) with op in count / count_distinct / min / max / sum /
    avg_ppm (exact-integer SPARQL AVG, scaled 1e6) / sample (pinned to
    min — deterministic) / group_concat / group_concat_distinct (count
    ignores var — SPARQL's
    COUNT(*); the group_concats sort their elements and join with ';',
    since an order-of-arrival concat is nondeterministic distributed).
    ``having``: (agg_alias, op, literal) predicates over the aggregated
    columns — SPARQL HAVING; op shares the FILTER operator set. Aggregation runs over the BAG of
    solutions (SPARQL 1.1 §11: the solution multiset feeds GROUP BY), so
    the underlying match uses ``distinct=False`` — a COUNT over
    set-deduplicated bindings would be a different (wrong) answer.
    Accepts bgp_match's keyword surface (optional_patterns, filters,
    property-path predicate terms, max_path_hops).

    Counts are exact longs; the per-group shuffle is the only exchange
    added on top of the match's join tree, and Catalyst pushes the
    partial aggregation below it.
    """
    for g in group_by:
        if not _is_var(g):
            raise ValueError(f"bgp_aggregate: group_by needs ?vars, got {g!r}")
    b = bgp_match(triples, patterns, distinct=False, **kwargs)
    exprs = []
    for op, var, alias in aggs:
        if op not in _BGP_AGGS:
            raise ValueError(f"bgp_aggregate: unknown agg op {op!r}")
        if op != "count" and (var is None or not _is_var(var)):
            raise ValueError(f"bgp_aggregate: {op} needs a ?var")
        col = _BGP_AGGS[op](var[1:] if var else None)
        if op in ("count", "count_distinct", "sum"):
            col = col.cast("long")
        exprs.append(col.alias(alias))
    out = b.groupBy(*[g[1:] for g in group_by]).agg(*exprs)
    # SPARQL HAVING: each (agg_alias, op, literal) filters the grouped
    # rows — a plain predicate after the aggregate, so Catalyst keeps
    # it in the same stage as the final agg (no extra shuffle)
    aliases = {alias for _, _, alias in aggs}
    for lhs, op, rhs in having:
        if op not in _FILTER_OPS:
            raise ValueError(f"bgp_aggregate: unknown having op {op!r}")
        if lhs not in aliases:
            raise ValueError(
                f"bgp_aggregate: having references unknown alias {lhs!r}"
            )
        out = out.where(_FILTER_OPS[op](F.col(lhs), F.lit(rhs)))
    return out


def bgp_cardinality(
    triples: DataFrame,
    patterns: Sequence[tuple[str, str, str]],
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> DataFrame:
    """System-R-style cardinality estimates for a BGP join chain
    (Selinger 1979, the independence/containment heuristics every SQL
    optimizer ships) — the planner-statistics layer for bgp_match:
    per pattern, base estimate = n_pred, divided by ndv for each
    CONSTANT subject/object; joining pattern i on a shared variable v
    multiplies by n_i and divides by max(ndv_seen(v), ndv_i(v)); after
    the join ndv_seen(v) = min of the two (containment assumption).
    Multiple shared variables divide sequentially in sorted variable
    order (pinned, so the truncating integer division chain is
    deterministic cross-engine). Predicates must be constants.

    Per-predicate stats are ONE aggregation over the needed predicates
    collected to the driver (pattern-count rows — the dimension-sized
    collect posture); the estimate chain itself is exact driver-side
    integer arithmetic. Returns (step, pred, n_pred, est_rows).
    """
    if not patterns:
        raise ValueError("bgp_cardinality: patterns must be non-empty")
    preds = []
    for s, p, o in patterns:
        if p.startswith("?"):
            raise ValueError("bgp_cardinality: predicates must be constants")
        preds.append(p)
    stats = {
        r["p"]: (r["n"], r["ndv_s"], r["ndv_o"])
        for r in triples.where(F.col(pred_col).isin(sorted(set(preds))))
        .groupBy(F.col(pred_col).alias("p"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct(F.col(subj_col)).cast("long").alias("ndv_s"),
            F.countDistinct(F.col(obj_col)).cast("long").alias("ndv_o"),
        )
        .collect()
    }
    seen: dict[str, int] = {}
    est = 0
    rows = []
    for i, (s, p, o) in enumerate(patterns, start=1):
        n, ndv_s, ndv_o = stats.get(p, (0, 0, 0))
        step_est = n
        if not s.startswith("?"):
            step_est = step_est // max(ndv_s, 1)
        if not o.startswith("?"):
            step_est = step_est // max(ndv_o, 1)
        here = {}
        if s.startswith("?"):
            here[s] = ndv_s
        if o.startswith("?"):
            # ?x p ?x self-join patterns are out of scope
            if o in here:
                raise ValueError(
                    "bgp_cardinality: repeated variable within one "
                    "pattern is not supported")
            here[o] = ndv_o
        if i == 1:
            est = step_est
        else:
            est = est * step_est
            for v in sorted(set(here) & set(seen)):
                est = est // max(max(seen[v], here[v]), 1)
        for v, nd in here.items():
            seen[v] = min(seen[v], nd) if v in seen else nd
        rows.append((i, p, n, est))
    spark = triples.sparkSession
    return spark.createDataFrame(
        rows, "step long, pred string, n_pred long, est_rows long"
    )
