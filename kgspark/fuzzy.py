"""Edit-distance candidate generation via deletion neighborhoods — the
SymSpell blocking scheme, exact recall with no quadratic stage.

Fuzzy string matching (typo clustering, alias reconciliation, entity-name
dedup) naively needs an all-pairs levenshtein — O(V²) over a 10^7-term
vocabulary is a scale-killer. The SymSpell observation (public algorithm,
Garbe 2012; same neighborhood lemma as Mor-Fraenkel 1982): if
lev(a, b) <= d, then a and b share at least one string in their
<= d-character DELETION neighborhoods. So: expand each term to its
deletion variants (size O(L^d) per term — bounded by term length, not
vocabulary size), equi-join on the variant, verify exact levenshtein on
the survivors. Candidate volume tracks real near-matches; every stage is
a key-partitioned shuffle.

All generation is JVM-side HOF expressions (no Python in the path);
verification is the built-in levenshtein, which DuckDB implements with
identical unit-cost semantics — the oracle twin is a brute-force
levenshtein cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.session import materialize

__all__ = ["delete_variants", "fuzzy_pairs"]


def _delete_each(s):
    """array<string>: s with the character at each position removed."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, F.lit(1), i - 1),
            F.substring(s, i + 1, F.length(s)),
        ),
    )


def delete_variants(col, max_deletes: int = 1):
    """array<string>: the string itself plus every variant reachable by
    deleting up to `max_deletes` characters (distinct). Supports d=1 and
    d=2 — the useful spell-correction range; neighborhood size is
    O(L^d / d!) per string."""
    if max_deletes not in (1, 2):
        raise ValueError(f"max_deletes must be 1 or 2, got {max_deletes}")
    d1 = _delete_each(col)
    out = F.concat(F.array(col), d1)
    if max_deletes == 2:
        out = F.concat(out, F.flatten(F.transform(d1, _delete_each)))
    return F.array_distinct(out)


def fuzzy_pairs(
    df: DataFrame,
    col: str = "token",
    max_dist: int = 1,
) -> DataFrame:
    """All unordered pairs of DISTINCT values of `col` within levenshtein
    distance `max_dist` (1 or 2), as (a, b, dist) with a < b. Exact recall
    — the deletion-neighborhood lemma guarantees every true pair shares a
    blocking key — and exact precision via levenshtein verification.
    NULLs and empty strings are dropped (the empty string would block
    with every length<=d term while matching almost none)."""
    terms = (
        df.select(F.col(col).cast("string").alias("w"))
        .where(F.col("w").isNotNull() & (F.length("w") >= 1))
        .distinct()
    )
    terms = materialize(terms)
    ex = terms.select(
        "w", F.explode(delete_variants(F.col("w"), max_dist)).alias("v")
    )
    cand = (
        ex.alias("l")
        .join(ex.alias("r"), (F.col("l.v") == F.col("r.v"))
              & (F.col("l.w") < F.col("r.w")))
        .select(F.col("l.w").alias("a"), F.col("r.w").alias("b"))
        .distinct()
    )
    return cand.select(
        "a", "b", F.levenshtein("a", "b").cast("long").alias("dist")
    ).where(F.col("dist") <= max_dist)
