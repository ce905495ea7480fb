"""Set operators (SURVEY.md §2.7).

Reference requires identical column lists on both inputs
(``src/graph/executor/query/SetExecutor.cpp:1-75``; messages per
tests/tck/features/set/Set.feature "Basic") — enforced here with the same
two-stage check: arity first, then exact (ordered) names, because the
reference is row-positional and rejects ``a,b UNION b,a``.

Semantics detail: IntersectExecutor.cpp:12-50 / MinusExecutor.cpp:14-47 build
a hash set of RHS rows and keep/drop LHS rows by membership — LHS duplicates
survive and NULL cells compare equal (Value::operator== treats NULL==NULL).
The faithful distributed translation is a null-safe left-semi / left-anti
join on all columns, not Spark's distinct-ing ``intersect``/``except``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def _check_cols(a: DataFrame, b: DataFrame) -> None:
    if len(a.columns) != len(b.columns):
        raise ValueError("number of columns to UNION/INTERSECT/MINUS "
                         f"must be same: {a.columns} vs {b.columns}")
    if a.columns != b.columns:
        raise ValueError("different column names to UNION/INTERSECT/MINUS "
                         f"are not supported: {a.columns} vs {b.columns}")


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union (kUnion): UNION ALL (UnionExecutor.cpp:12-38)."""
    _check_cols(a, b)
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION without ALL = planner-added Dedup on top of Union."""
    _check_cols(a, b)
    return a.unionByName(b).distinct()


def _membership_join(a: DataFrame, b: DataFrame, how: str) -> DataFrame:
    _check_cols(a, b)
    # backtick-quoted, alias-qualified refs: expression-text column names
    # carry dots (`$^.player.name`) that bare df[c] would read as a
    # nested-field path (set/Set.feature Minus/Intersect — r9 sweep find)
    from pyspark.sql import functions as F

    def q(side, c):
        return F.col(f"{side}.`" + c.replace("`", "``") + "`")
    la, rb = a.alias("_sl"), b.distinct().alias("_sr")
    cond = reduce(lambda acc, c: acc & q("_sl", c).eqNullSafe(q("_sr", c)),
                  a.columns[1:],
                  q("_sl", a.columns[0]).eqNullSafe(q("_sr", a.columns[0])))
    return la.join(rb, cond, how).select(
        *[q("_sl", c).alias(c) for c in a.columns])


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """Intersect (kIntersect): LHS rows present in RHS, duplicates kept."""
    return _membership_join(a, b, "left_semi")


def minus(a: DataFrame, b: DataFrame) -> DataFrame:
    """Minus (kMinus): LHS rows absent from RHS, duplicates kept."""
    return _membership_join(a, b, "left_anti")
