"""Aggregate operator + the reference's aggregate-function surface
(SURVEY.md §2.5).

Reference: single-phase hash aggregate graph-side
(``src/graph/executor/query/AggregateExecutor.cpp:12-102``) with functions
COUNT / SUM / AVG / MAX / MIN / STD(population) / BIT_AND / BIT_OR / BIT_XOR /
COLLECT / COLLECT_SET, each with a per-call DISTINCT variant
(``src/common/function/AggFunctionManager.cpp:26-255``,
``AggregateExpression.cpp``). Spark plans partial+final aggregation with
map-side combine automatically — the scale upgrade the reference lacks.

Special reference behaviors preserved:
- empty input + all-aggregate items → one default row (COUNT→0, SUM→0,
  others→NULL): Spark's global aggregation (no group keys) does exactly this.
- ``__EMPTY__`` cells skipped: Spark aggregates skip NULLs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name → (fn, distinct-capable fn) mirroring AggFunctionManager registrations
_AGG_FNS = {
    "count": F.count,
    # reference SUM folds from 0 and skips NULLs, so an all-NULL (or empty)
    # input yields 0, not NULL (Agg.feature "sum(null) == 0")
    "sum": lambda c: F.coalesce(F.sum(c), F.lit(0)),
    "avg": F.avg,
    "max": F.max,
    "min": F.min,
    "std": F.stddev_pop,          # reference STD is population stddev
    "bit_and": F.bit_and,
    "bit_or": F.bit_or,
    "bit_xor": F.bit_xor,
    "collect": F.collect_list,
    "collect_set": F.collect_set,
}

_DISTINCT_FNS = {
    "count": F.count_distinct,
    "sum": lambda c: F.coalesce(F.sum_distinct(c), F.lit(0)),
}


# DISTINCT is a no-op for these (idempotent over duplicate values)
_DISTINCT_NOOP = {"max", "min", "bit_and", "bit_or", "collect_set"}


def agg_call(name: str, col: Column | str, distinct: bool = False) -> Column:
    """Build one aggregate item the way AggregateExpression does.

    DISTINCT variants never round-trip a Column through its printed form
    (which may not re-parse for computed expressions): count/sum use the
    native distinct builders, idempotent functions drop the DISTINCT, and
    the rest (avg/collect/bit_xor/std) are built from count_distinct /
    sum_distinct / collect_set + JVM-side array folds.
    """
    name = name.lower()
    if name not in _AGG_FNS:
        raise ValueError(f"unknown aggregate function: {name}")
    c = F.col(col) if isinstance(col, str) else col
    if not distinct:
        return _AGG_FNS[name](c)
    if name in _DISTINCT_FNS:
        return _DISTINCT_FNS[name](c)
    if name in _DISTINCT_NOOP:
        return _AGG_FNS[name](c)
    if name == "avg":
        return F.sum_distinct(c) / F.count_distinct(c)
    if name == "collect":
        return F.collect_set(c)
    if name == "bit_xor":
        # duplicates cancel under xor, so fold the distinct set
        return F.aggregate(F.collect_set(c.cast("long")),
                           F.lit(0).cast("long"),
                           lambda a, x: a.bitwiseXOR(x))
    # std over the distinct value set; sorted array => deterministic
    # float accumulation order across runs. The raw E[x²]−E[x]² form
    # cancels catastrophically when mean² ≫ variance (values near 1e9 with
    # std 1 returned 0.0 in doubles); variance is shift-invariant, so fold
    # over y = x − min(x) instead — one extra O(1) lookup, no second pass,
    # and the shifted mean is bounded by the value range instead of the
    # absolute magnitude.
    cs = F.sort_array(F.collect_set(c.cast("double")))
    n = F.size(cs).cast("double")
    shift = F.element_at(cs, 1)           # min of the distinct set
    s = F.aggregate(cs, F.lit(0.0), lambda a, x: a + (x - shift))
    s2 = F.aggregate(cs, F.lit(0.0),
                     lambda a, x: a + (x - shift) * (x - shift))
    return F.when(n > 0, F.sqrt(s2 / n - (s / n) * (s / n)))


def aggregate(df: DataFrame, group_keys: Sequence[Column | str],
              *items: Column) -> DataFrame:
    """Aggregate (kAggregate): groupKeys → groupItems.

    With empty ``group_keys`` this is a global aggregate and reproduces the
    reference's empty-input default row.
    """
    if group_keys:
        return df.groupBy(*group_keys).agg(*items)
    return df.agg(*items)
