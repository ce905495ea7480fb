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
    "sum": F.sum,
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
    "sum": F.sum_distinct,
}


def agg_call(name: str, col: Column | str, distinct: bool = False) -> Column:
    """Build one aggregate item the way AggregateExpression does.

    DISTINCT for functions without a native distinct builder goes through
    SQL-expression form so Catalyst plans the distinct-aggregate rewrite
    (expand + two-phase agg) itself.
    """
    name = name.lower()
    if distinct:
        if name in _DISTINCT_FNS:
            return _DISTINCT_FNS[name](col)
        cname = col if isinstance(col, str) else col._jc.toString()  # noqa: SLF001
        sql_name = {"collect": "collect_list", "std": "stddev_pop"}.get(name, name)
        return F.expr(f"{sql_name}(DISTINCT {cname})")
    if name not in _AGG_FNS:
        raise ValueError(f"unknown aggregate function: {name}")
    return _AGG_FNS[name](col)


def aggregate(df: DataFrame, group_keys: Sequence[Column | str],
              *items: Column) -> DataFrame:
    """Aggregate (kAggregate): groupKeys → groupItems.

    With empty ``group_keys`` this is a global aggregate and reproduces the
    reference's empty-input default row.
    """
    if group_keys:
        return df.groupBy(*group_keys).agg(*items)
    return df.agg(*items)
