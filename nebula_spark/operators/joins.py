"""Join operators (SURVEY.md §2.4).

The reference implements every join as a single-node in-memory hash join on
expression keys (``src/graph/executor/query/InnerJoinExecutor.cpp:12-298``,
``LeftJoinExecutor.cpp:14-260``, base ``JoinExecutor.cpp:1-125``) — no
broadcast tier, no sort-merge, no spill. Under Spark each call below is
planned by Catalyst/AQE into broadcast-hash, shuffled-hash or sort-merge with
skew mitigation; ``hint`` lets callers force broadcast for known-small sides
(dimension tables, vid seed sets).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_broadcast(df: DataFrame, hint: str | None) -> DataFrame:
    return F.broadcast(df) if hint == "broadcast" else df


def inner_join(left: DataFrame, right: DataFrame,
               on: Sequence[str] | Column, hint: str | None = None) -> DataFrame:
    """HashInnerJoin (kHashInnerJoin): multi-key equi inner join."""
    return left.join(_maybe_broadcast(right, hint), on, "inner")


def left_join(left: DataFrame, right: DataFrame,
              on: Sequence[str] | Column, hint: str | None = None) -> DataFrame:
    """HashLeftJoin (kHashLeftJoin): left outer equi join, nulls padded."""
    return left.join(_maybe_broadcast(right, hint), on, "left")


def semi_join(left: DataFrame, right: DataFrame,
              on: Sequence[str] | Column, hint: str | None = None) -> DataFrame:
    """PatternApply (kPatternApply, isAntiPred_=false): keep LHS rows whose
    key exists in RHS — implements ``WHERE (n)-[:e]->(m)`` / ``exists()``
    (PatternApplyExecutor.cpp:15-154)."""
    return left.join(_maybe_broadcast(right, hint), on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame,
              on: Sequence[str] | Column, hint: str | None = None) -> DataFrame:
    """PatternApply (isAntiPred_=true, PatternApplyExecutor.cpp:36):
    ``WHERE NOT (pattern)``."""
    return left.join(_maybe_broadcast(right, hint), on, "left_anti")


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """CartesianProduct / CrossJoin (CartesianProductExecutor.cpp:1-71)."""
    return left.crossJoin(right)


def roll_up_apply(left: DataFrame, right: DataFrame, on: Sequence[str],
                  collect_col: str | Column, alias: str,
                  sort_items: bool = True) -> DataFrame:
    """RollUpApply (kRollUpApply, RollUpApplyExecutor.cpp:15-180): group RHS
    values into a list per LHS key and attach as a column (list-collecting
    pattern expressions).

    Spark-first shape: pre-aggregate the RHS **before** the join so the join
    input is one row per key (map-side combine shrinks the shuffle), then
    left-join and coalesce missing groups to the empty list — matching the
    reference's "no match → empty list" semantics. ``sort_items`` gives a
    deterministic list order (the reference preserves RHS row order, which is
    not a distributed-safe contract).
    """
    col = F.col(collect_col) if isinstance(collect_col, str) else collect_col
    items = F.collect_list(col)
    if sort_items:
        items = F.sort_array(items)
    grouped = right.groupBy(*on).agg(items.alias(alias))
    joined = left.join(grouped, list(on), "left")
    empty = F.array().cast(grouped.schema[alias].dataType)
    return joined.withColumn(alias, F.coalesce(F.col(alias), empty))
