"""Row-level operators: Project / Filter / Dedup / Unwind / Sample /
Sort / Limit / TopN (SURVEY.md §2.2, §2.6).

Reference executors (all in ``src/graph/executor/query/``):
ProjectExecutor.cpp:13-78, FilterExecutor.cpp:13-155, DedupExecutor.cpp:12-42,
UnwindExecutor.cpp:12-54, SampleExecutor.cpp:12-33, SortExecutor.cpp:12-51,
LimitExecutor.cpp:12-60, TopNExecutor.cpp:12-91.

Every one of these is a single Catalyst-planned transformation; the
reference's hand-rolled chunk parallelism (``Executor.h:125`` runMultiJobs)
and TopN bounded-heap fusion (``TopNRule.cpp:34``) are subsumed by Spark
partitions and TakeOrderedAndProject respectively.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def project(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Project (kProject): evaluate column expressions → new table."""
    return df.select(*cols)


def filter_rows(df: DataFrame, pred: Column | str) -> DataFrame:
    """Filter (kFilter): keep rows where predicate is truthy.

    Nebula's typed-null semantics (BAD_TYPE → error) collapse to Spark's
    3-valued logic: null predicate drops the row, matching the reference's
    "not truthy" outcome for NULL.
    """
    return df.filter(pred)


def dedup(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Dedup (kDedup): distinct whole rows (or a key subset)."""
    return df.dropDuplicates(list(cols)) if cols else df.distinct()


def unwind(df: DataFrame, list_col: Column | str, alias: str,
           keep_other_cols: bool = True) -> DataFrame:
    """Unwind (kUnwind): explode a list column to rows.

    Reference semantics (UnwindExecutor.cpp:12-54): non-list explodes to the
    single value; empty list / NULL drops the row → plain ``explode`` (not
    explode_outer).
    """
    col = F.col(list_col) if isinstance(list_col, str) else list_col
    exploded = F.explode(col).alias(alias)
    if keep_other_cols:
        others = [c for c in df.columns if c != alias]
        return df.select(*others, exploded)
    return df.select(exploded)


def sample(df: DataFrame, n: int, seed: int = 42) -> DataFrame:
    """Sample (kSample): exact-N reservoir sample.

    The reference uses single-pass reservoir sampling
    (``src/common/algorithm/ReservoirSampling.h``). Distributed equivalent:
    uniform random key + global top-N — one shuffle of only the sampled keys
    (TakeOrderedAndProject), no full materialization.
    """
    return df.orderBy(F.rand(seed)).limit(n)


def sort(df: DataFrame, *order: Column | str) -> DataFrame:
    """Sort (kSort): total order by (col, direction) list."""
    return df.orderBy(*order)


def limit(df: DataFrame, count: int, offset: int = 0) -> DataFrame:
    """Limit (kLimit): offset + count truncation."""
    return df.offset(offset).limit(count) if offset else df.limit(count)


def topn(df: DataFrame, order: Sequence[Column | str], n: int) -> DataFrame:
    """TopN (kTopN): fused ORDER BY + LIMIT.

    Catalyst plans this as TakeOrderedAndProject (per-partition bounded heap
    + merge) — the exact strategy TopNExecutor.cpp implements by hand.
    """
    return df.orderBy(*order).limit(n)
