"""Temporal + full-text function families (SURVEY.md §2.9 / §2.1
FulltextIndexScan analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nebula_spark.functions import fulltext as FT
from nebula_spark.functions import temporal as T


def test_temporal_components_and_arith(spark):
    df = spark.createDataFrame([("1995-11-30",)], ["d"]) \
        .select(T.d_date(F.col("d")).alias("d"))
    r = df.select(
        T.extract("year", F.col("d")).alias("y"),
        T.extract("quarter", F.col("d")).alias("q"),
        T.datetime_plus(F.col("d").cast("timestamp"),
                        T.duration(months=3)).cast("date").cast("string")
         .alias("plus3m"),
        T.date_diff_days(F.lit("1996-01-01"), F.col("d")).alias("dd"),
    ).collect()[0]
    # end-of-month clamp: Nov 30 + 3 months = Feb 29 (1996 is a leap year)
    assert (r.y, r.q, r.plus3m, r.dd) == (1995, 4, "1996-02-29", 32)


def test_time_struct(spark):
    r = spark.range(1).select(T.d_time(F.lit("10:20:30.5")).alias("t")) \
        .collect()[0].t
    assert (r.hour, r.minute, r.sec) == (10, 20, 30.5)


def test_duration_unnormalized(spark):
    r = spark.range(1).select(T.duration(months=1, days=2, hours=3)
                              .alias("dur")).collect()[0].dur
    assert r.months == 1 and r.seconds == (2 * 24 + 3) * 3600


def test_fulltext_predicates(spark):
    df = spark.createDataFrame(
        [(1, "fast hash join on rows"), (2, "slow merge sort"),
         (3, "hash hash hash")], ["id", "t"])
    c = F.col("t")
    assert [r.id for r in df.filter(FT.ft_prefix(c, "fast")).collect()] == [1]
    assert sorted(r.id for r in
                  df.filter(FT.ft_wildcard(c, "*hash*")).collect()) == [1, 3]
    assert [r.id for r in df.filter(FT.ft_regexp(c, "m.rge")).collect()] == [2]
    # fuzzy: 'jion' is 1 transposition-ish (2 edits) from 'join'
    assert [r.id for r in
            df.filter(FT.ft_fuzzy(c, "jion", 2)).collect()] == [1]
    scores = {r.id: r.s for r in
              df.select("id", FT.ft_score(c, "hash").alias("s")).collect()}
    assert scores == {1: 1, 2: 0, 3: 3}


def test_distinct_std_no_cancellation(spark):
    """STD(DISTINCT …) must survive mean² ≫ variance: the one-pass
    E[x²]−E[x]² form returned 0.0 for values near 1e9 with std 1
    (catastrophic cancellation in doubles); the shift-by-min form is exact
    here. Population std of {1e9−1, 1e9, 1e9+1} = sqrt(2/3)."""
    import math

    from nebula_spark.operators.aggregate import agg_call, aggregate

    df = spark.createDataFrame(
        [(1e9 - 1,), (1e9,), (1e9,), (1e9 + 1,)], "x double")
    got = aggregate(df, [], agg_call("std", "x", distinct=True)
                    .alias("sd")).collect()[0].sd
    assert abs(got - math.sqrt(2.0 / 3.0)) < 1e-9
    # non-distinct path (stddev_pop) sanity on the same data
    got2 = aggregate(df, [], agg_call("std", "x").alias("sd")) \
        .collect()[0].sd
    assert abs(got2 - math.sqrt(0.5)) < 1e-6


def test_ft_bm25_hand_computed(spark):
    """BM25 against a hand-computed value: corpus of 3 docs, term 'cat' in
    2 of them. idf = ln(1 + (3-2+0.5)/(2+0.5)); dls are 4, 2, 2 so
    avgdl = 8/3."""
    import math

    from nebula_spark.functions.fulltext import ft_bm25

    df = spark.createDataFrame(
        [(1, "cat sat on cat"), (2, "a cat"), (3, "dog runs")],
        "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in ft_bm25(df, "cat").collect()}
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    avgdl = 8 / 3.0
    d1 = idf * 2 * 2.2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 4 / avgdl))
    d2 = idf * 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / avgdl))
    assert abs(got[1] - d1) < 1e-9
    assert abs(got[2] - d2) < 1e-9
    assert got[3] == 0.0
    assert got[1] > got[2]  # higher tf, same idf -> higher score
