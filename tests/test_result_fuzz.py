"""Differential result-fuzz smoke: seeded trials of random nGQL queries
checked against DuckDB SQL twins / metamorphic partners (r9 verdict #1 —
the machine version of the manual sweep that found the r8
integer-division bug).

Default 500 trials (the CI gate); ``SPARK_GRAFT_FUZZ_TRIALS`` raises it
for deep runs. Every mismatch here is a silent wrong answer — fix the
engine (or, if adjudicated, the oracle encoding) and pin a golden.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from result_fuzz import (build_graph, make_duck, make_space,  # noqa: E402
                         run_trials)

TRIALS = int(os.environ.get("SPARK_GRAFT_FUZZ_TRIALS", "500"))
SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "9"))


def test_result_fuzz_smoke(spark):
    frames = build_graph(SEED)
    sp = make_space(spark, frames, name="fuzz_smoke")
    sp._fuzz_frames = frames
    con = make_duck(frames)
    mm, errs, counts = run_trials(spark, sp, con, TRIALS, SEED)
    assert not errs, f"{len(errs)} errored trials, first: {errs[0]}"
    assert not mm, (f"{len(mm)} result mismatches, first: "
                    f"{mm[0][0]}: {mm[0][1]!r}\n got={mm[0][3]}"
                    f"\nwant={mm[0][4]}")
    # the wheel must actually exercise every generator
    from tools.result_fuzz import GENERATORS
    assert len(counts) == len(GENERATORS), counts


@pytest.mark.parametrize("q,expected_distinct", [
    ("LOOKUP ON player WHERE player.age > 40 "
     "YIELD DISTINCT player.name AS n", True),
])
def test_lookup_yield_distinct_golden(spark, nba, q, expected_distinct):
    """YIELD DISTINCT rides the generic yield_clause into LOOKUP
    (parser.yy:2202 -> 1583) — parser gap found by the result-fuzzer."""
    from nebula_spark.catalog import GraphSpace
    from nebula_spark.plans import execute
    sp = GraphSpace(spark, "nba_lkd")
    # duplicate names across vids so DISTINCT is observable
    players = spark.createDataFrame(
        [("a", "Tim", 42), ("b", "Tim", 45), ("c", "Manu", 41)],
        "_vid string, name string, age long")
    sp.create_tag("player", df=players)
    rows = [r.n for r in execute(sp, q).collect()]
    assert sorted(rows) == ["Manu", "Tim"]
    # and the non-distinct form keeps duplicates
    rows = [r.n for r in execute(
        sp, q.replace("DISTINCT ", "")).collect()]
    assert sorted(rows) == ["Manu", "Tim", "Tim"]
