"""Mechanical result-table sweep over the reference's READ-ONLY TCK
feature directories (r9 — extends the optimizer sweep to the rest of
the corpus via tests/tck_runner.py). Every `Then the result should be`
table in the listed directories is parsed off the read-only reference
checkout and executed against our engine; the hand-transcribed goldens
(test_tck_goldens.py et al.) remain as the curated core, this sweep is
the exhaustive outer loop.

Skips are a ledger, not a rug: every entry names the scenario and the
adjudication (upstream @skip, templating steps the runner doesn't
drive, documented deviations, fixture-less spaces). `...hashed` result
tables check row count + headers only (the reference hashes cell values
with its own renderer).
"""

from __future__ import annotations

import os

import pytest

from nebula_spark.catalog import GraphSpace
from nebula_spark.plans import execute
from tests.tck_runner import parse_feature, run_assertion
from tests.test_tck_goldens import build_nba_space, nba_space  # noqa: F401
from tests.test_ngdata_goldens import ngdata_space  # noqa: F401
from tests.test_tck_optimizer_sweep import student_space  # noqa: F401

ROOT = "/root/reference/tests/tck/features"

# directories swept. History: the first six were brought green in r9;
# the r9-boundary expansion to the full corpus shipped red (r10 verdict)
# and was burned down across r10-r11 — every remaining red is either
# fixed or carries a named adjudication in the ledgers below.
DIRS = ["go", "path", "set", "yield", "subgraph", "aggregate",
        "match", "expression", "fetch", "lookup", "function",
        "insert", "update", "delete", "ttl", "mutate", "ddl",
        "index", "schema", "basic", "explain", "parser", "geo",
        "bugfix", "fulltext_index"]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ROOT), reason="reference TCK corpus absent")

# (feature-file, scenario-name) -> adjudication
SKIP: dict = {
    ("yield/yield.feature", "Base"):
        "heterogeneous container literal ([1, 1.1, …, true]) — a Spark "
        "array has one element type; documented deviation (README "
        "set-ops/dynamic-Value entry). Scalar yield forms are covered "
        "by the rest of the file plus test_tck_residuals.py",
    ("yield/parameter.feature", "[param-test-003] return parameters"):
        "returns $p5=[1,true,3] / $p6 map with mixed value types — "
        "heterogeneous containers, same documented deviation",
    ("yield/parameter.feature", "[param-test-004] cypher with parameters"):
        "same heterogeneous container parameters through MATCH",
    ("match/MatchGroupBy.feature", "[9] Match GroupBy"):
        "collect([name, likeness, team]) builds heterogeneous "
        "string+int inner lists — a Spark array has one element type, "
        "so ints coerce to strings; documented deviation (README "
        "dynamic-Value entry). [5]-[8] cover grouped collect forms",
    ("match/Unwind.feature", "unwind return"):
        "UNWIND [1, [2, 3, NULL, 4], 5] — heterogeneous outer list "
        "(INT and LIST elements), same documented deviation; the "
        "homogeneous unwind forms are covered by yield/unwind fuzz "
        "lane + ngql_unwind oracle slot",
}

SKIP[("expression/TimeComputation.feature",
      "datetime add or subtract duration [1]0")] = (
    "upstream-broken query text: the first outline's second step is "
    "literally `WITH  as x,  as d` (TimeComputation.feature:70 — empty "
    "expressions, a typo in the reference corpus); the corrected "
    "duplicate outline at :85 runs green")

# (feature-file, Then-line) -> an engine-raised error satisfies the
# assertion (documented deviations where the reference's outcome is an
# accident of ITS plan shape, not semantics)
ERROR_OK: dict = {
    ("match/MatchByVariable.feature", 958):
        "`v1.player.name IN names` over a scalar binding: the reference "
        "raises 'Failed to evaluate condition' in FOUR of the five "
        "spellings in this scenario but returns 0 rows in this one — "
        "the difference is which executor evaluates the error Value, "
        "not semantics. Our engine refuses IN-over-scalar uniformly "
        "(same message), which matches the other four assertions.",
}

# (feature-file, Then-line) -> the reference expects an ERROR there but
# our engine legitimately succeeds (documented deviations where the
# refused capability is a non-feature of the Spark design)
NO_ERROR_OK: dict = {
    ("lookup/LookUp.feature", 1065):
        "LOOKUP without a CREATE INDEX: index DDL is metadata-only here "
        "— scans ride Parquet stats + Catalyst pushdown (SURVEY §2.1 "
        "IndexScan note), so the reference's 'no index to use at "
        "runtime' refusal has no analog; the query returns the right "
        "rows instead",
    ("lookup/LookUp.IntVid.feature", 847):
        "same index-free LOOKUP deviation, IntVid spelling",
}

# (feature-file, Then-line) -> downgrade one assertion to count-only
RELAX_TO_COUNT: dict = {
    ("go/GO.feature", 1850):
        "ORDER BY (src, like_src) | OFFSET 1 LIMIT 2 with full ties on "
        "both sort keys: which tied rows occupy the window is undefined "
        "— the unsorted columns differ per pick",
    ("go/GO.feature", 1860):
        "the LIMIT-2-OFFSET-1 spelling of the same tied window",
    ("go/GoYieldVertexEdge.feature", 1608):
        "same tied-sort-keys OFFSET/LIMIT window as GO.feature:1850",
    ("go/GoYieldVertexEdge.feature", 1618):
        "the LIMIT-2-OFFSET-1 spelling of the same tied window",
    ("go/GroupbyLimit.feature", 116):
        "ORDER BY $-.name LIMIT 1 where every name is NULL ($$.team.name "
        "over like edges): which tied row survives the limit is "
        "undefined; the downstream GO fans out from whichever id won — "
        "only the row count is semantics",
    ("set/Set.feature", 213):
        "UNION ALL of a string column with a long column: the "
        "reference's dynamic Value model keeps per-row types; a Spark "
        "column has ONE type, so the union coerces the long to string "
        "('1999' for 1999) — documented deviation (README), row "
        "count/shape still checked",
}


def _collect():
    out = []
    if not os.path.isdir(ROOT):
        return out
    for d in DIRS:
        dd = os.path.join(ROOT, d)
        for f in sorted(os.listdir(dd)):
            if f.endswith(".feature"):
                for sc in parse_feature(os.path.join(dd, f)):
                    sc.feature = f"{d}/{f}"
                    out.append(sc)
    return out


SCENARIOS = _collect()
_FRESH = [0]


@pytest.mark.parametrize(
    "sc", SCENARIOS, ids=lambda s: f"{s.feature}::{s.name}"[:140])
def test_tck_feature_results(sc, request, spark):
    from nebula_spark.functions import scalar as _sc
    _sc.NOW_OVERRIDE[0] = None    # per-scenario logical TTL clock reset
    if "@skip" in sc.tags:
        pytest.skip("upstream @skip — the reference's own runner "
                    "excludes this scenario")
    reason = SKIP.get((sc.feature, sc.name))
    if reason:
        pytest.skip(reason)
    if sc.unsupported:
        pytest.skip(f"runner-unsupported step: {sc.unsupported!r}")
    if not sc.asserts:
        pytest.skip("no result assertions (plan-shape/admin only)")
    if sc.fresh_space == "nba_int_vid":
        from tests.test_tck_goldens import build_nba_int_space
        _FRESH[0] += 1
        space = build_nba_int_space(spark, name=f"tcksw_{_FRESH[0]}")
    elif sc.fresh_space == "nba" or (sc.space == "nba" and sc.setup):
        _FRESH[0] += 1
        space = build_nba_space(spark, name=f"tcksw_{_FRESH[0]}")
    elif sc.space == "nba":
        space = request.getfixturevalue("nba_space")
    elif sc.space == "ngdata":
        space = request.getfixturevalue("ngdata_space")
    elif sc.space == "student":
        space = request.getfixturevalue("student_space")
    elif sc.space is None and (sc.new_space or sc.setup):
        _FRESH[0] += 1
        space = GraphSpace(spark, f"tcksw_{_FRESH[0]}")
        vt = (sc.new_space or {}).get("vid_type", "")
        if "int" in vt:
            space.options = {"vid_type": "int64"}
        elif vt:
            # carry the declared type verbatim — FIXED_STRING(N) spaces
            # enforce vid length on mutation (VidInvalidLength.feature)
            space.options = {"vid_type": vt}
    else:
        pytest.skip(f"space {sc.space!r} not modeled")
    texts = sc.setup + [a.query for a in sc.asserts
                        if getattr(a, "query", None)]
    if any("create space" in t.lower() for t in texts):
        # scenario drives its own space lifecycle (CREATE SPACE/USE) —
        # give it a real catalog seeded with the fixture space; a
        # `CREATE SPACE x AS nba` clone (FixIterCrash.feature) needs
        # the nba fixture present under its canonical name
        from nebula_spark.catalog import SpaceCatalog
        cat = SpaceCatalog(spark)
        cat.spaces[space.name] = space
        cat.current_name = space.name
        if any(" as nba" in t.lower() for t in texts) \
                and "nba" not in cat.spaces:
            cat.spaces["nba"] = build_nba_space(
                spark, name=f"tcksw_nbaclone_{_FRESH[0]}")
            cat.spaces["nba"].name = "nba"
        space = cat
    for ddl in sc.setup:
        execute(space, ddl)
    for a in sc.asserts:
        if (sc.feature, a.line) in RELAX_TO_COUNT:
            a.mode = "count"
        if (sc.feature, a.line) in NO_ERROR_OK:
            try:
                run_assertion(space, a, execute)
            except AssertionError as exc:
                if "expected an error" not in str(exc):
                    raise
            continue
        if (sc.feature, a.line) in ERROR_OK:
            try:
                run_assertion(space, a, execute)
            except Exception as exc:  # noqa: BLE001
                # only the adjudicated engine error is forgiven; a
                # wrong-answer assertion failure must still surface
                if "Failed to evaluate condition" not in str(exc):
                    raise
            continue
        run_assertion(space, a, execute)
