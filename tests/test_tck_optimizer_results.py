"""Result assertions from the reference's optimizer feature files.

The optimizer/ TCK directory pins the reference's PLAN SHAPES (operator
trees with ids/dependencies) — obsolete here by design, since Catalyst
owns plan shapes (SURVEY §2, TCK-coverage note). But several scenarios
ALSO carry result tables; those are engine semantics and transcribe
directly. Queries + expected rows from:
  optimizer/PrunePropertiesRule.feature ("optional match", :562)
  optimizer/TopNRule.feature
  optimizer/PushFilterDownTraverseRule.feature
Plan health on our side is pinned separately (tests/test_plans.py
PushedFilters / AQE-skew assertions), not as operator-tree diffs.
"""

from __future__ import annotations

import pytest

from nebula_spark.plans import execute
from tests.test_tck_goldens import nba_space  # noqa: F401 — fixture


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_prune_properties_optional_match_results(nba_space):  # noqa: F811
    """PrunePropertiesRule.feature "optional match" — mixed-direction
    3-hop MATCH + WITH aggregate + OPTIONAL MATCH re-entry + second
    aggregate; values and column names exactly the reference's."""
    df = execute(nba_space, """
        MATCH (v:player)-[:like]-(:player)<-[:teammate]-(b:player)
              -[:serve]->(t:team)
          WHERE id(v) == 'Tim Duncan' AND b.player.age > 20
        WITH v, count(b) AS countB, t
        OPTIONAL MATCH (v)-[:like]-()<-[:like]-(oldB)-[:serve]->(t)
        WITH v, countB, t, count(oldB) AS cb
        RETURN t.team.name, sum(countB)
    """)
    assert df.columns == ["t.team.name", "sum(countB)"]
    assert rows(df, *df.columns) == [("Hornets", 3), ("Spurs", 11)]


def test_topn_rule_results(nba_space):  # noqa: F811
    """TopNRule.feature — ORDER BY | LIMIT over a GO pipe (the reference
    fuses these into TopN; Spark plans TakeOrderedAndProject)."""
    df = execute(nba_space, 'GO 1 STEPS FROM "Marco Belinelli" OVER like '
                            "YIELD like.likeness AS likeness | "
                            "ORDER BY $-.likeness | LIMIT 2")
    assert [r.likeness for r in df.collect()] == [50, 55]
    df = execute(nba_space, 'GO 1 STEPS FROM "Marco Belinelli" OVER like '
                            "REVERSELY YIELD like.likeness AS likeness | "
                            "ORDER BY $-.likeness | LIMIT 1")
    assert [r.likeness for r in df.collect()] == [83]


def test_push_filter_down_traverse_results(nba_space):  # noqa: F811
    """PushFilterDownTraverseRule.feature — edge-prop and rank() WHERE
    filters on MATCH relationships; values from the reference tables."""
    df = execute(nba_space, "MATCH (v:player)-[e:like]->(v2) "
                            "WHERE e.likeness > 99 "
                            "RETURN e.likeness, v2.player.age")
    assert df.columns == ["e.likeness", "v2.player.age"]
    assert rows(df, *df.columns) == [(100, 31), (100, 43)]
    df = execute(nba_space, "MATCH (v:player)-[e:like]->(v2) "
                            "WHERE rank(e) == 0 RETURN COUNT(*)")
    assert [tuple(r) for r in df.collect()] == [(81,)]


def test_collapse_project_integer_division(nba_space):  # noqa: F811
    """CollapseProjectRule.feature — `age/10` over int columns is C++
    INTEGER division (Value.cpp operator/: truncation toward zero), not
    true division; found by the r8 optimizer-results sweep (we returned
    3.9 where the reference returns 3)."""
    df = execute(nba_space, """
        MATCH (v:player)
        WHERE v.player.age > 38
        WITH v, v.player.age AS age, v.player.age/10 AS iage,
             v.player.age%10 AS mage, v.player.name AS name
        RETURN iage
    """)
    got = sorted(r.iage for r in df.collect())
    assert all(isinstance(x, int) for x in got)
    assert got == [3] + [4] * 10   # the feature table: ten 4s, one 3


def test_integer_division_semantics(nba_space):  # noqa: F811
    """Int/int division truncates toward zero; any float side keeps IEEE
    true division; CONSTANT /0 refuses at validation like the
    reference's folding validator (yield.feature `YIELD 1/0` →
    SemanticError `Divide by 0`) while a data-dependent /0 stays the
    DIV_BY_ZERO null."""
    [r] = execute(nba_space, "RETURN 7/2 AS a, -39/10 AS n, "
                             "7.0/2 AS f, 7/2.0 AS g").collect()
    assert (r.a, r.n, r.f, r.g) == (3, -3, 3.5, 3.5)
    with pytest.raises(ValueError, match="Divide by 0"):
        execute(nba_space, "RETURN 1/0 AS z")
    [r] = execute(nba_space, "MATCH (v:player) WHERE id(v)=='Tim Duncan' "
                             "RETURN v.player.age/(v.player.age-42) AS z"
                  ).collect()
    assert r.z is None


def test_embed_edge_all_pred_varlen_full_enumeration(nba_space):  # noqa: F811
    """EmbedEdgeAllPredIntoTraverseRule.feature `[e:like*2..4]` with
    `all(i in e where i.likeness>90)` — DOCUMENTED DEVIATION, ours is
    the correct side: the reference's expected table lists only the 11
    paths starting at Dejounte Murray, silently dropping every valid
    start vertex that itself has a qualifying in-edge (Tim/Tony/Gasols —
    an artifact of the rule being pinned, not of openCypher semantics).
    The full edge-unique enumeration over like-edges >90
    (Tony↔Tim 95s, Tim/Tony→Manu 95s, Gasol↔Gasol 99s, Dejounte→* 99s,
    LeBron→Ray 100) yields 19 paths; hand-derived:
      2-hop: Tony→Tim→{Tony,Manu}, Tim→Tony→{Tim,Manu} (95,95)×4;
             Marc→Paul→Marc, Paul→Marc→Paul (99,99)×2;
             Dejounte→{Tim,Tony}→{…} (99,95)×4; Dejounte→LeBron→Ray
             (99,100)×1
      3-hop: Dejounte→{Tim,Tony}→… (99,95,95)×4;
             Tony→Tim→Tony→Manu, Tim→Tony→Tim→Manu (95,95,95)×2
      4-hop: Dejounte prefixes of those two (99,95,95,95)×2
    The *1 case matches the reference exactly (19 rows there too)."""
    df = execute(nba_space, """
        MATCH (v:player)-[e:like*2..4]->(n)
        WHERE all(i in e where i.likeness>90)
        RETURN [i in e | i.likeness] AS likeness, n.player.age AS nage
    """)
    got = sorted((tuple(r.likeness), r.nage) for r in df.collect())
    want = sorted([
        ((95, 95), 36), ((95, 95), 41), ((95, 95), 41), ((95, 95), 42),
        ((99, 99), 34), ((99, 99), 38),
        ((99, 95), 36), ((99, 95), 41), ((99, 95), 41), ((99, 95), 42),
        ((99, 100), 43),
        ((99, 95, 95), 36), ((99, 95, 95), 41), ((99, 95, 95), 41),
        ((99, 95, 95), 42),
        ((95, 95, 95), 41), ((95, 95, 95), 41),
        ((99, 95, 95, 95), 41), ((99, 95, 95, 95), 41),
    ])
    assert got == want
    # the single-hop form agrees with the reference outright
    df1 = execute(nba_space, """
        MATCH (v:player)-[e:like*1]->(n)
        WHERE all(i in e where i.likeness>90)
        RETURN [i in e | i.likeness] AS likeness
    """)
    from collections import Counter
    c = Counter(tuple(r.likeness) for r in df1.collect())
    assert c == {(99,): 13, (95,): 5, (100,): 2}


def test_properties_on_untagged_alias(nba_space):  # noqa: F811
    """PrunePropertiesRule.feature "test properties" shape:
    properties(v) on a TAGLESS bind returns the vertex's merged prop map
    (per-tag maps coalesced by name), with field access working — was an
    empty-struct FIELD_NOT_FOUND before the r8 sweep."""
    df = execute(nba_space, 'match (v)-[]->(b:player) '
                            'where id(v) == "Tim Duncan" '
                            'return id(v) AS id, properties(v).name AS name, '
                            'v.player.age AS age')
    assert sorted(set(tuple(r) for r in df.collect())) == \
        [("Tim Duncan", "Tim Duncan", 42)]
    df = execute(nba_space,
                 'match (v:player) '
                 'where properties(v).name=="LaMarcus Aldridge" '
                 'return properties(v).age AS a')
    assert [r.a for r in df.collect()] == [33]


def test_return_preserves_written_column_order_with_agg(nba_space):  # noqa: F811
    """PrunePropertiesRule.feature pins `RETURN count(v2), v1` with the
    count FIRST — groupBy().agg() emits keys-then-aggregates, so the
    executor must restore the written order (r8 sweep find)."""
    df = execute(nba_space, 'MATCH (v1)-[:like]->(v2) '
                            'WHERE id(v1) == "Tim Duncan" '
                            'RETURN count(v2), v1')
    assert df.columns == ["count(v2)", "v1"]
    [r] = df.collect()
    assert r[0] == 2 and r[1].vid == "Tim Duncan"
