"""Round-9 ADVICE.md regression pins.

1. Implicit-agg RETURN reorder must survive expression-text column names
   containing dots (``v.player.name``) — bracket access resolved them as
   nested-field paths and raised UNRESOLVED_COLUMN.
2. ``hash()`` over a nullable LONG batch: Arrow delivers the batch as
   float64, so hash(123) must still be the identity 123 (not
   murmur64a(b"123.0")) and hash(NULL) must be NULL.
3. ``execute()`` session current-space sync: read-only statements must
   not write the shared pointer back (a concurrent USE would be
   reverted); a USE committed earlier in a script survives a later
   statement's failure.
"""

from __future__ import annotations

import pytest

from nebula_spark.catalog import GraphSpace, SpaceCatalog
from nebula_spark.plans import execute


@pytest.fixture(scope="module")
def space(spark, nba):
    sp = GraphSpace(spark, "nba_r9")
    sp.create_tag("player", df=nba["player"])
    sp.create_tag("team", df=nba["team"])
    sp.create_edge("like", df=nba["like"])
    sp.create_edge("serve", df=nba["serve"])
    return sp


def test_implicit_agg_reorder_with_dotted_name(space):
    # agg item FIRST so the groupBy output order differs from the written
    # order and the reorder path runs; key name carries dots
    df = execute(space,
                 "MATCH (v:player) WHERE v.player.name == 'Tim' "
                 "RETURN count(v), v.player.name")
    assert df.columns == ["count(v)", "v.player.name"]
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0][0] == 1 and rows[0][1] == "Tim"


def test_implicit_agg_reorder_with_dotted_alias_free_group_key(space):
    df = execute(space,
                 "MATCH (v:player)-[e:like]->() "
                 "RETURN count(e), v.player.name AS n")
    got = {(r[1], r[0]) for r in df.collect()}
    # p1 likes p2,p3; p2 likes p1,p4; p3 likes p3,p5
    assert got == {("Tim", 2), ("Tony", 2), ("Manu", 2)}
    assert df.columns == ["count(e)", "n"]


def test_hash_identity_survives_null_in_batch(space):
    # the NULL forces Arrow to ship the long batch as float64; identity
    # ints and NULL must come back exact regardless of batch composition
    df = execute(space,
                 "UNWIND [123, NULL, 456, -7] AS x RETURN hash(x) AS h")
    assert [r.h for r in df.collect()] == [123, None, 456, -7]


def test_hash_string_and_int_mixed_rows(space):
    # strings still murmur64a; p4's NULL name hashes to NULL
    df = execute(space,
                 "MATCH (v:player) RETURN hash(v.player.name) AS h, "
                 "hash(v.player.age) AS ha, v.player.name AS n")
    by_name = {r.n: (r.h, r.ha) for r in df.collect()}
    from nebula_spark.functions.scalar import murmur64a
    assert by_name["Tim"] == (murmur64a(b"Tim"), 42)
    assert by_name[None][0] is None
    assert by_name[None][1] == 0  # p4's age 0, identity


def test_readonly_query_does_not_write_current_name(spark, nba):
    writes = []

    class SpyCatalog(SpaceCatalog):
        def __setattr__(self, k, v):
            if k == "current_name":
                writes.append(v)
            object.__setattr__(self, k, v)

    cat = SpyCatalog(spark)
    sp = cat.create_space("s_a")
    sp.create_tag("player", df=nba["player"])
    cat.current_name = "s_a"
    writes.clear()
    execute(cat, "LOOKUP ON player WHERE player.age > 40 "
                 "YIELD player.name AS n").collect()
    assert writes == []  # read-only statement must not touch the pointer


def test_script_use_survives_later_failure(spark, nba):
    cat = SpaceCatalog(spark)
    a = cat.create_space("s_use_a")
    a.create_tag("player", df=nba["player"])
    b = cat.create_space("s_use_b")
    b.create_tag("player", df=nba["team"].withColumnRenamed("name", "name"))
    cat.current_name = "s_use_a"
    with pytest.raises(Exception):
        execute(cat, "USE s_use_b; LOOKUP ON no_such_tag "
                     "YIELD no_such_tag.x AS x")
    assert cat.current_name == "s_use_b"  # committed USE not rolled back
