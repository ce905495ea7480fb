"""Unit tests for the Gherkin result-table runner itself (no Spark):
the TCK value grammar, the comparator's canonical forms, and the
feature-file parser's step folding. The sweep that USES the runner is
tests/test_tck_optimizer_sweep.py."""

from __future__ import annotations

import os

import pytest

from tests.tck_runner import (Edge, Path, Regex, Vertex, canon_actual,
                              parse_cell, parse_feature, values_match)

FEATURE_DIR = "/root/reference/tests/tck/features/optimizer"


def test_scalar_cells():
    assert parse_cell("42") == 42
    assert parse_cell("-3.5") == -3.5
    assert parse_cell('"hi"') == "hi"
    assert parse_cell("NULL") is None
    assert parse_cell("EMPTY") is None          # documented EMPTY→NULL fold
    assert parse_cell("true") is True
    assert parse_cell("[1, 2]") == [1, 2]
    assert parse_cell("{a: 1}") == {"a": 1}
    assert isinstance(parse_cell("/\\d+/"), Regex)


def test_graph_cells():
    v = parse_cell('("Tim" :player{age: 42} :bachelor{name: "Tim"})')
    assert v == Vertex("Tim", (("player", (("age", 42),)),
                               ("bachelor", (("name", "Tim"),))))
    e = parse_cell('[:like "a"->"b" @1 {likeness: 80}]')
    assert e == Edge("like", "a", "b", 1, (("likeness", 80),))
    p = parse_cell('<("a")-[:like@0]->("b")<-[:serve]-("c")>')
    assert isinstance(p, Path)
    assert p.start.vid == "a"
    assert [h[0] for h in p.hops] == ["F", "R"]


def test_values_match_vertex_is_vid_based():
    exp = parse_cell('("Tim" :player{age: 42})')
    assert values_match(exp, Vertex("Tim", ()))           # pruned struct ok
    assert not values_match(exp, Vertex("Tony", ()))
    # a prop OUR struct carries must agree when expected names it
    assert not values_match(exp, Vertex("Tim", (("", {"age": 43}),)))


def test_values_match_edge_rank_semantics():
    """Decided r10/r11: a cell WITHOUT @rank leaves rank UNCHECKED (the
    corpus relies on it for parallel edges — VariableLengthPattern lists
    two identical cells, one per rank); a cell WITH @rank pins it."""
    exp = parse_cell('[:like "a"->"b"]')
    assert values_match(exp, Edge(None, "a", "b", 0, ()))
    assert values_match(exp, Edge(None, "a", "b", 2, ()))      # wildcard
    assert not values_match(exp, Edge("serve", "a", "b", 0, ()))
    pinned = parse_cell('[:like "a"->"b" @0]')
    assert values_match(pinned, Edge(None, "a", "b", 0, ()))
    assert not values_match(pinned, Edge(None, "a", "b", 2, ()))


def test_regex_cell_matches_rendered():
    assert values_match(Regex(r"\d+"), 2018)
    assert not values_match(Regex(r"\d+"), "x2018")


def test_canon_actual_rows():
    from pyspark.sql import Row
    assert canon_actual(Row(vid="a", age=1)) == \
        Vertex("a", (("", {"age": 1}),))
    assert canon_actual(Row(s="a", d="b", r=0)) == Edge(None, "a", "b", 0)
    p = canon_actual(Row(start="a",
                         hops=[Row(s="a", d="b", r=0, t=1, et="like")]))
    assert isinstance(p, Path) and p.hops[0][0] == "F"


@pytest.mark.skipif(not os.path.isdir(FEATURE_DIR),
                    reason="reference TCK corpus absent")
def test_feature_parse_shapes():
    scs = parse_feature(os.path.join(FEATURE_DIR, "TopNRule.feature"))
    assert len(scs) == 4
    assert all(s.space == "nba" for s in scs)
    assert all(len(s.asserts) == 1 for s in scs)
    # ORDER BY | LIMIT queries keep ordered compare; the @skip'd
    # PushFilterDownExpandAll scenarios carry the tag
    scs = parse_feature(os.path.join(
        FEATURE_DIR, "PushFilterDownExpandAllRule.feature"))
    assert any("@skip" in s.tags for s in scs)
    # LIMIT-without-ORDER-BY downgrades to count-only
    scs = parse_feature(os.path.join(
        FEATURE_DIR, "PushLimitDownScanEdgesRule.feature"))
    assert all(a.mode == "count"
               for s in scs for a in s.asserts)
