"""Sources/sinks + admin surface: DDL parsing, importer-config CSV load,
scale-layout writes, SHOW/DESC/STATS."""

from __future__ import annotations

import textwrap

import pytest

from nebula_spark.sources import (load_space_from_config, parse_ddl,
                                  write_edges, write_tag)

DDL = """
CREATE TAG IF NOT EXISTS player(name string, age int);
CREATE TAG IF NOT EXISTS team(name string);
CREATE EDGE IF NOT EXISTS like(likeness int);
CREATE TAG INDEX IF NOT EXISTS player_age_index ON player(age);
"""


def test_parse_ddl_shapes():
    schemas, indexes = parse_ddl(DDL)
    by = {(s.kind, s.name): s for s in schemas}
    assert set(by) == {("tag", "player"), ("tag", "team"), ("edge", "like")}
    p = by[("tag", "player")].schema
    assert [f.name for f in p.fields] == ["name", "age"]
    assert p.fields[1].dataType.simpleString() == "bigint"
    assert indexes[0].on == "player" and indexes[0].cols == ["age"]


@pytest.fixture(scope="module")
def csv_space(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("csvspace")
    (root / "player.csv").write_text(
        "vid,name,age\np1,Tim,42\np2,Tony,36\np3,Manu,41\n")
    (root / "like.csv").write_text(
        "src,dst,likeness\np1,p2,95\np1,p3,90\np2,p1,80\n")
    (root / "config.yaml").write_text(textwrap.dedent("""\
        space: {name: mini}
        schema: |
          CREATE TAG IF NOT EXISTS player(name string, age int);
          CREATE EDGE IF NOT EXISTS like(likeness int);
        files:
          - path: ./player.csv
            withHeader: true
            type: vertex
            vertex:
              vid: {index: 0, type: string}
              tags:
                - name: player
                  props:
                    - {name: name, type: string, index: 1}
                    - {name: age, type: int, index: 2}
          - path: ./like.csv
            withHeader: true
            type: edge
            edge:
              name: like
              srcVID: {index: 0}
              dstVID: {index: 1}
              props:
                - {name: likeness, type: int, index: 2}
        """))
    return load_space_from_config(spark, str(root / "config.yaml"))


def test_csv_space_load(csv_space):
    p = csv_space.tag("player")
    assert {(r["_vid"], r.name, r.age) for r in p.collect()} \
        == {("p1", "Tim", 42), ("p2", "Tony", 36), ("p3", "Manu", 41)}
    e = csv_space.edge("like")
    assert e.filter("_src = 'p1'").count() == 2
    assert dict(e.dtypes)["_rank"] == "bigint"


def test_admin_surface(csv_space):
    assert csv_space.show_tags() == ["player"]
    assert csv_space.show_edges() == ["like"]
    desc = csv_space.describe("player")
    assert ("age", "bigint", True) in desc
    stats = {(r.kind, r.name): r["count"]
             for r in csv_space.show_stats().collect()}
    assert stats[("tag", "player")] == 3
    assert stats[("edge", "like")] == 3
    assert stats[("space", "edges")] == 3


def test_sink_layout_roundtrip(spark, csv_space, tmp_path):
    ep = str(tmp_path / "edges")
    write_edges(csv_space.edge("like"), ep, num_partitions=2)
    back = spark.read.parquet(ep)
    assert back.count() == 3
    assert {"_src", "_dst", "_rank", "likeness"} <= set(back.columns)
    tp = str(tmp_path / "tags")
    write_tag(csv_space.tag("player"), tp, num_partitions=2)
    assert spark.read.parquet(tp).count() == 3
