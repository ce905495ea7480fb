"""Geo function family (SURVEY.md §2.9; reference GeoFunction.cpp /
GeoIndex.cpp). Point math is JVM-side; polygon cover is the numpy UDF
path; cell ids follow the prefix contract of S2 cells."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nebula_spark.functions import geo as G


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 0.0), (3, 10.0, 10.0), (4, -170.0, 80.0)],
        ["id", "lng", "lat"],
    ).withColumn("g", G.st_point(F.col("lng"), F.col("lat")))


def test_point_roundtrip(pts):
    r = pts.select(G.st_x("g").alias("x"), G.st_y("g").alias("y"),
                   G.st_astext(F.col("g")).alias("t")).collect()
    assert (r[0].x, r[0].y) == (0.0, 0.0)
    assert r[1].t == "POINT(1.0 0.0)"


def test_isvalid_and_fromtext(spark):
    df = spark.createDataFrame(
        [("POINT(1 2)",), ("POINT(200 2)",), ("LINESTRING(0 0, 1 1)",),
         ("POLYGON((0 0, 1 0, 1 1, 0 0))",), ("POLYGON((0 0, 1 0, 1 1))",),
         ("banana",)], ["w"])
    got = [r.v for r in df.select(G.st_isvalid(F.col("w")).alias("v")).collect()]
    assert got == [True, False, True, True, False, False]
    parsed = [r.p for r in
              df.select(G.st_geogfromtext(F.col("w")).alias("p")).collect()]
    assert parsed[0] == "POINT(1 2)" and parsed[1] is None


def test_distance_known_value(spark):
    # 1° of longitude on the equator = R * pi/180
    df = spark.range(1).select(
        G.st_distance(G.st_point(F.lit(0.0), F.lit(0.0)),
                      G.st_point(F.lit(1.0), F.lit(0.0))).alias("d"))
    d = df.collect()[0].d
    assert abs(d - G.EARTH_RADIUS_M * math.pi / 180) < 1e-6


def test_dwithin_inclusive_exclusive(spark):
    one_deg = G.EARTH_RADIUS_M * math.pi / 180
    a = G.st_point(F.lit(0.0), F.lit(0.0))
    b = G.st_point(F.lit(1.0), F.lit(0.0))
    r = spark.range(1).select(
        G.st_dwithin(a, b, one_deg + 1e-3).alias("win"),
        G.st_dwithin(a, b, one_deg - 1e-3, exclusive=True).alias("wout"))
    row = r.collect()[0]
    assert row.win is True and row.wout is False


def test_centroid_linestring(spark):
    df = spark.range(1).select(
        G.st_centroid(F.lit("LINESTRING(0 0, 2 0, 2 2, 0 2)")).alias("c"))
    assert df.collect()[0].c == "POINT(1.0 1.0)"


def test_covers_point(spark):
    poly = "POLYGON((-50 -30, 50 -30, 50 30, -50 30, -50 -30))"
    df = spark.createDataFrame(
        [(poly, "POINT(0 0)"), (poly, "POINT(50 0)"), (poly, "POINT(51 0)"),
         (poly, "POINT(0 30)"), (poly, "POINT(0 -31)")], ["p", "pt"])
    got = [r.c for r in
           df.select(G.st_covers_point(F.col("p"), F.col("pt")).alias("c"))
           .collect()]
    assert got == [True, True, False, True, False]


def test_cell_prefix_contract(pts):
    r = pts.select(G.cell_id_from_point(F.col("g"), 8).alias("c8"),
                   G.cell_id_from_point(F.col("g"), 10).alias("c10")).collect()
    for row in r:
        assert row.c10 >> 4 == row.c8


def test_covering_cells_and_prefilter(spark):
    rows = [(i, float(i % 90), float(i % 45)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "lng", "lat"]) \
        .withColumn("g", G.st_point(F.col("lng"), F.col("lat")))
    exact = df.filter(
        G.st_dwithin(F.col("g"), G.st_point(F.lit(10.0), F.lit(10.0)),
                     500_000.0))
    fast = G.dwithin_prefilter(df, "g", 10.0, 10.0, 500_000.0, level=6)
    assert sorted(r.id for r in fast.collect()) \
        == sorted(r.id for r in exact.collect())


def test_intersects_shapes(spark):
    """General st_intersects across WKT kinds, including non-axis-aligned
    segments and containment (GeoFunction.cpp:106-148 parity cases)."""
    tri = "POLYGON((0 0, 10 0, 5 10, 0 0))"
    cases = [
        # diagonal segment crossing the triangle
        ("LINESTRING(-5 5, 15 5)", tri, True),
        # segment entirely outside
        ("LINESTRING(-5 -5, -1 -1)", tri, False),
        # segment entirely inside (no edge crossing — containment case)
        ("LINESTRING(4 1, 6 1)", tri, True),
        # touching at a single vertex counts (boundary-inclusive)
        ("LINESTRING(-5 -5, 0 0)", tri, True),
        # polygon fully inside polygon
        ("POLYGON((4 1, 6 1, 5 2, 4 1))", tri, True),
        # overlapping polygons (edge crossings)
        ("POLYGON((8 -1, 12 -1, 12 3, 8 3, 8 -1))", tri, True),
        # disjoint polygons
        ("POLYGON((20 20, 21 20, 21 21, 20 21, 20 20))", tri, False),
        # point on polygon edge
        ("POINT(5 0)", tri, True),
        ("POINT(50 50)", tri, False),
        # line-line crossing and parallel-disjoint
        ("LINESTRING(0 0, 10 10)", "LINESTRING(0 10, 10 0)", True),
        ("LINESTRING(0 0, 10 0)", "LINESTRING(0 1, 10 1)", False),
        # collinear overlapping segments
        ("LINESTRING(0 0, 5 0)", "LINESTRING(3 0, 8 0)", True),
    ]
    df = spark.createDataFrame([(a, b) for a, b, _ in cases], ["a", "b"])
    got = [r.x for r in
           df.select(G.st_intersects(F.col("a"), F.col("b")).alias("x"))
           .collect()]
    assert got == [e for _, _, e in cases]


def test_polygon_holes_point_coverage(spark):
    """Interior loops (GeoUtils.h:43): even-odd over all rings — a point
    inside the hole is NOT covered, on the hole rim IS covered (S2 closed
    polygon), outside-hole interior stays covered."""
    from nebula_spark.functions.geo import st_covers_point
    holed = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    pts = [("in_shell", "POINT(2 2)", True),
           ("in_hole", "POINT(5 5)", False),
           ("hole_rim", "POINT(4 5)", True),
           ("shell_rim", "POINT(0 5)", True),
           ("outside", "POINT(11 5)", False)]
    df = spark.createDataFrame([(n, holed, p) for n, p, _ in pts],
                               "name string, poly string, pt string")
    got = {r.name: r.c for r in df.select(
        "name", st_covers_point(F.col("poly"), F.col("pt")).alias("c")
    ).collect()}
    assert got == {n: e for n, _, e in pts}


def test_polygon_holes_intersects(spark):
    """st_intersects with holes: a segment wholly inside the hole does not
    intersect; one crossing the hole rim does; a polygon wholly inside the
    hole does not (even-odd containment)."""
    from nebula_spark.functions.geo import st_intersects
    holed = "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
    cases = [("line_in_hole", "LINESTRING(4 4, 6 6)", False),
             ("line_cross_rim", "LINESTRING(5 5, 12 5)", True),
             ("poly_in_hole", "POLYGON((4 4, 6 4, 6 6, 4 6, 4 4))", False),
             ("poly_overlap", "POLYGON((8 8, 12 8, 12 12, 8 12, 8 8))", True)]
    df = spark.createDataFrame([(n, holed, g) for n, g, _ in cases],
                               "name string, a string, b string")
    got = {r.name: r.c for r in df.select(
        "name", st_intersects(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got == {n: e for n, _, e in cases}


def test_covering_cells_capped_coarsens():
    """covering_cells_capped mirrors S2 RegionCoverer's max_cells: a
    whole-earth bbox at level 12 would be ~16.7M driver-side cells;
    the cap coarsens the level until the count fits, and the returned
    effective level lets the caller bucket data to match."""
    from nebula_spark.functions import geo as G
    cells, lv = G.covering_cells_capped(-180, -90, 180, 90, level=12,
                                        max_cells=256)
    assert lv < 12 and len(cells) <= 256 and len(cells) > 0
    # a tiny bbox keeps the requested level
    cells, lv = G.covering_cells_capped(10.0, 10.0, 10.1, 10.1, level=12,
                                        max_cells=256)
    assert lv == 12
    # capped covering at the effective level equals the direct
    # enumeration at that level (same prefilter universe)
    direct = G.covering_cell_ids(-180, -90, 180, 90, level=lv)
    cells2, lv2 = G.covering_cells_capped(-180, -90, 180, 90, level=lv,
                                          max_cells=1 << 62)
    assert lv2 == lv and sorted(cells2) == sorted(direct)


def test_dwithin_prefilter_huge_radius_exact(spark):
    """A quarter-earth radius forces the cap to coarsen; the prefilter
    must stay EXACT (prefilter+refine == brute-force refine)."""
    from nebula_spark.functions import geo as G
    from pyspark.sql import functions as F
    df = spark.range(500).select(
        ((F.col("id") * 37 % 3600) / 10.0 - 180.0).alias("lng"),
        ((F.col("id") * 53 % 1700) / 10.0 - 85.0).alias("lat"),
        "id").withColumn("g", G.st_point(F.col("lng"), F.col("lat")))
    fast = G.dwithin_prefilter(df, "g", 0.0, 0.0, 10_000_000.0, level=12)
    brute = df.filter(G.st_dwithin(F.col("g"),
                                   G.st_point(F.lit(0.0), F.lit(0.0)),
                                   10_000_000.0))
    assert sorted(r.id for r in fast.collect()) == \
        sorted(r.id for r in brute.collect())
