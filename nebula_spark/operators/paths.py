"""Path finding: FIND SHORTEST / ALL / NOLOOP PATH (SURVEY.md §2.3).

Reference executors: ``src/graph/executor/algo/BFSShortestPathExecutor.cpp``
(1-283), ``MultiShortestPathExecutor.cpp`` (1-404), ``AllPathsExecutor.cpp``
(1-764); MATCH shortestPath via ``SingleShortestPath.cpp:214-265`` (bidir
meet-in-the-middle). All are single-node BFS over RPC-fetched adjacency.

Spark-first: level-synchronous multi-source BFS — the frontier is a
DataFrame keyed (root, vid); a hop is one join against the edge table; the
visited set is a DataFrame anti-joined each level. This is the Pregel
pattern expressed in DataFrame ops, scales with the cluster, and (unlike the
reference) handles all (src,dst) pairs in one run instead of per-pair RPCs.
Frontiers persist per level and unpersist after; lineage is cut by
localCheckpoint every few levels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nebula_spark.catalog import DST, SRC, VID
from nebula_spark.operators.traverse import (
    BROADCAST_FRONTIER_ROWS, oriented, traverse,
)


def bfs_shortest_paths(edges: DataFrame, sources: DataFrame,
                       targets: DataFrame | None = None, max_hops: int = 10,
                       direction: str = "out",
                       edge_filter: Column | None = None) -> DataFrame:
    """Multi-source BFS shortest distances: (src, dst, dist).

    FIND SHORTEST PATH parity at the distance level: for every source vid,
    the minimum hop count to every reachable vid (≤ ``max_hops``), optionally
    restricted to a target set. Level-synchronous: a vid enters the result at
    the level it is first reached — per-root visited set enforces minimality.

    Scale: visited/frontier are (root, vid) pairs — worst case |V|² for
    all-pairs, so callers pick source sets, exactly like the reference's
    FROM/TO clauses. The frontier broadcasts while small; the per-level
    count() doubles as the empty-frontier terminator.
    """
    e = oriented(edges, direction)
    if edge_filter is not None:
        e = e.filter(edge_filter)
    # persisted: every level joins the same deduped edge set — without the
    # cache each level re-scans and re-dedups the source tables
    e = e.select(SRC, DST).distinct().persist()

    frontier = (sources.select(F.col(VID).alias("root"))
                .distinct().withColumn(VID, F.col("root")))
    visited = frontier.withColumn("dist", F.lit(0)).persist()
    results: DataFrame | None = None
    frontier = frontier.persist()
    try:
        for level in range(1, max_hops + 1):
            n = frontier.count()
            if n == 0:
                break
            f = F.broadcast(frontier) if n <= BROADCAST_FRONTIER_ROWS else frontier
            nxt = (f.join(e, f[VID] == e[SRC], "inner")
                   .select("root", F.col(DST).alias(VID)).distinct()
                   .join(visited.select("root", VID), ["root", VID], "left_anti")
                   .withColumn("dist", F.lit(level)))
            nxt = nxt.localCheckpoint(eager=True)
            step = nxt.select("root", VID, "dist")
            results = step if results is None else results.unionByName(step)
            old_visited = visited
            visited = visited.unionByName(step).persist()
            old_visited.unpersist()
            frontier.unpersist()
            frontier = nxt.select("root", VID).persist()
        if results is None:
            results = visited.limit(0)
        out = results.select(F.col("root").alias(SRC), F.col(VID).alias(DST),
                             F.col("dist"))
        if targets is not None:
            out = out.join(F.broadcast(targets.select(F.col(VID).alias(DST))
                                       .distinct()), DST, "left_semi")
        return out
    finally:
        frontier.unpersist()
        visited.unpersist()
        e.unpersist()


def all_paths(edges: DataFrame, sources: DataFrame, targets: DataFrame,
              max_hops: int, direction: str = "out", noloop: bool = False,
              edge_filter: Column | None = None) -> DataFrame:
    """FIND ALL PATH / NOLOOP PATH: enumerate paths source→target ≤ max_hops.

    Reference: AllPathsExecutor.cpp:1-764 — enumeration with per-path edge
    dedup (loops allowed unless NOLOOP, which forbids repeated *vertices*).
    Built on :func:`traverse` (edge-unique expansion); NOLOOP adds a
    vertex-uniqueness filter over the path column. Returns
    (start_vid, end_vid, hops, path).
    """
    t = traverse(edges, sources, min_hops=1, max_hops=max_hops,
                 direction=direction, edge_filter=edge_filter)
    if noloop:
        # no repeated vertex: all step dsts distinct and != start
        t = t.filter(
            (F.size(F.array_distinct(F.transform("path", lambda p: p["d"])))
             == F.size("path"))
            & ~F.array_contains(F.transform("path", lambda p: p["d"]),
                                F.col("start_vid")))
    return t.join(F.broadcast(targets.select(F.col(VID).alias("end_vid"))
                              .distinct()), "end_vid", "left_semi")
