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

from nebula_spark.catalog import DST, RANK, SRC, VID
from nebula_spark.operators.traverse import (
    BROADCAST_FRONTIER_ROWS, _edge_id, _edge_id_reversed, oriented, traverse,
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


def bfs_min_paths(edges: DataFrame, sources: DataFrame, max_hops: int,
                  direction: str = "out", mode: str = "all",
                  min_hops: int = 1,
                  edge_filter: Column | None = None) -> DataFrame:
    """Level-pruned BFS returning only MINIMAL-length paths per (start, end)
    pair — the MATCH ``shortestPath()``/``allShortestPaths()`` plan when the
    var-len segment carries no intermediate-hop predicates.

    Reference: ``SingleShortestPath.cpp:214-265`` does BFS with
    level-pruning, never full path enumeration; the enumerate-then-prune
    fallback in ``plans/executor.py`` remains only for predicate-bearing
    segments. Why it matters at scale: enumeration is exponential in hop
    count while the answer is linear — for ``*1..6`` on a 100× graph BFS is
    the only survivable plan.

    Level-synchronous: a (root, vid) pair enters the result exactly at the
    level it is first reached (per-root visited set), so every emitted path
    is minimal and, being minimal, never repeats a vertex — openCypher
    relationship-uniqueness holds for free, no per-path membership filter.

    ``mode="all"`` keeps every tied-minimal path (allShortestPaths) —
    correct because every shortest path's length-L prefix is itself a
    shortest path to its penultimate vertex, so expanding only minimal
    frontier paths loses nothing. ``mode="single"`` keeps one deterministic
    representative per pair (greedy per-level lexicographic-min of the
    serialized edge list — any single shortest path is valid per
    openCypher; this also bounds the frontier at one path per reached
    vid, the scale point). ``min_hops`` must be 0 or 1: with a
    higher lower bound a minimal *qualifying* walk may revisit vertices,
    which level-pruning cannot represent — callers route those to the
    enumerate fallback.

    ``direction`` must be ``out`` or ``in``. BOTH-direction is refused:
    the root-cycle rows would be wrong. A shortest closed walk's prefix to
    its penultimate vertex need not be a shortest path when the closing
    edge is itself the direct root edge (triangle v0−v1−v2 with all three
    edges: the 3-cycle's prefix v0→v1→v2 is level-pruned because v2 is
    reached directly, and the direct path cannot close — it would re-use
    the same underlying edge reversed). For out/in this cannot happen: a
    directed shortest path to the penultimate vertex can only contain the
    closing edge by passing through the root, which would embed a shorter
    closed walk — induction gives parity with enumerate-then-prune (pinned
    by the hypothesis test in tests/test_property.py). BOTH-direction
    shortestPath stays on the enumerate fallback.

    Output schema matches :func:`~nebula_spark.operators.traverse.traverse`:
    ``(start_vid, end_vid, hops, path)`` with path an array of edge structs
    ``(s, d, r, t, et)``.
    """
    from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                                   StructField, StructType)
    from pyspark.sql.window import Window

    if min_hops > 1:
        raise ValueError("bfs_min_paths requires min_hops <= 1; route "
                         "higher lower bounds to the enumerate fallback")
    if direction == "both":
        raise ValueError("bfs_min_paths is out/in only: BOTH-direction "
                         "root cycles break the minimal-prefix invariant "
                         "(see docstring); use the enumerate fallback")
    e = oriented(edges, direction)
    if edge_filter is not None:
        e = e.filter(edge_filter)
    if "_etype" not in e.columns:
        e = e.withColumn("_etype", F.lit(""))
    e = e.select(SRC, DST, RANK, "_dir", "_etype").persist()
    path_type = ArrayType(StructType([
        StructField("s", e.schema[SRC].dataType),
        StructField("d", e.schema[DST].dataType),
        StructField("r", e.schema[RANK].dataType),
        StructField("t", IntegerType()),
        StructField("et", StringType()),
    ]))
    new_edge = F.struct(F.col(SRC).alias("s"), F.col(DST).alias("d"),
                        F.col(RANK).alias("r"), F.col("_dir").alias("t"),
                        F.col("_etype").alias("et"))

    roots = sources.select(F.col(VID).alias("root")).distinct()
    frontier = (roots.withColumn("end_vid", F.col("root"))
                .withColumn("path", F.array().cast(path_type)).persist())
    # per-root visited set: a vid joins it at its first-reached level, so
    # later levels cannot re-emit the pair — the minimality invariant.
    # With min_hops >= 1 the root itself is NOT pre-visited: the pair
    # (s, s) is then reported at its shortest ≥1-hop cycle length, matching
    # the enumerate semantics (traverse emits cycle paths; the per-pair min
    # keeps the shortest). Minimal walks revisit no vertex *except* the
    # root as a cycle endpoint, so this is the only visited-set exception.
    visited = roots.withColumn("end_vid", F.col("root"))
    if min_hops >= 1:
        visited = visited.limit(0)
    visited = visited.persist()
    results: DataFrame | None = None
    if min_hops == 0:
        results = frontier.select(F.col("root").alias("start_vid"),
                                  "end_vid", F.lit(0).alias("hops"), "path")
    try:
        for level in range(1, max_hops + 1):
            n = frontier.count()
            if n == 0:
                break
            f = (F.broadcast(frontier)
                 if n <= BROADCAST_FRONTIER_ROWS // 8 else frontier)
            # direction-normalized edge uniqueness (Edge.cpp:128-136): only
            # relevant for the closed-walk-to-root exception above — a
            # BOTH-direction walk may not return over its arrival edge
            uniq = ~F.array_contains(F.col("path"), _edge_id()) \
                & ~F.array_contains(F.col("path"), _edge_id_reversed())
            nxt = (f.alias("__f")
                   .join(e.alias("__e"),
                         F.col("__f.end_vid") == F.col(f"__e.{SRC}"), "inner")
                   .filter(uniq)
                   .select("root", F.col(DST).alias("end_vid"),
                           F.concat("path", F.array(new_edge)).alias("path"))
                   .join(visited, ["root", "end_vid"], "left_anti"))
            if mode == "single":
                w = (Window.partitionBy("root", "end_vid")
                     .orderBy(F.col("path").cast("string")))
                nxt = (nxt.withColumn("_rn", F.row_number().over(w))
                       .filter(F.col("_rn") == 1).drop("_rn"))
            nxt = nxt.localCheckpoint(eager=True)
            step = nxt.select(F.col("root").alias("start_vid"), "end_vid",
                              F.lit(level).alias("hops"), "path")
            if level >= min_hops:
                results = step if results is None else results.unionByName(step)
            old_visited = visited
            visited = visited.unionByName(
                nxt.select("root", "end_vid").distinct()).persist()
            old_visited.unpersist()
            frontier.unpersist()
            frontier = nxt          # eagerly checkpointed — no re-persist
        if results is None:
            results = (frontier.limit(0)
                       .select(F.col("root").alias("start_vid"), "end_vid",
                               F.lit(0).alias("hops"), "path"))
        return results
    finally:
        frontier.unpersist()
        visited.unpersist()
        e.unpersist()


def weighted_shortest_paths(edges: DataFrame, sources: DataFrame,
                            weight_col: str = "weight",
                            targets: DataFrame | None = None,
                            direction: str = "out",
                            max_iter: int = 50,
                            edge_filter: Column | None = None) -> DataFrame:
    """Weighted single-source (multi-root) shortest distances:
    ``(src, dst, dist)`` with dist = min total edge weight.

    The reference parses a WEIGHT clause but never implemented it
    (``src/parser/TraverseSentences.h:419-426`` carries the flag; executors
    are hop-count only) — this is the SURVEY §2.3 design note realized:
    Bellman-Ford in BSP form with frontier restriction, the standard
    bucketless delta-stepping degeneration that suits a shuffle engine.

    Per superstep: relax only vertices whose tentative distance improved
    last round (the frontier) — one join frontier⋈edges plus one
    min-aggregate keyed on (root, vid), both map-side combinable; eager
    localCheckpoint keeps lineage flat. Terminates when no tentative
    distance improves (probe = ``limit(1).count()``), worst-case after
    |V|−1 supersteps on non-negative weights. Negative weights are
    rejected: with them Bellman-Ford needs exactly |V|−1 rounds plus a
    negative-cycle check, which a caller doing that analysis should run
    explicitly.
    """
    e = oriented(edges, direction)
    if edge_filter is not None:
        e = e.filter(edge_filter)
    neg = e.filter(F.col(weight_col) < 0).limit(1).count()
    if neg:
        raise ValueError("weighted_shortest_paths requires non-negative "
                         "edge weights")
    e = (e.groupBy(SRC, DST)                 # parallel edges: keep min
         .agg(F.min(weight_col).alias("_w")).persist())

    tentative = (sources.select(F.col(VID).alias("root")).distinct()
                 .withColumn(VID, F.col("root"))
                 .withColumn("dist", F.lit(0.0))
                 .localCheckpoint(eager=True))
    frontier = tentative
    try:
        for _ in range(max_iter):
            n = frontier.count()
            if n == 0:
                break
            f = F.broadcast(frontier) if n <= BROADCAST_FRONTIER_ROWS \
                else frontier
            cand = (f.join(e, f[VID] == e[SRC], "inner")
                    .select("root", F.col(DST).alias(VID),
                            (F.col("dist") + F.col("_w")).alias("dist")))
            new = (tentative.unionByName(cand)
                   .groupBy("root", VID).agg(F.min("dist").alias("dist"))
                   .localCheckpoint(eager=True))
            frontier = (new.join(
                tentative.withColumnRenamed("dist", "_old"),
                ["root", VID], "left")
                .filter(F.col("_old").isNull()
                        | (F.col("dist") < F.col("_old")))
                .select("root", VID, "dist")
                .localCheckpoint(eager=True))
            tentative = new
        out = tentative.select(F.col("root").alias(SRC),
                               F.col(VID).alias(DST), "dist")
        if targets is not None:
            out = out.join(F.broadcast(targets.select(F.col(VID).alias(DST))
                                       .distinct()), DST, "left_semi")
        return out
    finally:
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
