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
    BROADCAST_FRONTIER_ROWS, _edge_id, _edge_id_reversed, checkpoint_count,
    checkpoint_observe, oriented, traverse,
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
    FROM/TO clauses. The frontier broadcasts while small; its size comes
    free off the checkpoint job (:func:`checkpoint_count`), so termination
    and the broadcast probe add no per-level stage.

    Job shape (r11, guide §1.2): a SMALL fixed depth (``max_hops <= 3``)
    chains all levels lazily into the caller's single action-time job —
    no per-level materialization job, no persist churn; join strategy per
    level is left to AQE's runtime stats. Deeper searches keep the
    counted per-level loop (early termination on frontier death is what
    makes an open-ended depth survivable).
    """
    e = oriented(edges, direction)
    if edge_filter is not None:
        e = e.filter(edge_filter)
    e = e.select(SRC, DST).distinct()

    frontier = (sources.select(F.col(VID).alias("root"))
                .distinct().withColumn(VID, F.col("root")))
    visited = frontier.withColumn("dist", F.lit(0))
    results: DataFrame | None = None

    if max_hops <= 3:           # lazy mode: one job at action time
        # the deduped edge set is loop-invariant but would be re-embedded
        # in every level's subtree of the single action-time plan; a LAZY
        # localCheckpoint computes it once inside that job (no dedicated
        # materialization job) and later levels read the blocks
        e = e.localCheckpoint(eager=False)
        for level in range(1, max_hops + 1):
            nxt = (frontier.join(e, frontier[VID] == e[SRC], "inner")
                   .select("root", F.col(DST).alias(VID)).distinct()
                   .join(visited.select("root", VID), ["root", VID],
                         "left_anti")
                   .withColumn("dist", F.lit(level)))
            # each level's output is read by THREE later subtrees (results
            # union, every later level's visited anti-join, the next
            # frontier) — without a cut the static plan re-embeds level L
            # once per reader and the leaf count grows geometrically
            # (measured: 20 parquet scans / 33 Exchange for 3 levels). A
            # LAZY localCheckpoint linearizes the plan; the level sits
            # directly above its distinct's shuffle, the shape where
            # racing readers just re-read shuffle files (the r11 item-14
            # rule), and no dedicated job is paid.
            nxt = nxt.localCheckpoint(eager=False)
            step = nxt.select("root", VID, "dist")
            results = step if results is None else results.unionByName(step)
            visited = visited.unionByName(step)
            frontier = nxt.select("root", VID)
        out = results.select(F.col("root").alias(SRC),
                             F.col(VID).alias(DST), F.col("dist"))
        if targets is not None:
            out = out.join(F.broadcast(targets.select(F.col(VID).alias(DST))
                                       .distinct()), DST, "left_semi")
        return out

    # persisted: every level joins the same deduped edge set — without the
    # cache each level re-scans and re-dedups the source tables
    e = e.persist()
    visited = visited.persist()
    frontier = frontier.persist()
    n = frontier.count()        # seed size; later levels ride the checkpoint
    try:
        for level in range(1, max_hops + 1):
            if n == 0:
                break
            f = F.broadcast(frontier) if n <= BROADCAST_FRONTIER_ROWS else frontier
            nxt = (f.join(e, f[VID] == e[SRC], "inner")
                   .select("root", F.col(DST).alias(VID)).distinct()
                   .join(visited.select("root", VID), ["root", VID], "left_anti")
                   .withColumn("dist", F.lit(level)))
            nxt, n = checkpoint_count(nxt)
            step = nxt.select("root", VID, "dist")
            results = step if results is None else results.unionByName(step)
            old_visited = visited
            visited = visited.unionByName(step).persist()
            old_visited.unpersist()
            frontier.unpersist()
            frontier = nxt.select("root", VID)   # checkpointed parent
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



def _single_tie_key(etype_order):
    """Deterministic single-shortest tie-break mirroring the reference's
    per-vertex edge-key scan order: HIGHER EdgeType first and, within a
    type, the reverse entry before the forward one —
    SingleShorestPath.feature:66 pins teammate@R over like for Tim→Tony
    under BOTH, :186 pins teammate@F over like@F under OUT. Encoded
    hop-wise as -2·type_id + (forward ? 1 : 0), compared ascending."""
    if not etype_order:
        return F.col("path").cast("string")
    m = F.create_map(*[x for i, n in enumerate(etype_order)
                       for x in (F.lit(n), F.lit(i + 1))])
    return F.transform(
        F.col("path"),
        lambda h: F.lit(-2) * m[h["et"]]
        + F.when(h["t"] > 0, F.lit(1)).otherwise(F.lit(0)))

def bfs_min_paths(edges: DataFrame, sources: DataFrame, max_hops: int,
                  direction: str = "out", mode: str = "all",
                  min_hops: int = 1,
                  edge_filter: Column | None = None,
                  self_loop_once: bool = False,
                  etype_order: list | None = None) -> DataFrame:
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

    Direction semantics differ for the *root-cycle* pairs ``(s, s)`` only:

    - ``out``/``in``: the root is NOT pre-visited when ``min_hops >= 1``,
      so ``(s, s)`` is reported at its shortest ≥1-hop closed-walk length.
      This is sound because a directed shortest path to the penultimate
      vertex can only contain the closing edge by passing through the
      root, which would embed a shorter closed walk — induction gives
      parity with enumerate-then-prune (pinned by the hypothesis test in
      tests/test_property.py).
    - ``both``: the minimal-prefix invariant BREAKS for root cycles
      (triangle v0−v1−v2 with all three edges: the 3-cycle's prefix
      v0→v1→v2 is level-pruned because v2 is reached directly, and the
      direct path cannot close — it would re-use the same underlying edge
      reversed). The REFERENCE has the same artifact: its level-pruned
      BFS never extends a pruned path, so such cycles are NOT reported
      (AllShortestPaths.feature:578 pins count 1062 — Yao Ming's
      serve/serve/like triangle is invisible). So in BOTH mode the root
      IS pre-visited and the ``(s, s)`` rows are the IN-LOOP closures of
      minimal frontier paths — reference-exact, and still free of the
      enumerate fallback's exponential plan.

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
    e = oriented(edges, direction, self_loop_once=self_loop_once)
    if edge_filter is not None:
        e = e.filter(edge_filter)
    if "_etype" not in e.columns:
        e = e.withColumn("_etype", F.lit(""))
    e = e.select(SRC, DST, RANK, "_dir", "_etype")
    # r11 job shape (guide §1.2): a small fixed depth without the
    # BOTH-direction closure rule chains all levels lazily — one job at
    # action time instead of a checkpoint job per level; AQE picks the
    # per-level join strategy from runtime stats. Deep/open-ended ranges
    # keep the counted loop (frontier-death termination is what bounds
    # them).
    lazy = max_hops <= 3 and not (direction == "both" and min_hops >= 1)
    if not lazy:
        e = e.persist()
    else:
        # loop-invariant edge frame, re-embedded per level in the single
        # action-time plan — lazy-checkpoint so it computes once in that
        # job and later levels read blocks (see bfs_shortest_paths)
        e = e.localCheckpoint(eager=False)
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

    if lazy:
        frontier = (roots.withColumn("end_vid", F.col("root"))
                    .withColumn("path", F.array().cast(path_type)))
        visited = roots.withColumn("end_vid", F.col("root"))
        if min_hops >= 1 and direction != "both":
            visited = visited.limit(0)
        results = None
        if min_hops == 0:
            results = frontier.select(F.col("root").alias("start_vid"),
                                      "end_vid", F.lit(0).alias("hops"),
                                      "path")
        for level in range(1, max_hops + 1):
            uniq = ~F.array_contains(F.col("path"), _edge_id()) \
                & ~F.array_contains(F.col("path"), _edge_id_reversed())
            nxt = (frontier.alias("__f")
                   .join(e.alias("__e"),
                         F.col("__f.end_vid") == F.col(f"__e.{SRC}"),
                         "inner")
                   .filter(uniq)
                   .select("root", F.col(DST).alias("end_vid"),
                           F.concat("path", F.array(new_edge)).alias("path"))
                   .join(visited, ["root", "end_vid"], "left_anti"))
            if mode == "single":
                w = (Window.partitionBy("root", "end_vid")
                     .orderBy(_single_tie_key(etype_order),
                              F.col("path").cast("string").desc()))
                nxt = (nxt.withColumn("_rn", F.row_number().over(w))
                       .filter(F.col("_rn") == 1).drop("_rn"))
            # NOT lazy-checkpointed (measured, r11 fourth pass): the same
            # per-level cut that wins in bfs_shortest_paths regressed this
            # operator ~2× (min 1.15→2.33 s on shortest_path_fn) — here
            # the level output carries the materialized path-struct
            # arrays, and the level tree's joins are all broadcast-side
            # (no shuffle directly below the cut), so racing readers
            # recompute the map-only segment into block storage instead
            # of re-reading shuffle files. Same family as the minhash
            # lazy-signature negative result (item 14).
            step = nxt.select(F.col("root").alias("start_vid"), "end_vid",
                              F.lit(level).alias("hops"), "path")
            if level >= min_hops:
                results = step if results is None \
                    else results.unionByName(step)
            visited = visited.unionByName(
                nxt.select("root", "end_vid").distinct())
            frontier = nxt
        if results is None:
            results = (frontier.limit(0)
                       .select(F.col("root").alias("start_vid"), "end_vid",
                               F.lit(0).alias("hops"), "path"))
        return results

    frontier = (roots.withColumn("end_vid", F.col("root"))
                .withColumn("path", F.array().cast(path_type)).persist())
    # per-root visited set: a vid joins it at its first-reached level, so
    # later levels cannot re-emit the pair — the minimality invariant.
    # out/in with min_hops >= 1: the root itself is NOT pre-visited — the
    # pair (s, s) is then reported at its shortest ≥1-hop cycle length,
    # matching the enumerate semantics (traverse emits cycle paths; the
    # per-pair min keeps the shortest). Minimal walks revisit no vertex
    # *except* the root as a cycle endpoint, so this is the only
    # visited-set exception. BOTH direction: the root IS pre-visited (the
    # exception is unsound there — see docstring) and (s, s) rows come
    # from the in-loop closure rule below.
    visited = roots.withColumn("end_vid", F.col("root"))
    if min_hops >= 1 and direction != "both":
        visited = visited.limit(0)
    visited = visited.persist()
    results: DataFrame | None = None
    if min_hops == 0:
        results = frontier.select(F.col("root").alias("start_vid"),
                                  "end_vid", F.lit(0).alias("hops"), "path")
    n = frontier.count()        # seed size; later levels ride the checkpoint
    # BOTH-direction root closures: the reference's level-pruned BFS
    # reports a (s, s) row only when the closing walk's prefix is itself
    # a minimal path (SingleShortestPath.cpp never extends a pruned
    # path) — a 3-cycle whose 2-prefix is non-minimal is NOT found
    # (AllShortestPaths.feature:578 pins 1062: Yao Ming's
    # serve/serve/like triangle is invisible). So closures are collected
    # IN-LOOP from the minimal frontier — not by an exact cycle search,
    # which would be mathematically complete but reference-divergent.
    collect_closures = direction == "both" and min_hops >= 1
    closed = roots.limit(0)                  # roots whose min closure found
    cyc_results: DataFrame | None = None
    try:
        for level in range(1, max_hops + 1):
            if n == 0:
                break
            f = (F.broadcast(frontier)
                 if n <= BROADCAST_FRONTIER_ROWS // 8 else frontier)
            # direction-normalized edge uniqueness (Edge.cpp:128-136): only
            # relevant for the closed-walk-to-root exception above — a
            # BOTH-direction walk may not return over its arrival edge
            uniq = ~F.array_contains(F.col("path"), _edge_id()) \
                & ~F.array_contains(F.col("path"), _edge_id_reversed())
            expanded = (f.alias("__f")
                        .join(e.alias("__e"),
                              F.col("__f.end_vid") == F.col(f"__e.{SRC}"),
                              "inner")
                        .filter(uniq)
                        .select("root", F.col(DST).alias("end_vid"),
                                F.concat("path",
                                         F.array(new_edge)).alias("path")))
            nxt = expanded.join(visited, ["root", "end_vid"], "left_anti")
            if mode == "single":
                w = (Window.partitionBy("root", "end_vid")
                     .orderBy(_single_tie_key(etype_order),
                              F.col("path").cast("string").desc()))
                nxt = (nxt.withColumn("_rn", F.row_number().over(w))
                       .filter(F.col("_rn") == 1).drop("_rn"))
            if collect_closures:
                # closures ride the same checkpoint job as the frontier
                hits = (expanded
                        .filter(F.col("end_vid") == F.col("root"))
                        .join(closed, "root", "left_anti")
                        .select(F.col("root").alias("start_vid"),
                                "end_vid", F.lit(level).alias("hops"),
                                "path"))
                nxt = nxt.unionByName(
                    hits.select(F.col("start_vid").alias("root"),
                                "end_vid", "path")
                    .withColumn("_cyc", F.lit(True)),
                    allowMissingColumns=True)
                nxt, n = checkpoint_count(nxt)
                hits = (nxt.filter(F.col("_cyc"))
                        .select(F.col("root").alias("start_vid"),
                                "end_vid", F.lit(level).alias("hops"),
                                "path"))
                nxt = nxt.filter(F.col("_cyc").isNull()).drop("_cyc")
                n -= 0  # n counts closures too; frontier-empty still exact
                cyc_results = hits if cyc_results is None \
                    else cyc_results.unionByName(hits)
                closed = closed.unionByName(
                    hits.select(F.col("start_vid").alias("root"))
                    .distinct())
            else:
                nxt, n = checkpoint_count(nxt)
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
        if cyc_results is not None:
            cyc = cyc_results
            if mode == "single":
                ws = (Window.partitionBy("start_vid")
                      .orderBy(_single_tie_key(etype_order),
                               F.col("path").cast("string").desc()))
                cyc = (cyc.withColumn("_rn", F.row_number().over(ws))
                       .filter(F.col("_rn") == 1).drop("_rn"))
            results = cyc if results is None else results.unionByName(cyc)
        if results is None:
            results = (frontier.limit(0)
                       .select(F.col("root").alias("start_vid"), "end_vid",
                               F.lit(0).alias("hops"), "path"))
        return results
    finally:
        frontier.unpersist()
        visited.unpersist()
        e.unpersist()


def bfs_min_dists(edges: DataFrame, sources: DataFrame, max_hops: int,
                  direction: str = "out", min_hops: int = 1,
                  edge_filter: Column | None = None,
                  self_loop_once: bool = False) -> DataFrame:
    """Distance-only single-shortestPath: the ``(start_vid, end_vid,
    hops)`` row set of :func:`bfs_min_paths` ``mode="single"`` without
    materializing any path struct — for statements that never read path
    CONTENTS (``RETURN length(p)`` and friends; guide §2.3: the per-level
    frontier shuffles identity pairs instead of growing edge-struct
    arrays, and the per-level representative-pick window disappears).

    Row-set equality with ``mode="single"``: level-pruned BFS emits a
    pair exactly at its first-reached level, and single mode keeps ONE
    row per pair — which tied path it would have kept cannot change
    (start, end, hops). The per-level ``distinct`` here is that same
    one-row-per-pair rule. The edge-uniqueness filter of the path variant
    is vacuous on surviving rows in a fixed direction: a frontier path
    repeating a directed edge would have to re-reach a visited vertex
    (pruned), or re-leave the root — whose onward targets were all
    reached two levels earlier. Root-cycle semantics match the out/in
    rule: the root is NOT pre-visited when ``min_hops >= 1``, so
    ``(s, s)`` is reported at its shortest ≥1-hop closed-walk length.

    ``direction="both"`` is NOT supported: its reference-exact closure
    artifact (in-loop closures only off minimal frontier paths, arrival
    edge excluded) depends on the frontier's edge lists — callers keep
    :func:`bfs_min_paths` there. ``min_hops`` must be 1 (the shortestPath
    planner clamps the lower bound to 1 before routing here).

    Output schema matches :func:`bfs_min_paths`; ``path`` is an array of
    ``hops`` typed-NULL edge structs so ``length(p)``-style consumers
    (``F.size``) stay exact while contents are never produced.
    """
    if direction == "both":
        raise ValueError("bfs_min_dists does not support direction='both'")
    if min_hops != 1:
        raise ValueError("bfs_min_dists requires min_hops == 1")
    e = oriented(edges, direction, self_loop_once=self_loop_once)
    if edge_filter is not None:
        e = e.filter(edge_filter)
    path_type = _path_struct_type(e)
    e = e.select(SRC, DST).distinct()

    roots = sources.select(F.col(VID).alias("root")).distinct()
    frontier = roots.withColumn("end_vid", F.col("root"))
    # root NOT pre-visited (min_hops == 1, fixed direction): (s, s) rows
    # surface at their shortest closed-walk length, as in bfs_min_paths
    visited = frontier.limit(0)
    results: DataFrame | None = None
    null_hop = F.lit(None).cast(path_type.elementType)

    def shape(level_df: DataFrame, level: int) -> DataFrame:
        return level_df.select(
            F.col("root").alias("start_vid"), "end_vid",
            F.lit(level).alias("hops"),
            F.array_repeat(null_hop, level).alias("path"))

    if max_hops <= 3:           # lazy mode: one job at action time
        # loop-invariant deduped edge set — computed once inside the
        # caller's action-time job (see bfs_shortest_paths)
        e = e.localCheckpoint(eager=False)
        for level in range(1, max_hops + 1):
            nxt = (frontier.join(e, frontier["end_vid"] == e[SRC], "inner")
                   .select("root", F.col(DST).alias("end_vid")).distinct()
                   .join(visited, ["root", "end_vid"], "left_anti"))
            # per-level output read by three later subtrees — lazy cut
            # directly above the distinct's shuffle (r11 item-14 rule)
            nxt = nxt.localCheckpoint(eager=False)
            step = shape(nxt, level)
            results = step if results is None else results.unionByName(step)
            visited = visited.unionByName(nxt)
            frontier = nxt
        return results

    e = e.persist()
    frontier = frontier.persist()
    visited = visited.persist()
    n = frontier.count()
    try:
        for level in range(1, max_hops + 1):
            if n == 0:
                break
            f = F.broadcast(frontier) if n <= BROADCAST_FRONTIER_ROWS \
                else frontier
            nxt = (f.join(e, f["end_vid"] == e[SRC], "inner")
                   .select("root", F.col(DST).alias("end_vid")).distinct()
                   .join(visited, ["root", "end_vid"], "left_anti"))
            nxt, n = checkpoint_count(nxt)
            step = shape(nxt, level)
            results = step if results is None else results.unionByName(step)
            old_visited = visited
            visited = visited.unionByName(nxt).persist()
            old_visited.unpersist()
            frontier.unpersist()
            frontier = nxt
        if results is None:
            results = shape(frontier.limit(0), 0)
        return results
    finally:
        frontier.unpersist()
        visited.unpersist()
        e.unpersist()


_DIR_FLIP = {"out": "in", "in": "out", "both": "both"}


def _path_struct_type(e: DataFrame):
    from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                                   StructField, StructType)
    return ArrayType(StructType([
        StructField("s", e.schema[SRC].dataType),
        StructField("d", e.schema[DST].dataType),
        StructField("r", e.schema[RANK].dataType),
        StructField("t", IntegerType()),
        StructField("et", StringType()),
    ]))


def _new_edge_struct() -> Column:
    return F.struct(F.col(SRC).alias("s"), F.col(DST).alias("d"),
                    F.col(RANK).alias("r"), F.col("_dir").alias("t"),
                    F.col("_etype").alias("et"))


def _flip_path(col: Column) -> Column:
    """A root→m half-path re-expressed as the m→root leg of a full path:
    reverse the edge order and swap each edge's traversal orientation
    ((s,d,t) → (d,s,-t)), so the flipped structs are exactly what
    :func:`traverse` would have recorded walking the other way."""
    return F.reverse(F.transform(col, lambda x: F.struct(
        x["d"].alias("s"), x["s"].alias("d"), x["r"].alias("r"),
        (-x["t"]).alias("t"), x["et"].alias("et"))))


def _edges_unique(col: Column) -> Column:
    """openCypher relationship-uniqueness over a whole path column:
    no underlying edge twice, where identity is direction-normalized
    ((a,b,e,r) == (b,a,-e,r), Edge.cpp:128-136 keyEqual)."""
    canon = F.transform(col, lambda x: F.struct(
        F.when(x["t"] == 1, x["s"]).otherwise(x["d"]).alias("a"),
        F.when(x["t"] == 1, x["d"]).otherwise(x["s"]).alias("b"),
        x["r"].alias("r"), x["et"].alias("et")))
    return F.size(F.array_distinct(canon)) == F.size(col)


def _prep_oriented(edges: DataFrame, direction: str,
                   edge_filter: Column | None,
                   self_loop_once: bool) -> DataFrame:
    e = oriented(edges, direction, self_loop_once=self_loop_once)
    if edge_filter is not None:
        e = e.filter(edge_filter)
    if "_etype" not in e.columns:
        e = e.withColumn("_etype", F.lit(""))
    return e.select(SRC, DST, RANK, "_dir", "_etype")


def bidir_min_paths(edges: DataFrame, sources: DataFrame, targets: DataFrame,
                    max_hops: int, direction: str = "out",
                    mode: str = "all", min_hops: int = 1,
                    edge_filter: Column | None = None,
                    self_loop_once: bool = False,
                    etype_order: list | None = None) -> DataFrame:
    """Meet-in-the-middle minimal paths for (source, target) pairs — the
    MATCH ``shortestPath()`` plan when the end of the pattern is bound or
    tag-constrained, and the engine analog of the reference's conjunct
    executors (``SingleShortestPath.cpp:214-265`` odd/even meeting,
    ``MultiShortestPathExecutor.cpp``, ``BatchShortestPath.cpp``).

    Two level-pruned BFS frontiers expand alternately — forward from the
    sources along ``direction``, backward from the targets along the
    reversed direction — and after each half-step the two *frontiers*
    (first-reach rows only) are joined on the meeting vertex. Round r
    checks totals 2r−1 (left depth r × right depth r−1) and 2r (left r ×
    right r). Why frontier×frontier meets suffice and are final:

    - A pair at true distance L first meets at round ⌈L/2⌉ (any meet at an
      earlier round would witness a shorter walk), and at that round the
      canonical split — prefix of length ⌈L/2⌉, suffix ⌊L/2⌋, both
      necessarily minimal half-paths and therefore both present in their
      frontiers — produces *every* minimal path of that pair exactly once
      (the split point of each path is unique).
    - Later rounds can only produce strictly longer combos for that pair;
      the final per-pair min-prune discards them.
    - At minimal total, every combo of minimal halves is automatically a
      simple path (a vertex repeat would allow a shortcut, contradicting
      L being the walk distance), so relationship-uniqueness holds by
      construction; the explicit cross-half filter is belt-and-braces.

    Scale: frontier size grows with b^(L/2) instead of b^L — the reason
    the reference searches from both ends — and the search stops as soon
    as every (source, target) pair has resolved, probed per round against
    \\|S\\|·\\|T\\|. Root-cycle pairs (s in both sets) are excluded from the
    vertex meets (the half-paths from one side alone can't see a cycle's
    non-minimal prefix) and routed to the in-loop closure rule of
    :func:`bfs_min_paths`;
    ``min_hops=0`` adds their zero-length rows instead.

    Output schema matches :func:`bfs_min_paths`:
    ``(start_vid, end_vid, hops, path)``.
    """
    from pyspark.sql.window import Window

    if min_hops > 1:
        raise ValueError("bidir_min_paths requires min_hops <= 1; route "
                         "higher lower bounds to the enumerate fallback")
    fwd = _prep_oriented(edges, direction, edge_filter,
                         self_loop_once).persist()
    bwd = fwd if direction == "both" else _prep_oriented(
        edges, _DIR_FLIP[direction], edge_filter, self_loop_once).persist()
    path_type = _path_struct_type(fwd)

    src_roots, n_src = checkpoint_count(
        sources.select(F.col(VID).alias("root")).distinct())
    tgt_roots, n_tgt = checkpoint_count(
        targets.select(F.col(VID).alias("root")).distinct())
    diag = src_roots.join(tgt_roots, "root", "left_semi")
    n_diag = diag.count()
    total_pairs = n_src * n_tgt - n_diag

    def start_state(roots):
        front = (roots.withColumn("end_vid", F.col("root"))
                 .withColumn("path", F.array().cast(path_type))
                 .localCheckpoint(eager=True))
        visited = roots.withColumn("end_vid", F.col("root")).persist()
        return front, visited

    lfront, lvisited = start_state(src_roots)
    rfront, rvisited = start_state(tgt_roots)

    def advance(front, visited, e, n_front):
        f = (F.broadcast(front)
             if n_front <= BROADCAST_FRONTIER_ROWS // 8 else front)
        uniq = ~F.array_contains(F.col("path"), _edge_id()) \
            & ~F.array_contains(F.col("path"), _edge_id_reversed())
        nxt = (f.alias("__f")
               .join(e.alias("__e"),
                     F.col("__f.end_vid") == F.col(f"__e.{SRC}"), "inner")
               .filter(uniq)
               .select("root", F.col(DST).alias("end_vid"),
                       F.concat("path",
                                F.array(_new_edge_struct())).alias("path"))
               .join(visited, ["root", "end_vid"], "left_anti"))
        if mode == "single":
            w = (Window.partitionBy("root", "end_vid")
                 .orderBy(_single_tie_key(etype_order),
                          F.col("path").cast("string").desc()))
            nxt = (nxt.withColumn("_rn", F.row_number().over(w))
                   .filter(F.col("_rn") == 1).drop("_rn"))
        return checkpoint_count(nxt)

    def meet(lf, rf, total):
        l = lf.select(F.col("root").alias("start_vid"),
                      F.col("end_vid").alias("_m"),
                      F.col("path").alias("_lp"))
        r = rf.select(F.col("root").alias("_eroot"),
                      F.col("end_vid").alias("_m"),
                      _flip_path(F.col("path")).alias("_rp"))
        return (l.join(r, "_m")
                .filter(F.col("start_vid") != F.col("_eroot"))
                .select("start_vid", F.col("_eroot").alias("end_vid"),
                        F.lit(total).alias("hops"),
                        F.concat("_lp", "_rp").alias("path"))
                # lazy checkpoint (r11): truncates lineage without a
                # dedicated job; the round's resolution probe is the
                # first materialization and populates the checkpoint,
                # so the final union re-reads instead of re-joining
                .localCheckpoint(eager=False))

    combos: list[DataFrame] = []
    resolved: DataFrame | None = None
    n_resolved = 0
    n_l, n_r = n_src, n_tgt
    rounds = (max_hops + 1) // 2
    try:
        for r in range(1, rounds + 1):
            new_l, n_l = advance(lfront, lvisited, fwd, n_l)
            lfront = new_l
            if n_l == 0:
                break
            old = lvisited
            lvisited = lvisited.unionByName(
                new_l.select("root", "end_vid").distinct()).persist()
            old.unpersist()
            round_meets = [meet(new_l, rfront, 2 * r - 1)]
            if 2 * r <= max_hops:
                new_r, n_r = advance(rfront, rvisited, bwd, n_r)
                if n_r:
                    old = rvisited
                    rvisited = rvisited.unionByName(
                        new_r.select("root", "end_vid").distinct()).persist()
                    old.unpersist()
                    round_meets.append(meet(new_l, new_r, 2 * r))
                rfront = new_r
            combos.extend(round_meets)
            if (2 * r <= max_hops and n_r == 0):
                break
            if r == rounds:
                # the probe's only effect is breaking out of LATER rounds
                # — in the final round it is a guaranteed-wasted job
                break
            # all-pairs-resolved probe: a pair's minimal combos all appear
            # in the round it first meets, so once every pair has met
            # there is nothing left to find
            newp = round_meets[0].select("start_vid", "end_vid")
            for m in round_meets[1:]:
                newp = newp.unionByName(m.select("start_vid", "end_vid"))
            newp = newp.distinct()
            if resolved is not None:
                newp = newp.join(resolved, ["start_vid", "end_vid"],
                                 "left_anti")
            newp, n_new = checkpoint_count(newp)
            n_resolved += n_new
            resolved = newp if resolved is None else \
                resolved.unionByName(newp).localCheckpoint(eager=False)
            if n_resolved >= total_pairs:
                break

        out: DataFrame | None = None
        for c in combos:
            out = c if out is None else out.unionByName(c)
        if out is not None:
            out = out.filter(_edges_unique(F.col("path")))
            w = Window.partitionBy("start_vid", "end_vid")
            out = (out.withColumn("_min", F.min("hops").over(w))
                   .filter(F.col("hops") == F.col("_min")).drop("_min"))
            if mode == "single":
                ws = (Window.partitionBy("start_vid", "end_vid")
                      .orderBy(_single_tie_key(etype_order),
                               F.col("path").cast("string").desc()))
                out = (out.withColumn("_rn", F.row_number().over(ws))
                       .filter(F.col("_rn") == 1).drop("_rn"))
        extras: list[DataFrame] = []
        if n_diag:
            if min_hops == 0:
                extras.append(diag.select(
                    F.col("root").alias("start_vid"),
                    F.col("root").alias("end_vid"),
                    F.lit(0).alias("hops"),
                    F.array().cast(path_type).alias("path")))
            elif max_hops >= 1:
                # reference-artifact closures: re-run the level-pruned
                # BFS from the (few) diagonal roots and keep the (s, s)
                # rows — same in-loop closure rule as bfs_min_paths
                cyc_all = bfs_min_paths(
                    edges, diag.select(F.col("root").alias(VID)), max_hops,
                    direction=direction, mode=mode, min_hops=1,
                    edge_filter=edge_filter, self_loop_once=self_loop_once,
                    etype_order=etype_order)
                extras.append(cyc_all.filter(
                    F.col("start_vid") == F.col("end_vid")))
        for x in extras:
            out = x if out is None else out.unionByName(x)
        if out is None:
            out = (src_roots.limit(0)
                   .select(F.col("root").alias("start_vid"),
                           F.col("root").alias("end_vid"),
                           F.lit(0).alias("hops"),
                           F.array().cast(path_type).alias("path")))
        return out
    finally:
        lvisited.unpersist()
        rvisited.unpersist()
        fwd.unpersist()
        if direction != "both":
            bwd.unpersist()


def bidir_distances(edges: DataFrame, sources: DataFrame, targets: DataFrame,
                    max_hops: int, direction: str = "out",
                    edge_filter: Column | None = None) -> DataFrame:
    """FIND SHORTEST PATH distance form, meeting in the middle:
    ``(src, dst, dist)`` with dist = min hop count in [1, max_hops], for
    src in ``sources``, dst in ``targets``, src ≠ dst — the semantics of
    :func:`bfs_shortest_paths` with a target set, at half the search
    depth (frontier b^(L/2) instead of b^L; the reference's
    ``MultiShortestPathExecutor.cpp`` / ``BatchShortestPath.cpp`` shape).

    Correctness follows the same round argument as
    :func:`bidir_min_paths`: round r joins the two first-reach frontiers
    at totals 2r−1 and 2r; a pair at distance L first meets at round
    ⌈L/2⌉ via its canonical split, so min-over-observed-totals per pair is
    the true distance. The search stops when every pair has resolved or a
    frontier empties (an empty side proves no unseen pair remains — a
    deeper pair's canonical meet would have to be first-reached at the
    depth that just came back empty).
    """
    fwd_all = _prep_oriented(edges, direction, edge_filter, False)
    fwd = fwd_all.select(SRC, DST).distinct().persist()
    bwd = fwd if direction == "both" else _prep_oriented(
        edges, _DIR_FLIP[direction], edge_filter, False
        ).select(SRC, DST).distinct().persist()

    src_roots, n_src = checkpoint_count(
        sources.select(F.col(VID).alias("root")).distinct())
    tgt_roots, n_tgt = checkpoint_count(
        targets.select(F.col(VID).alias("root")).distinct())
    n_diag = src_roots.join(tgt_roots, "root", "left_semi").count()
    total_pairs = n_src * n_tgt - n_diag

    def start_state(roots):
        front = (roots.withColumn(VID, F.col("root"))
                 .localCheckpoint(eager=True))
        visited = roots.withColumn(VID, F.col("root")).persist()
        return front, visited

    lfront, lvisited = start_state(src_roots)
    rfront, rvisited = start_state(tgt_roots)

    def advance(front, visited, e, n_front):
        f = F.broadcast(front) if n_front <= BROADCAST_FRONTIER_ROWS \
            else front
        nxt = (f.join(e, f[VID] == e[SRC], "inner")
               .select("root", F.col(DST).alias(VID)).distinct()
               .join(visited, ["root", VID], "left_anti"))
        return checkpoint_count(nxt)

    def meet(lf, rf, total):
        l = lf.select(F.col("root").alias(SRC), F.col(VID).alias("_m"))
        r = rf.select(F.col("root").alias(DST), F.col(VID).alias("_m"))
        return (l.join(r, "_m")
                .filter(F.col(SRC) != F.col(DST))
                .select(SRC, DST, F.lit(total).alias("dist"))
                .distinct()
                # lazy checkpoint (r11): see bidir_min_paths.meet
                .localCheckpoint(eager=False))

    meets: list[DataFrame] = []
    resolved: DataFrame | None = None
    n_resolved = 0
    n_l, n_r = n_src, n_tgt
    rounds = (max_hops + 1) // 2
    try:
        for r in range(1, rounds + 1):
            new_l, n_l = advance(lfront, lvisited, fwd, n_l)
            lfront = new_l
            if n_l == 0:
                break
            old = lvisited
            lvisited = lvisited.unionByName(new_l).persist()
            old.unpersist()
            round_meets = [meet(new_l, rfront, 2 * r - 1)]
            if 2 * r <= max_hops:
                new_r, n_r = advance(rfront, rvisited, bwd, n_r)
                if n_r:
                    old = rvisited
                    rvisited = rvisited.unionByName(new_r).persist()
                    old.unpersist()
                    round_meets.append(meet(new_l, new_r, 2 * r))
                rfront = new_r
            meets.extend(round_meets)
            if 2 * r <= max_hops and n_r == 0:
                break
            if r == rounds:
                # final round: the probe could only break out of later
                # rounds — skip the guaranteed-wasted job
                break
            newp = round_meets[0].select(SRC, DST)
            for m in round_meets[1:]:
                newp = newp.unionByName(m.select(SRC, DST))
            newp = newp.distinct()
            if resolved is not None:
                newp = newp.join(resolved, [SRC, DST], "left_anti")
            newp, n_new = checkpoint_count(newp)
            n_resolved += n_new
            resolved = newp if resolved is None else \
                resolved.unionByName(newp).localCheckpoint(eager=False)
            if n_resolved >= total_pairs:
                break
        out: DataFrame | None = None
        for m in meets:
            out = m if out is None else out.unionByName(m)
        if out is None:
            return (src_roots.limit(0)
                    .select(F.col("root").alias(SRC),
                            F.col("root").alias(DST),
                            F.lit(0).alias("dist")))
        return out.groupBy(SRC, DST).agg(F.min("dist").alias("dist"))
    finally:
        lvisited.unpersist()
        rvisited.unpersist()
        fwd.unpersist()
        if direction != "both":
            bwd.unpersist()


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
    distance improves (the improved-set size rides the frontier's own
    checkpoint job via :func:`checkpoint_count` — no dedicated probe),
    worst-case after
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

    tentative, n = checkpoint_count(
        sources.select(F.col(VID).alias("root")).distinct()
        .withColumn(VID, F.col("root"))
        .withColumn("dist", F.lit(0.0)))
    frontier = tentative
    try:
        for _ in range(max_iter):
            if n == 0:
                break
            f = F.broadcast(frontier) if n <= BROADCAST_FRONTIER_ROWS \
                else frontier
            cand = (f.join(e, f[VID] == e[SRC], "inner")
                    .select("root", F.col(DST).alias(VID),
                            (F.col("dist") + F.col("_w")).alias("dist"),
                            F.lit(False).alias("_old_row")))
            # ONE job per superstep (was two: an eager checkpoint of the
            # new tentative set plus a join-based improved-frontier
            # count): tag the union branches and take a conditional min
            # alongside the overall min — `_prev` is the vertex's prior
            # tentative distance (NULL when newly reached), so the
            # improved set is a filter over the SAME aggregate output,
            # no (root, vid)-keyed join against the previous state, and
            # the improved-row count rides the one checkpoint job as an
            # Observation. Both aggregates are map-side combinable.
            merged = (tentative.withColumn("_old_row", F.lit(True))
                      .unionByName(cand))
            agg = (merged.groupBy("root", VID)
                   .agg(F.min("dist").alias("dist"),
                        F.min(F.when(F.col("_old_row"), F.col("dist")))
                        .alias("_prev")))
            improved = (F.col("_prev").isNull()
                        | (F.col("dist") < F.col("_prev")))
            new, m = checkpoint_observe(
                agg.withColumn("_imp", improved),
                n_imp=F.sum(F.when(improved, 1).otherwise(0)))
            n = int(m["n_imp"])
            frontier = new.filter(F.col("_imp")).select("root", VID, "dist")
            tentative = new.select("root", VID, "dist")
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
    """FIND ALL PATH / NOLOOP PATH: enumerate edge-unique walks
    source→target of length 1..max_hops, meeting in the middle.

    Reference: ``AllPathsExecutor.h:16-21`` — "expand from left and right
    at the same time" with a ``conjunctPath`` middle join
    (``AllPathsExecutor.cpp:282``); loops allowed unless NOLOOP, which
    forbids repeated *vertices*.

    Shape: the left half enumerates ALL edge-unique walks from the
    sources to depth ⌈L/2⌉ (:func:`traverse`, every intermediate depth
    kept), the right half from the targets over the REVERSED direction to
    depth ⌊L/2⌋; the conjunct joins on the meeting vertex under the
    canonical-split constraint ``len_l − len_r ∈ {0, 1}`` and re-checks
    edge uniqueness across the halves.

    Why exact, each path exactly once: a walk of length t splits uniquely
    at position ⌈t/2⌉; both halves of that split are edge-unique walks
    within their depth bounds, so the join reconstructs the walk from
    exactly one (left, right) row pair. Conversely every joined combo
    that passes the cross-half uniqueness filter IS an edge-unique
    source→target walk of length ≤ L. (Pinned against the one-sided
    enumeration by a hypothesis test.)

    Why it matters at scale: one-sided enumeration materializes every
    ≤L-hop walk from the sources regardless of target — b^L rows for the
    whole reachable set. Both-ends expansion is 2·b^(L/2) rows plus a
    meeting-vertex equi-join; with few targets deep in a large graph that
    is the difference between a runnable plan and an exponential one —
    the reason the reference conjuncts.

    Returns (start_vid, end_vid, hops, path).
    """
    left_depth = (max_hops + 1) // 2
    right_depth = max_hops // 2
    lw = traverse(edges, sources, min_hops=0, max_hops=left_depth,
                  direction=direction, edge_filter=edge_filter)
    rw = traverse(edges, targets, min_hops=0, max_hops=right_depth,
                  direction=_DIR_FLIP[direction], edge_filter=edge_filter)
    l = lw.select("start_vid", F.col("end_vid").alias("_m"),
                  F.col("hops").alias("_lh"), F.col("path").alias("_lp"))
    r = rw.select(F.col("start_vid").alias("_rroot"),
                  F.col("end_vid").alias("_m"),
                  F.col("hops").alias("_rh"),
                  _flip_path(F.col("path")).alias("_rp"))
    t = (l.join(r, "_m")
         .filter(((F.col("_lh") == F.col("_rh"))
                  | (F.col("_lh") == F.col("_rh") + 1))
                 & (F.col("_lh") + F.col("_rh") >= 1))
         .select("start_vid", F.col("_rroot").alias("end_vid"),
                 (F.col("_lh") + F.col("_rh")).alias("hops"),
                 F.concat("_lp", "_rp").alias("path"))
         .filter(_edges_unique(F.col("path"))))
    if noloop:
        # no repeated vertex: all step dsts distinct and != start
        t = t.filter(
            (F.size(F.array_distinct(F.transform("path", lambda p: p["d"])))
             == F.size("path"))
            & ~F.array_contains(F.transform("path", lambda p: p["d"]),
                                F.col("start_vid")))
    return t
