"""Traversal operators: GetNeighbors / GO / Traverse / AppendVertices /
GetEdges (SURVEY.md §2.1, §2.3).

Reference implementations:
- GetNeighbors: ``src/graph/executor/query/GetNeighborsExecutor.cpp:1-102``
  + storage chain ``src/storage/query/GetNeighborsProcessor.h:24`` (prefix
  scan over the adjacency, request spec ``storage.thrift:128-166``).
- GO loop: ``src/graph/planner/ngql/GoPlanner.cpp:15-90`` (Loop +
  Expand/ExpandAll, ``ExpandAllExecutor.cpp:50-523``; GetDstBySrc dst-only
  frontier ``src/storage/query/GetDstBySrcProcessor.cpp``).
- Traverse (MATCH var-len expansion with path tracking + edge-uniqueness):
  ``src/graph/executor/query/TraverseExecutor.cpp:25-676``.
- AppendVertices: ``src/graph/executor/query/AppendVerticesExecutor.cpp:18-317``.
- GetEdges: ``src/graph/executor/query/GetEdgesExecutor.cpp:1-112``.

Spark-first translation: a hop is a join of the frontier against the edge
table. The reference's storage-side pushdowns (edge filter, per-vertex limit,
dedup — ``storage.thrift:140-158``) become: filter *before* the join
(Catalyst pushes it into the parquet scan), window row_number per src for
per-vertex limits, ``select(src,dst).distinct()`` for dst-only frontiers.
Scale posture: the frontier is broadcast when small (seed sets almost always
are), the edge table never moves; at 100 TB the edge table is
bucketed-by-src parquet so even shuffle joins co-locate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

from nebula_spark.catalog import DST, RANK, SRC, VID

# Frontiers at or below this row count are broadcast to the hop join.
BROADCAST_FRONTIER_ROWS = 2_000_000


def checkpoint_count(df: DataFrame) -> tuple[DataFrame, int]:
    """Eager localCheckpoint + row count in ONE job.

    Superstep loops need the new frontier's size twice per level — as the
    empty-frontier terminator and as the broadcast-vs-shuffle probe — and
    they already pay a materialization job for the lineage-severing eager
    ``localCheckpoint``. An :class:`~pyspark.sql.Observation` rides that
    same job (``CollectMetrics`` accumulates while the checkpoint's
    partitions compute), so the count that used to be a dedicated stage
    per superstep is now free metadata off the job we were already
    running. At 100 TB this removes one full pass over the frontier per
    BFS level / Pregel superstep.
    """
    out, m = checkpoint_observe(df, n=F.count(F.lit(1)))
    return out, int(m["n"])


def checkpoint_observe(df: DataFrame,
                       **metrics: Column) -> tuple[DataFrame, dict]:
    """Eager localCheckpoint with arbitrary observed aggregates riding the
    materialization job (see :func:`checkpoint_count`). Returns the
    checkpointed frame and a dict of metric values."""
    obs = Observation()
    out = (df.observe(obs, *[m.alias(k) for k, m in metrics.items()])
           .localCheckpoint(eager=True))
    return out, obs.get


def oriented(edges: DataFrame, direction: str = "out",
             self_loop_once: bool = False) -> DataFrame:
    """Orient an edge table so ``src`` is always the traversal origin.

    Reference encodes reverse traversal as negative edge types
    (``src/common/datatypes/Edge.h:16-23``); we swap columns instead and tag
    the original direction in ``_dir`` (1=out, -1=in) so BOTH-direction
    results keep edge identity.

    ``self_loop_once``: in BOTH mode a self-loop's out and in orientations
    normalize to the same edge identity (``Edge.cpp keyEqual``), and MATCH
    expansion yields it once (SelfReflectiveEdges.feature) — drop the
    reversed copy. GO BIDIRECT keeps both rows (per-direction adjacency
    entries), so it stays opt-in.
    """
    props = [c for c in edges.columns if c not in (SRC, DST, RANK)]
    out = edges.select(SRC, DST, RANK, *props, F.lit(1).alias("_dir"))
    if direction == "out":
        return out
    rev = edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), RANK,
                       *props, F.lit(-1).alias("_dir"))
    if direction == "in":
        return rev
    if direction == "both":
        if self_loop_once:
            rev = rev.filter(F.col(SRC) != F.col(DST))
        return out.unionByName(rev)
    raise ValueError(f"direction must be out|in|both, got {direction!r}")


def get_neighbors(vids: DataFrame, edges: DataFrame, direction: str = "out",
                  edge_filter: Column | None = None,
                  limit_per_vertex: int | None = None,
                  order_per_vertex: list | None = None,
                  dedup_dst: bool = False,
                  broadcast_frontier: bool | None = None,
                  carry_cols: tuple[str, ...] = (),
                  dedup_frontier: bool = True) -> DataFrame:
    """One hop from a vid set: the GetNeighbors RPC as a join.

    Returns edge rows oriented origin→neighbor (columns src, dst, _rank,
    props…, _dir). Pushdown parity with storage.thrift:128-166:
    ``edge_filter`` applies before the join (reaches the parquet scan);
    ``limit_per_vertex`` (+ optional ``order_per_vertex``) reproduces the
    per-vertex truncate/sample clause via a window, not a global limit;
    ``dedup_dst`` reproduces GetDstBySrc's deduped dst-only frontier.
    ``carry_cols`` are frontier columns (e.g. a traversal-origin tag) kept
    through the join — the frontier dedups on (vid, *carry_cols).

    ``dedup_frontier=False`` is for loop callers whose frontier is already
    distinct (go/BFS dedup every hop): skipping the redundant ``distinct``
    is not just one less aggregate — an Aggregate between the frontier's
    exchange and the hop join breaks AQE's skew-join pattern
    (``SortMergeJoin ← Sort ← ShuffleQueryStage``), silently disabling
    supernode skew-splitting for every non-broadcast hop. Verified by
    ``tests/test_plans.py::test_skewed_hop_join_gets_aqe_skew_split``.
    """
    e = oriented(edges, direction)
    if edge_filter is not None:
        e = e.filter(edge_filter)
    f = vids.select(VID, *carry_cols)
    if dedup_frontier:
        f = f.distinct()
    if broadcast_frontier is None:
        broadcast_frontier = True  # seed sets are small; loops override
    if broadcast_frontier:
        f = F.broadcast(f)
    hop = e.join(f, e[SRC] == f[VID], "inner").drop(VID)
    if limit_per_vertex is not None:
        from pyspark.sql.window import Window
        order = order_per_vertex or [F.col(DST), F.col(RANK)]
        w = Window.partitionBy(*carry_cols, SRC).orderBy(*order)
        hop = (hop.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= limit_per_vertex).drop("_rn"))
    if dedup_dst:
        hop = hop.select(SRC, DST, *carry_cols).distinct()
    return hop


def go(edges: DataFrame | list[DataFrame], start: DataFrame, min_steps: int = 1,
       max_steps: int = 1, direction: str = "out",
       edge_filter: Column | None = None,
       early_stop: bool | None = None,
       step_limits: list[int] | None = None,
       step_samples: list[int] | None = None,
       sample_seed: int = 42,
       track_origin: bool = False,
       origin_col: str | None = None) -> DataFrame:
    """GO M TO N STEPS: multi-hop expansion accumulating per-step edge rows.

    Reference plan: Loop{Expand/ExpandAll} + UnionAllVersionVar accumulation
    (GoPlanner.cpp:15-90, UnionAllVersionVarExecutor.cpp:1-45). Here: a
    Python loop; each iteration joins the deduped frontier to the edge table
    and unions the yield rows for steps in [min_steps, max_steps].

    Adds a ``step`` column. Scale notes: the frontier is deduped every hop
    (dst-only GetDstBySrc shape); with ``early_stop`` each new frontier is
    materialized by :func:`checkpoint_count`, whose Observation yields the
    size off the checkpoint job itself — the empty-frontier terminator and
    broadcast probe cost zero extra jobs per hop.
    For fixed short ranges (max_steps <= 2) there is nothing to skip, so the
    default (``early_stop=None``) disables the counts: step 1 broadcasts the
    (caller-bounded) seed frontier, later hops leave join strategy to AQE,
    whose runtime stats broadcast a small frontier anyway.

    ``edges`` may be a list with one edge table per step (GO ... OVER a
    schedule of edge types): hop *k* then joins only its own table instead
    of a union of all of them — at scale this halves (or better) the
    scanned bytes per hop, the analog of the reference requesting only the
    relevant edge type in each GetNeighbors RPC.

    ``track_origin=True`` reproduces the reference's runtime-input GO
    semantics (tck go/GO.feature "only id n steps": piped multi-start GO
    keeps per-start multiplicity): the frontier carries an ``_origin``
    column and dedups on (origin, vid) instead of vid alone, and results
    gain ``_origin``. ``origin_col`` names a caller-supplied origin key
    in *start* (a row id, so duplicate piped vids each keep their own
    traversal — GoYieldVertexEdge.feature "multi edges over all" pipe);
    default is the vid itself. Frontier size grows with overlapping
    neighborhoods — the same cost the reference pays in its per-input
    runtime maps.
    """
    per_step = isinstance(edges, (list, tuple))
    if per_step and len(edges) != max_steps:
        raise ValueError(f"per-step edges needs {max_steps} tables")
    if early_stop is None:
        early_stop = max_steps > 2
    carry = ("_origin",) if track_origin else ()
    if track_origin:
        oc = origin_col or VID
        frontier = start.select(F.col(oc).alias("_origin"),
                                F.col(VID)).distinct()
    else:
        frontier = start.select(VID).distinct()
    if early_stop:
        # persists only pay off in the counted loop (materialized by the
        # per-hop checkpoint jobs); the free-running short-range path
        # builds ONE lazy plan the caller materializes after this
        # function returns — a persist here would be unpersisted in the
        # finally block before it could ever be populated
        frontier = frontier.persist()
    results: DataFrame | None = None
    # seed-set size: the only dedicated count job — later frontiers get
    # their size free off their checkpoint job (checkpoint_count)
    n = frontier.count() if early_stop else None
    try:
        for step in range(1, max_steps + 1):
            if early_stop:
                if n == 0:
                    break
                small = n <= BROADCAST_FRONTIER_ROWS
            else:
                small = step == 1
            step_edges = edges[step - 1] if per_step else edges
            # per-step truncate pushdown (truncate_clause,
            # PushStepLimitDownGetNeighborsRule /
            # PushStepSampleDownGetNeighborsRule): applied inside the hop,
            # before the next frontier forms — exactly where the reference
            # pushes it into the GetNeighbors RPC
            lim = order = None
            if step_limits is not None and step <= len(step_limits):
                lim = step_limits[step - 1]
            hop = get_neighbors(frontier, step_edges, direction, edge_filter,
                                broadcast_frontier=small,
                                limit_per_vertex=lim, order_per_vertex=order,
                                carry_cols=carry,
                                dedup_frontier=False)  # frontier is distinct
            if step_samples is not None and step <= len(step_samples):
                # SAMPLE is a GLOBAL per-step draw, not per-vertex
                # truncation (GO.feature "go step sample": 3 steps with
                # SAMPLE [1,3,2] returns exactly 2 rows) — LIMIT keeps
                # the per-vertex window (storage truncate) semantics
                hop = (hop.orderBy(F.rand(sample_seed + step))
                       .limit(step_samples[step - 1]))
            if step >= min_steps:
                step_df = hop.withColumn("step", F.lit(step))
                results = step_df if results is None else results.unionByName(
                    step_df, allowMissingColumns=True)
            if step < max_steps:
                nxt = hop.select(*carry, F.col(DST).alias(VID)).distinct()
                if early_stop:
                    # materialize + count in one job; also severs lineage,
                    # which persist() alone does not
                    nxt, n = checkpoint_count(nxt)
                    frontier.unpersist()
                frontier = nxt
        if results is None:
            e0 = edges[0] if per_step else edges
            empty = frontier.limit(0)
            return get_neighbors(empty, e0, direction,
                                 carry_cols=carry).withColumn(
                "step", F.lit(1))
        return results
    finally:
        frontier.unpersist()


def _edge_id_fields(prefix: str = "", reversed_: bool = False) -> list:
    s, d = (DST, SRC) if reversed_ else (SRC, DST)
    t = -F.col(f"{prefix}_dir") if reversed_ else F.col(f"{prefix}_dir")
    return [F.col(f"{prefix}{s}").alias("s"), F.col(f"{prefix}{d}").alias("d"),
            F.col(f"{prefix}{RANK}").alias("r"), t.alias("t"),
            F.col(f"{prefix}_etype").alias("et")]


def _edge_id(prefix: str = "") -> Column:
    return F.struct(*_edge_id_fields(prefix))


def _edge_id_reversed(prefix: str = "") -> Column:
    """The same underlying edge seen from the other orientation: reference
    edge equality is direction-normalized ((a,b,e,r) == (b,a,-e,r),
    Edge.cpp:128-136 keyEqual), so uniqueness checks both images."""
    return F.struct(*_edge_id_fields(prefix, reversed_=True))


def traverse(edges: DataFrame, start: DataFrame, min_hops: int = 1,
             max_hops: int | None = 1, direction: str = "out",
             edge_filter: Column | None = None,
             self_loop_once: bool = False,
             prop_cols: list[str] | None = None) -> DataFrame:
    """MATCH variable-length expansion with per-path edge uniqueness.

    Reference: TraverseExecutor.cpp:25-676 — expand ``[m..n]`` hops building
    an edge-list column, openCypher relationship-uniqueness (an edge may
    appear once per path; tracked via dst2PathsMap + hasSameEdgeInPath).

    Returns one row per path: ``start_vid``, ``end_vid``, ``hops``,
    ``path`` (array of edge structs (s,d,r,t,et)). The uniqueness filter
    is ``NOT exists(path, e -> e == new_edge)`` — JVM-side higher-order
    function, no UDF.

    ``prop_cols`` (opt-in) appends the named edge prop columns to each
    path struct so result-shaping can read ``relationships(p)[i].prop``
    (the reference carries Step props inline, Path.h:15). Cost model: an
    enumeration's frontier rows ARE its output paths, so carrying props
    here multiplies only the output payload, never an intermediate
    min-pruned frontier — the level-pruned shortest-path operators in
    operators/paths.py therefore stay identity-only and leave prop
    resolution to their callers.
    """
    from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                                   StructField, StructType)

    e = oriented(edges, direction, self_loop_once=self_loop_once)
    if edge_filter is not None:
        e = e.filter(edge_filter)
    if "_etype" not in e.columns:        # single-type edge tables
        e = e.withColumn("_etype", F.lit(""))
    props = list(prop_cols or [])
    e = e.select(SRC, DST, RANK, "_dir", "_etype", *props)
    path_type = ArrayType(StructType([
        StructField("s", e.schema[SRC].dataType),
        StructField("d", e.schema[DST].dataType),
        StructField("r", e.schema[RANK].dataType),
        StructField("t", IntegerType()),
        StructField("et", StringType()),
        *[StructField(c, e.schema[c].dataType) for c in props],
    ]))

    def zero_paths() -> DataFrame:
        return (start.select(F.col(VID).alias("start_vid")).distinct()
                .withColumn("end_vid", F.col("start_vid"))
                .withColumn("hops", F.lit(0))
                .withColumn("path", F.array().cast(path_type)))

    paths = zero_paths()
    extra = [F.col(c).alias(c) for c in props]
    results: DataFrame | None = None
    # max_hops=None is the reference's open-ended range (`[e*]` /
    # `[e*m..]` — parser.yy match_step_range, MatchStepRange.h default
    # max SIZE_MAX): iterate until edge-uniqueness empties the frontier.
    # Each unbounded superstep eagerly checkpoints + counts, so the loop
    # is frontier-bounded (≤ longest simple edge path), never SIZE_MAX.
    # A LARGE bounded range takes the same counted loop — the TCK's
    # `[:serve*1000000000..1000000002]` (VariableLengthPattern.feature
    # "Over expand end") must terminate on frontier death, not unroll a
    # billion driver iterations; small ranges keep the free-running
    # unrolled loop (no per-hop count job).
    unbounded = max_hops is None or max_hops > 32
    hop = 0
    while unbounded or hop < max_hops:
        hop += 1
        if max_hops is not None and hop > max_hops:
            break
        new_edge = F.struct(*_edge_id_fields(), *extra) if props \
            else _edge_id()
        # edge-uniqueness via array_contains(path, struct(...)) — a lambda
        # with outer column refs (F.exists) miscompiles on reused Datasets
        # (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at runtime). Checked in both
        # orientations: BOTH-direction expansion must not walk back over
        # the edge it arrived by (direction-normalized edge equality).
        rev_edge = F.struct(*_edge_id_fields(reversed_=True), *extra) \
            if props else _edge_id_reversed()
        uniq = ~F.array_contains(F.col("path"), new_edge) \
            & ~F.array_contains(F.col("path"), rev_edge)
        # alias-qualified join: the edge table participates in every
        # iteration, and df[col] cross-references break Spark's self-join
        # disambiguation once the same base Dataset appears twice in lineage
        stepped = (paths.alias("__p")
                   .join(e.alias("__e"),
                         F.col("__p.end_vid") == F.col(f"__e.{SRC}"), "inner")
                   .filter(uniq)
                   .select(F.col("start_vid"),
                           F.col(DST).alias("end_vid"),
                           F.lit(hop).alias("hops"),
                           F.concat("path", F.array(new_edge)).alias("path")))
        n = None
        if unbounded:
            stepped, n = checkpoint_count(stepped)
        else:
            stepped = stepped.localCheckpoint(eager=False) \
                if hop % 4 == 0 else stepped
        if hop >= min_hops:
            results = stepped if results is None else results.unionByName(stepped)
        paths = stepped
        if n == 0:        # unbounded: frontier exhausted (after the
            break         # union so an empty result keeps its schema)
    if min_hops == 0:
        results = zero_paths() if results is None else zero_paths().unionByName(results)
    if results is None:     # frontier died before min_hops (unbounded)
        results = paths.limit(0)
    return results


def append_vertices(df: DataFrame, tag: DataFrame, on_col: str = DST,
                    prefix: str = "v_") -> DataFrame:
    """AppendVertices (kAppendVertices): fetch dst-vertex props as columns.

    Reference fetches tag props for the pattern's trailing node and appends a
    vertex value (AppendVerticesExecutor.cpp:18-317). Here: a left join
    against the tag table with prefixed prop columns; left join preserves
    dangling edges (reference keeps rows when the filter allows).
    """
    props = [c for c in tag.columns if c != VID]
    renamed = tag.select(F.col(VID), *[F.col(c).alias(f"{prefix}{c}") for c in props])
    return df.join(renamed, df[on_col] == renamed[VID], "left").drop(VID)


def get_edges(keys: DataFrame, edges: DataFrame) -> DataFrame:
    """GetEdges (kGetEdges): fetch edge props for (src, dst, _rank) keys.

    Reference: GetEdgesExecutor.cpp:1-112. Composite-key equi join; the key
    set is typically tiny → broadcast.
    """
    return edges.join(F.broadcast(keys.select(SRC, DST, RANK).distinct()),
                      [SRC, DST, RANK], "inner")


def expand(frontier: DataFrame, edges: DataFrame, direction: str = "out",
           edge_filter: Column | None = None,
           transform: Callable[[DataFrame], DataFrame] | None = None) -> DataFrame:
    """Expand (kExpand/kExpandAll): single frontier advance, returning the
    next frontier (dst-only, deduped) — the GetDstBySrc fast path."""
    hop = get_neighbors(frontier, edges, direction, edge_filter,
                        broadcast_frontier=None)
    if transform is not None:
        hop = transform(hop)
    return hop.select(F.col(DST).alias(VID)).distinct()
