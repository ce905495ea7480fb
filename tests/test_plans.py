"""Plan-shape regression tests — the reference asserts golden *execution
plans*, not just results (``tests/common/plan_differ.py``; plan assertions
throughout ``tests/tck/features/optimizer/``). These tests convert the
repo's plan quality — BFS-vs-enumerate routing, broadcast hop joins,
parquet filter pushdown, codegen scoping — from a bench-timing signal into
a correctness signal: a routing or pushdown regression fails fast here even
when every value-level test still passes.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nebula_spark.catalog import GraphSpace
from nebula_spark.plans.executor import execute

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def plan_of(df, mode: str = "formatted") -> str:
    """The physical plan as text — what ``df.explain(mode)`` prints."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def space(spark, nba):
    sp = GraphSpace(spark, "nba_plans")
    sp.create_tag("player", df=nba["player"])
    sp.create_tag("team", df=nba["team"])
    sp.create_edge("like", df=nba["like"])
    sp.create_edge("serve", df=nba["serve"])
    return sp


def test_shortest_path_routes_bfs_not_enumeration(space):
    """A BFS-eligible shortestPath (single predicate-free var-len segment,
    min_hops <= 1 — any direction, BOTH included) must NOT plan as
    enumerate-then-prune. The enumeration fallback always window-prunes on
    a synthesized ``_hops_total`` column (plans/executor.py), so its
    presence in the physical plan is the regression marker."""
    for pattern in ("-[:like*1..3]->", "-[:like*1..3]-"):
        df = execute(space,
                     'MATCH p = shortestPath('
                     f'(v:player {{name: "Tim"}}){pattern}(m:player)) '
                     'RETURN id(m) AS d, length(p) AS n')
        plan = plan_of(df)
        assert "_hops_total" not in plan, f"enumeration leaked: {pattern}"


def test_shortest_path_min_hops_gt1_raises(space):
    """min_hops > 1 breaks the BFS minimality invariant (a minimal
    *qualifying* walk may revisit vertices). The reference refuses the
    query outright (SemanticError, AllShortestPaths.feature "shortest
    path invalid step") — matching that removes the last exponential
    shortest-path plan instead of keeping an enumerate fallback for it."""
    with pytest.raises(ValueError, match="must be either 0 or 1"):
        execute(space,
                'MATCH p = shortestPath('
                '(v:player {name: "Tim"})-[:like*2..3]->(m:player)) '
                'RETURN id(m) AS d, length(p) AS n')


def test_shortest_path_single_hop_prunes_by_window(space):
    """A fixed single-hop shortestPath `[e]` cannot BFS-route (it goes
    through the one-hop join branch); minimality there is the window
    min-prune — pin that it stays (column pruning drops `_hops_total`
    from the physical plan, but the `_min_hops` window aggregate
    survives)."""
    df = execute(space,
                 'MATCH p = allShortestPaths('
                 '(v:player {name: "Tim"})-[:like]-(m:player)) '
                 'RETURN id(m) AS d, length(p) AS n')
    plan = plan_of(df)
    assert "_min_hops" in plan and "Window" in plan


def test_go_2step_hops_broadcast(spark):
    """Both hops of the 2-step GO must plan as BroadcastHashJoin with the
    edge scan streaming (SCALE.md traversal section): a shuffle join on a
    seed-sized frontier would move the whole edge table at 100 TB."""
    import __spark_entry__ as entry

    df = entry.q_go_2step(spark, SF_DIR)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    # no sort-merge join anywhere in a frontier-hop plan
    assert "SortMergeJoin" not in plan


def test_lookup_filter_reaches_parquet_scan(spark):
    """LOOKUP predicates must push into the parquet scan (the reference's
    IndexScan analog): both conjuncts appear as PushedFilters, and the
    scan reads only the projected columns (column pruning)."""
    import __spark_entry__ as entry

    df = entry.queries()["lookup"](spark, SF_DIR)
    plan = plan_of(df)
    assert "GreaterThanOrEqual(p_size,40)" in plan
    assert "StringStartsWith(p_type,STANDARD)" in plan
    # ReadSchema lists exactly the projected columns — a scan that reads
    # p_retailprice or p_comment for this 4-column projection is wrong
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert "p_retailprice" not in read_schema[0]
    assert "p_comment" not in read_schema[0]


def test_scoped_conf_disables_wholestage_codegen(spark):
    """Superstep loops scope whole-stage codegen off (SCALE.md: per-
    iteration recompilation dominated runtime). The executed plan inside
    the scope must carry no codegen stages (``*(N)`` markers); the same
    query outside the scope must codegen. Asserted on the post-action
    executedPlan because AQE materializes codegen per query stage — the
    static explain shows none either way."""
    from nebula_spark.session import scoped_conf

    def executed_plan():
        df = (spark.range(1000)
              .groupBy((F.col("id") % 7).alias("k"))
              .agg(F.sum("id").alias("s")))
        df.collect()
        return df._jdf.queryExecution().executedPlan().toString()

    with scoped_conf(spark, **{"spark.sql.codegen.wholeStage": "false"}):
        assert "*(" not in executed_plan()
    assert "*(" in executed_plan()


def test_global_shuffle_plans_range_exchange_no_global_sort(spark):
    """global_shuffle must plan as a range-partitioning exchange plus a
    partition-local sort — never a global Sort (single ordering task at
    100 TB). Its key values are oracle-covered through train_split's
    shuffle_key column; this pins the plan shape."""
    from nebula_spark.pipeline.curate import global_shuffle

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "doc_id long, text string")
    plan = plan_of(global_shuffle(docs))
    assert "rangepartitioning(shuffle_key" in plan
    # the only Sort is the within-partition one (global=false ⇒ formatted
    # explain prints "Sort" with no preceding global Exchange requirement)
    sort_lines = [ln for ln in plan.splitlines()
                  if ln.strip().startswith("Arguments:")
                  and "shuffle_key" in ln and "ASC" in ln]
    assert any("false" in ln for ln in sort_lines), plan


def _skew_confs():
    """Skew thresholds scaled down to test-sized data; the ratios (hub
    partition ≫ factor × median) are what production AQE sees at 100 TB
    with the default 256m threshold."""
    return {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    }


@pytest.fixture(scope="module")
def hub_graph(spark):
    """One 40k-out-degree supernode over a 10k-edge background graph —
    the adversarial degree distribution SCALE.md's traversal section
    claims AQE handles."""
    hub = spark.range(40_000).select(
        F.lit("h").alias("_src"),
        F.concat(F.lit("d"), F.col("id")).alias("_dst"),
        F.lit(0).alias("_rank"))
    bg = spark.range(10_000).select(
        F.concat(F.lit("s"), (F.col("id") % 5_000)).alias("_src"),
        F.concat(F.lit("t"), F.col("id")).alias("_dst"),
        F.lit(0).alias("_rank"))
    edges = hub.unionByName(bg).localCheckpoint(eager=True)
    frontier = (edges.select(F.col("_src").alias("_vid")).distinct()
                .localCheckpoint(eager=True))
    return edges, frontier


def test_skewed_hop_join_gets_aqe_skew_split(spark, hub_graph):
    """A non-broadcast hop over a supernode must come out of AQE with the
    skewed partition split (SortMergeJoin(skew=true) + AQEShuffleRead
    "skewed") — the runtime protection SCALE.md relies on instead of
    salting. Requires dedup_frontier=False: loop frontiers are already
    distinct, and the redundant Aggregate would break the
    SMJ←Sort←ShuffleQueryStage pattern OptimizeSkewedJoin matches."""
    from nebula_spark.operators.traverse import get_neighbors
    from nebula_spark.session import scoped_conf

    edges, frontier = hub_graph
    with scoped_conf(spark, **_skew_confs()):
        hop = get_neighbors(frontier, edges, broadcast_frontier=False,
                            dedup_frontier=False).select(
            F.lit(1).alias("one"))
        # every src is in the frontier → the hop returns all 50k edges
        assert len(hop.collect()) == 50_000
        plan = hop._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "skewed" in plan  # AQEShuffleRead … skewed


def test_redundant_frontier_dedup_blocks_skew_split(spark, hub_graph):
    """Documents WHY get_neighbors grew dedup_frontier: with the default
    re-distinct, the frontier-side Aggregate sits between the exchange
    and the join and today's OptimizeSkewedJoin pattern no longer
    matches, so the hub partition is NOT split. If a future Spark learns
    to split through aggregates this is an improvement, not a bug —
    the assert downgrades to a warning rather than failing the suite
    (the saved aggregate still stands either way)."""
    import warnings

    from nebula_spark.operators.traverse import get_neighbors
    from nebula_spark.session import scoped_conf

    edges, frontier = hub_graph
    with scoped_conf(spark, **_skew_confs()):
        hop = get_neighbors(frontier, edges,
                            broadcast_frontier=False).select(
            F.lit(1).alias("one"))
        hop.collect()
        plan = hop._jdf.queryExecution().executedPlan().toString()
    if "skew=true" in plan:
        warnings.warn(
            "OptimizeSkewedJoin now splits through the frontier Aggregate "
            "— Spark improved; dedup_frontier's plan-shape rationale (and "
            "this test) can be retired", stacklevel=1)


def test_bfs_shortest_path_statement_is_bidirectional(space):
    """FIND SHORTEST PATH plans through the meet-in-the-middle distance
    search: the final plan aggregates per-pair minima over checkpointed
    frontier meets (min(dist) HashAggregate over ExistingRDD scans), and —
    because every per-round meet is already materialized — contains no
    joins against the edge tables at action time."""
    df = execute(space, 'FIND SHORTEST PATH FROM "p1" TO "p5" OVER like')
    plan = plan_of(df)
    assert "min(dist" in plan      # exprId-suffixed: min(dist#NNN)
    assert "ExistingRDD" in plan


def test_all_paths_expands_half_depth_from_both_ends(spark, monkeypatch):
    """FIND ALL/NOLOOP PATH must never run a full-depth one-sided
    enumeration: the conjunct design (AllPathsExecutor.h:16-21) expands
    ⌈L/2⌉ from the sources and ⌊L/2⌋ from the targets — frontier
    2·b^(L/2), not b^L. Pinned by recording the depths all_paths hands
    to traverse."""
    from nebula_spark.operators import paths as P

    calls: list[tuple[int, str]] = []
    real = P.traverse

    def spy(edges, start, min_hops=1, max_hops=1, direction="out", **kw):
        calls.append((max_hops, direction))
        return real(edges, start, min_hops=min_hops, max_hops=max_hops,
                    direction=direction, **kw)

    monkeypatch.setattr(P, "traverse", spy)
    e = spark.createDataFrame(
        [("a", "b", 0), ("b", "c", 0), ("c", "d", 0)],
        "_src string, _dst string, _rank long")
    src = spark.createDataFrame([("a",)], ["_vid"])
    dst = spark.createDataFrame([("d",)], ["_vid"])
    got = P.all_paths(e, src, dst, max_hops=6).collect()
    assert [(r.start_vid, r.end_vid, r.hops) for r in got] == [("a", "d", 3)]
    assert sorted(calls) == [(3, "in"), (3, "out")]


def test_all_paths_conjunct_is_equi_join(spark):
    """The ALL PATH middle conjunct must plan as an equi-join on the
    meeting vertex — a nested-loop/cartesian there would pair every left
    walk with every right walk (b^(L/2) × b^(L/2) = the b^L blowup the
    design removes)."""
    from nebula_spark.operators.paths import all_paths

    e = spark.createDataFrame(
        [("a", "b", 0), ("b", "c", 0), ("b", "d", 0), ("c", "d", 0)],
        "_src string, _dst string, _rank long")
    src = spark.createDataFrame([("a",)], ["_vid"])
    dst = spark.createDataFrame([("d",)], ["_vid"])
    plan = plan_of(all_paths(e, src, dst, max_hops=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_subgraph_where_filter_reaches_parquet_scan(spark):
    """GET SUBGRAPH's WHERE pre-filters the edge universe ONCE before
    the BFS (executor._subgraph_where) — and over a single-type
    universe the edge predicate must stay a plain column comparison
    that Catalyst pushes into the parquet scan, not a _etype-masked
    CASE WHEN that blocks pushdown."""
    from nebula_spark.catalog import tpch_space
    from nebula_spark.operators.traverse import oriented
    from nebula_spark.plans import ngql as A
    from nebula_spark.plans.executor import _subgraph_where

    sp = tpch_space(spark, SF_DIR)
    st = A.parse("GET SUBGRAPH FROM 1 OUT placed WHERE "
                 "placed.o_totalprice > 100000 YIELD edges as e").stages[0]
    filtered = _subgraph_where(sp, st, oriented(sp.edge("placed"), "out"))
    plan = plan_of(filtered)
    assert "GreaterThan(o_totalprice,100000" in plan, plan


def test_find_path_where_filter_pushes_single_type(spark):
    """FIND PATH WHERE over a single OVER type likewise resolves the
    edge prop unmasked so the filter reaches the scan."""
    from nebula_spark.catalog import tpch_space
    from nebula_spark.plans.executor import _find_path_where

    sp = tpch_space(spark, SF_DIR)
    keep = _find_path_where(sp, ["placed"],
                            (">", ("edge_prop", "placed", "o_totalprice"),
                             ("lit", 100000)))
    filtered = sp.edge("placed").filter(keep)
    plan = plan_of(filtered)
    assert "GreaterThan(o_totalprice,100000" in plan, plan
