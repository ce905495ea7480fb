"""Driver contract for the spark-graft builder (PySpark target).

Each entry in ``queries()`` exercises one operator family from SURVEY.md §2
through the nebula_spark engine; ``oracle_sql()`` holds the DuckDB-equivalent
ANSI SQL. Column names are aligned on both sides (the driver sorts columns by
name before value-hashing).

Float discipline: aggregates over doubles are order-dependent, so every
summed double is cast to DECIMAL first (exact, order-independent) and the
result cast back to double; averages are rounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nebula_spark.catalog import load_tables, tpch_space
from nebula_spark.operators import (
    aggregate, anti_join, dedup, filter_rows, go, inner_join, left_join,
    project, roll_up_apply, semi_join, topn, union_distinct, unwind,
)
from nebula_spark.operators.aggregate import agg_call
from nebula_spark.operators.paths import bfs_shortest_paths
from nebula_spark.operators.setops import intersect, minus

DEC = "decimal(18,2)"


def _dec_sum(col: str):
    return F.sum(F.col(col).cast(DEC)).cast("double")


# Namespaced vids for heterogeneous-key graph unions (customer/nation/...
# keys share one traversal space): tag-offset LONG keys — joins and
# frontier dedups stay on longs (hash/compare in codegen, no string
# allocation), unlike the r1 'c:'||vid string keys. 44 bits leaves room
# for ~17.6e12 vids per tag; the string form exists only in final output
# columns, where the oracles expect 'c:123'.
_TAG_CODE = {"c": 1, "n": 2, "o": 3, "p": 4, "r": 5}
_NK_OFF = 1 << 44


def _nk(tag: str, col):
    return (F.lit(_TAG_CODE[tag] * _NK_OFF) + col.cast("long"))


def _nk_str(col):
    c = col.cast("long")
    code = F.shiftright(c, 44)
    tag = (F.when(code == 1, "c").when(code == 2, "n").when(code == 3, "o")
           .when(code == 4, "p").otherwise("r"))
    return F.concat(tag, F.lit(":"),
                    c.bitwiseAND(F.lit(_NK_OFF - 1)).cast("string"))


# ---------------------------------------------------------------------------
# queries — each callable: (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def q_scan_project(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, ("lineitem",))
    li = filter_rows(t["lineitem"], F.col("l_shipdate") >= "1995-06-01")
    return project(li, F.col("l_orderkey"), F.col("l_linenumber"),
                   (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .alias("revenue"))


def q_agg_group(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 shape: Aggregate operator with the reference agg functions."""
    t = load_tables(spark, sf, ("lineitem",))
    return aggregate(
        t["lineitem"].filter(F.col("l_shipdate") <= "1998-09-02"),
        ["l_returnflag", "l_linestatus"],
        _dec_sum("l_quantity").alias("sum_qty"),
        _dec_sum("l_extendedprice").alias("sum_base_price"),
        F.round(agg_call("avg", F.col("l_discount")), 6).alias("avg_disc"),
        agg_call("count", F.lit(1)).alias("count_order"),
        agg_call("max", F.col("l_quantity")).alias("max_qty"),
        agg_call("min", F.col("l_shipdate")).alias("min_ship"),
    ).orderBy("l_returnflag", "l_linestatus")


def q_agg_global(spark: SparkSession, sf: str) -> DataFrame:
    """Global aggregate (empty group keys → reference default-row semantics)."""
    t = load_tables(spark, sf, ("orders",))
    return aggregate(
        t["orders"], [],
        agg_call("count", F.lit(1)).alias("n_orders"),
        agg_call("count", F.col("o_custkey"), distinct=True).alias("n_custs"),
        _dec_sum("o_totalprice").alias("total"),
    )


def q_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Inner joins + aggregation: revenue by nation (broadcast dims)."""
    t = load_tables(spark, sf, ("customer", "orders", "nation"))
    j = inner_join(t["orders"], t["customer"],
                   t["orders"]["o_custkey"] == t["customer"]["c_custkey"])
    j = inner_join(j, t["nation"],
                   F.col("c_nationkey") == F.col("n_nationkey"),
                   hint="broadcast")
    return (aggregate(j, ["n_name"],
                      _dec_sum("o_totalprice").alias("revenue"),
                      agg_call("count", F.lit(1)).alias("n_orders"))
            .orderBy("n_name"))


def q_topn(spark: SparkSession, sf: str) -> DataFrame:
    """TopN (fused order+limit → TakeOrderedAndProject)."""
    t = load_tables(spark, sf, ("orders",))
    spend = aggregate(t["orders"], ["o_custkey"],
                      _dec_sum("o_totalprice").alias("spend"))
    return topn(spend, [F.desc("spend"), F.asc("o_custkey")], 10)


def q_left_join(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, ("customer", "orders"))
    cnt = aggregate(t["orders"], ["o_custkey"],
                    agg_call("count", F.lit(1)).alias("n"))
    j = left_join(t["customer"], cnt,
                  t["customer"]["c_custkey"] == cnt["o_custkey"])
    return project(j, "c_custkey",
                   F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"))


def q_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """PatternApply semi: customers with ≥1 high-value order."""
    t = load_tables(spark, sf, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 200000)
    return semi_join(t["customer"].select(F.col("c_custkey")),
                     big.select(F.col("o_custkey").alias("c_custkey")),
                     ["c_custkey"]).orderBy("c_custkey")


def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    """PatternApply anti: customers with no orders at all."""
    t = load_tables(spark, sf, ("customer", "orders"))
    return anti_join(t["customer"].select("c_custkey", "c_mktsegment"),
                     t["orders"].select(F.col("o_custkey").alias("c_custkey")),
                     ["c_custkey"]).orderBy("c_custkey")


def q_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """PatternApply semi + anti in one slot (the driver caps oracle rows,
    so the two apply variants share a query, tagged by ``op``): customers
    with ≥1 high-value order (semi) and customers with no orders (anti)."""
    t = load_tables(spark, sf, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 200000)
    s = semi_join(t["customer"].select("c_custkey", "c_mktsegment"),
                  big.select(F.col("o_custkey").alias("c_custkey")),
                  ["c_custkey"]).withColumn("op", F.lit("semi"))
    a = anti_join(t["customer"].select("c_custkey", "c_mktsegment"),
                  t["orders"].select(F.col("o_custkey").alias("c_custkey")),
                  ["c_custkey"]).withColumn("op", F.lit("anti"))
    return s.unionByName(a)


def q_dedup(spark: SparkSession, sf: str) -> DataFrame:
    t = load_tables(spark, sf, ("lineitem",))
    return dedup(t["lineitem"].select("l_returnflag", "l_linestatus"))


def q_unwind(spark: SparkSession, sf: str) -> DataFrame:
    """Unwind: explode p_type words."""
    t = load_tables(spark, sf, ("part",))
    df = t["part"].select("p_partkey", F.split("p_type", " ").alias("words"))
    return unwind(df, "words", "word", keep_other_cols=False)


def q_rollup_apply(spark: SparkSession, sf: str) -> DataFrame:
    """RollUpApply: per-customer sorted list of order priorities (as string
    for hash-stable comparison)."""
    t = load_tables(spark, sf, ("customer", "orders"))
    r = roll_up_apply(
        t["customer"].select("c_custkey"),
        t["orders"].select(F.col("o_custkey").alias("c_custkey"),
                           "o_orderpriority"),
        ["c_custkey"], "o_orderpriority", "prios")
    return r.select("c_custkey", F.array_join("prios", ",").alias("prios"))


def q_setops(spark: SparkSession, sf: str) -> DataFrame:
    """Union-distinct + intersect + minus over nation-key sets."""
    t = load_tables(spark, sf, ("customer", "supplier"))
    c = t["customer"].select(F.col("c_nationkey").cast("long").alias("nk"))
    s = t["supplier"].select(F.col("s_nationkey").cast("long").alias("nk"))
    u = union_distinct(dedup(c), dedup(s)).withColumn("op", F.lit("union"))
    i = intersect(dedup(c), dedup(s)).withColumn("op", F.lit("intersect"))
    m = minus(dedup(c), dedup(s)).withColumn("op", F.lit("minus"))
    return u.unionByName(i).unionByName(m)


def q_window_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Per-vertex limit parity: top-3 parts per brand (window row_number)."""
    from pyspark.sql.window import Window
    t = load_tables(spark, sf, ("part",))
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"),
                                              F.asc("p_partkey"))
    return (t["part"].withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("p_brand", "p_partkey", "p_retailprice", "rn"))


def q_go_1step(spark: SparkSession, sf: str) -> DataFrame:
    """GO 1 STEP: customer→order over e_placed with edge filter."""
    sp = tpch_space(spark, sf)
    start = sp.tag("customer").filter(F.col("_vid") % 10 == 0).select("_vid")
    hop = go(sp.edge("placed"), start, 1, 1,
             edge_filter=F.col("o_totalprice") > 50000)
    return hop.select(F.col("_src").alias("c_key"),
                      F.col("_dst").alias("o_key"), "o_totalprice")


def q_go_2step(spark: SparkSession, sf: str) -> DataFrame:
    """GO 2 STEPS: customer→order→part over a namespaced-vid edge union
    (vids live in one space, so heterogeneous keys get a tag-offset long
    namespace; string form only in the output projection)."""
    sp = tpch_space(spark, sf)
    start = sp.tag("customer").filter(F.col("_vid") % 10 == 0).select(
        _nk("c", F.col("_vid")).alias("_vid"))
    placed = sp.edge("placed").select(
        _nk("c", F.col("_src")).alias("_src"),
        _nk("o", F.col("_dst")).alias("_dst"), "_rank")
    contains = sp.edge("contains").select(
        _nk("o", F.col("_src")).alias("_src"),
        _nk("p", F.col("_dst")).alias("_dst"), "_rank")
    hop = go([placed, contains], start, 2, 2)
    return dedup(hop.select(_nk_str(F.col("_src")).alias("o_key"),
                            _nk_str(F.col("_dst")).alias("p_key"),
                            F.col("_rank").alias("rank")))


def _cnr_edges(t):
    """customer→nation→region edge union on tag-offset long keys."""
    e1 = t["customer"].select(
        _nk("c", F.col("c_custkey")).alias("_src"),
        _nk("n", F.col("c_nationkey")).alias("_dst"),
        F.lit(0).cast("long").alias("_rank"))
    e2 = t["nation"].select(
        _nk("n", F.col("n_nationkey")).alias("_src"),
        _nk("r", F.col("n_regionkey")).alias("_dst"),
        F.lit(0).cast("long").alias("_rank"))
    return e1.unionByName(e2)


def q_bfs_distances(spark: SparkSession, sf: str) -> DataFrame:
    """FIND SHORTEST PATH (distance form) on the namespaced c→n→r graph."""
    t = load_tables(spark, sf, ("customer", "nation"))
    seeds = t["customer"].filter(F.col("c_custkey") <= 20).select(
        _nk("c", F.col("c_custkey")).alias("_vid"))
    p = bfs_shortest_paths(_cnr_edges(t), seeds, max_hops=3)
    return p.select(_nk_str(F.col("_src")).alias("src"),
                    _nk_str(F.col("_dst")).alias("dst"), "dist")


def q_fetch_vertices(spark: SparkSession, sf: str) -> DataFrame:
    """FETCH PROP (GetVertices): assemble tag props for a vid set."""
    sp = tpch_space(spark, sf)
    vids = sp.tag("customer").filter(F.col("_vid") % 100 == 1).select("_vid")
    return sp.vertex(vids, tags=["customer"])


def q_fetch_edges(spark: SparkSession, sf: str) -> DataFrame:
    """FETCH PROP ON edge (GetEdges): props for (src,dst,rank) keys."""
    from nebula_spark.operators import get_edges
    sp = tpch_space(spark, sf)
    e = sp.edge("contains")
    keys = e.filter((F.col("_src") % 50 == 0) & (F.col("_rank") <= 2))
    return get_edges(keys, e).select(F.col("_src").alias("src"),
                                     F.col("_dst").alias("dst"),
                                     F.col("_rank").alias("rank"),
                                     "l_quantity",
                                     "l_extendedprice")


def q_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """LOOKUP (IndexScan): predicate seek → Parquet pushdown."""
    t = load_tables(spark, sf, ("part",))
    return (filter_rows(t["part"], (F.col("p_size") >= 40)
                        & F.col("p_type").startswith("STANDARD"))
            .select("p_partkey", "p_name", "p_size", "p_type"))


def q_frontend_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Front-end LOOKUP end-to-end (parse→validate→plan→run) — the bench
    front-end lane's index-seek shape (r9 verdict #6; operator twin is
    q_lookup)."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, "LOOKUP ON part WHERE part.p_size >= 40 "
                       "YIELD id(vertex) AS k, part.p_type AS t")


def q_sample_hash(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 5% sample via md5 bucketing (the distributed,
    reproducible analog of the reference's reservoir Sample)."""
    t = load_tables(spark, sf, ("orders",))
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")),
                                1, 4), 16, 10).cast("long") % 20
    return t["orders"].filter(bucket == 0).select("o_orderkey", "o_custkey")


def q_scalar_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar-function battery (FunctionManager parity, §2.9)."""
    from nebula_spark.functions import call
    t = load_tables(spark, sf, ("part",))
    p = t["part"].filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        call("abs", F.col("p_retailprice") * -1).alias("f_abs"),
        call("floor", F.col("p_retailprice")).alias("f_floor"),
        call("ceil", F.col("p_retailprice")).alias("f_ceil"),
        F.round(call("sqrt", F.col("p_size").cast("double")), 10).alias("f_sqrt"),
        F.round(call("pow", F.col("p_size").cast("double"), F.lit(2.0)), 6)
        .alias("f_pow"),
        call("sign", F.col("p_size").cast("double") - 25).alias("f_sign"),
        call("lower", F.col("p_name")).alias("f_lower"),
        call("upper", F.col("p_brand")).alias("f_upper"),
        call("length", F.col("p_name")).alias("f_len"),
        call("substr", F.col("p_type"), 1, 5).alias("f_substr"),
        call("reverse", F.col("p_brand")).alias("f_rev"),
        call("lpad", F.col("p_brand"), 12, "*").alias("f_lpad"),
        call("concat_ws", "|", F.col("p_brand"), F.col("p_type"))
        .alias("f_concat"),
        call("size", call("split", F.col("p_type"), F.lit(" "))).alias("f_nwords"),
        call("md5", F.col("p_name")).alias("f_md5"),
        call("coalesce", F.lit(None).cast("string"), F.col("p_brand"))
        .alias("f_coalesce"),
        call("tointeger", F.col("p_retailprice")).alias("f_toint"),
    )


def q_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """json_extract (FunctionManager string fn) over events.props."""
    t = load_tables(spark, sf, ("events",))
    return (t["events"].filter(F.col("event_id") < 2000)
            .select("event_id",
                    F.get_json_object("props", "$.k").cast("long").alias("k")))


def q_window_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Analytic windows (beyond-parity: reference has none, §2.8):
    lag + running count per user over event time."""
    from pyspark.sql.window import Window
    t = load_tables(spark, sf, ("events",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (t["events"].filter(F.col("user_id") < 30)
            .select("user_id", "event_id",
                    F.lag("event_id").over(w).alias("prev_event"),
                    F.count(F.lit(1)).over(
                        w.rowsBetween(Window.unboundedPreceding, 0))
                    .alias("running_n")))


def q_event_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling-window aggregation (the batch twin of the streaming path)."""
    t = load_tables(spark, sf, ("events",))
    return (t["events"]
            .groupBy(F.date_trunc("day", F.col("ts")).alias("day"),
                     F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"),
                 _dec_sum("value").alias("sum_value"))
            .orderBy("day", "event_type"))


def q_paths_query(spark: SparkSession, sf: str) -> DataFrame:
    """FIND ALL PATH with materialized path column (customer→nation→region).
    Traversal runs on tag-offset long keys; strings appear only in the
    final projection (including inside the path array transform)."""
    from nebula_spark.operators.paths import all_paths
    t = load_tables(spark, sf, ("customer", "nation", "region"))
    sources = t["customer"].filter(F.col("c_custkey") <= 10).select(
        _nk("c", F.col("c_custkey")).alias("_vid"))
    targets = t["region"].select(_nk("r", F.col("r_regionkey")).alias("_vid"))
    p = all_paths(_cnr_edges(t), sources, targets, max_hops=2)
    return p.select(
        _nk_str(F.col("start_vid")).alias("start_vid"),
        _nk_str(F.col("end_vid")).alias("end_vid"), "hops",
        F.array_join(F.transform("path",
                                 lambda e: F.concat(_nk_str(e["s"]),
                                                    F.lit(">"),
                                                    _nk_str(e["d"]))),
                     "|").alias("path_str"))


def q_subgraph(spark: SparkSession, sf: str) -> DataFrame:
    """GET SUBGRAPH WHERE through the nGQL front end (r5 verdict item 7):
    session parameters + an edge-prop filter + a `$$` destination gate in
    one statement, so the oracle value-checks parameter substitution, the
    WHERE-pruned expansion universe, the tag-gate join, AND the closing
    pass (edges from the final frontier back into the visited set —
    SubgraphExecutor.cpp's last round) end-to-end. The former
    operator-direct k_hop_subgraph slot was this statement's redundant
    sibling; the operator keeps its pytest + TCK golden coverage."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    df = execute(sp, """
        GET SUBGRAPH 1 STEPS FROM 1,2,3,4,5,6,7,8,9,10,
                                  11,12,13,14,15,16,17,18,19,20
        OUT placed WHERE placed.o_totalprice > $minp
          AND $$.order.o_orderpriority STARTS WITH $prio
        YIELD edges AS e
    """, params={"minp": 30000.0, "prio": "1"})
    edge = df.select(F.explode("e").alias("edge"))
    return (edge.select(F.col("edge.s").alias("src"),
                        F.col("edge.d").alias("dst"))
            .distinct())


def q_go_1to2(spark: SparkSession, sf: str) -> DataFrame:
    """GO 1 TO 2 STEPS: per-step result accumulation (UnionAllVersionVar)."""
    sp = tpch_space(spark, sf)
    start = sp.tag("customer").filter(F.col("_vid") % 20 == 0).select(
        _nk("c", F.col("_vid")).alias("_vid"))
    placed = sp.edge("placed").select(
        _nk("c", F.col("_src")).alias("_src"),
        _nk("o", F.col("_dst")).alias("_dst"), "_rank")
    contains = sp.edge("contains").select(
        _nk("o", F.col("_src")).alias("_src"),
        _nk("p", F.col("_dst")).alias("_dst"), "_rank")
    hop = go([placed, contains], start, 1, 2)
    return hop.select(_nk_str(F.col("_src")).alias("src"),
                      _nk_str(F.col("_dst")).alias("dst"),
                      F.col("_rank").alias("rank"), "step")


def q_ngql_go_pipe(spark: SparkSession, sf: str) -> DataFrame:
    """nGQL front end: LOOKUP | GO pipe, parsed and compiled by plans/.

    The thresholds arrive as session PARAMETERS (parameter.feature
    surface, round 5) so the oracle also value-checks the substitution
    path end-to-end — the SQL oracle is unchanged because substitution
    is pure literal rewriting."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        LOOKUP ON customer WHERE customer.vid % $mod == 0
          YIELD customer.vid AS vid
        | GO FROM $-.vid OVER placed WHERE placed.o_totalprice > $minp
          YIELD src(edge) AS c_key, dst(edge) AS o_key,
                placed.o_totalprice AS o_totalprice
    """, params={"mod": 10, "minp": 50000})


def q_ngql_yield_join(spark: SparkSession, sf: str) -> DataFrame:
    """Joined YIELD through the front end (YieldValidator::validateJoin,
    yield/join.feature — round 6): two LOOKUP result variables equi-join
    inside a single YIELD … FROM $a INNER JOIN $b ON … statement. Spark
    plans the same HashInnerJoin shape as the reference's executor; at
    100 TB the small national-customer side broadcasts under AQE."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        $a = LOOKUP ON customer WHERE customer.c_nationkey == 3
               YIELD id(vertex) AS cid, customer.c_acctbal AS bal;
        $b = LOOKUP ON placed WHERE placed.o_totalprice > 100000
               YIELD src(edge) AS ckey, dst(edge) AS okey,
                     placed.o_totalprice AS price;
        YIELD $a.cid AS cid, $a.bal AS bal, $b.okey AS okey,
              $b.price AS price
          FROM $a INNER JOIN $b ON $a.cid == $b.ckey
    """)


def q_ngql_match_agg(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH with implicit grouping through the front end."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        MATCH (c:customer)-[p:placed]->(o:order)
        WHERE c.customer.c_mktsegment == "BUILDING"
        RETURN c.customer.c_nationkey AS nk, count(*) AS n_orders
        ORDER BY nk
    """)


def q_ngql_groupby_pipe(spark: SparkSession, sf: str) -> DataFrame:
    """GO | GROUP BY pipe through the front end."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        LOOKUP ON customer WHERE customer.c_nationkey == 7
          YIELD customer.vid AS vid
        | GO FROM $-.vid OVER placed
          YIELD src(edge) AS c, placed.o_orderdate AS d
        | GROUP BY $-.c YIELD $-.c AS c_key, count(*) AS n
    """)


def q_ngql_setops(spark: SparkSession, sf: str) -> DataFrame:
    """Set operation (MINUS) through the front end: reference-faithful
    left-duplicate-preserving semantics (MinusExecutor.cpp:14-47)."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        LOOKUP ON customer WHERE customer.c_nationkey == 3
          YIELD customer.vid AS vid
        MINUS
        LOOKUP ON customer WHERE customer.c_acctbal < 0
          YIELD customer.vid AS vid
    """)


def q_ngql_unwind(spark: SparkSession, sf: str) -> DataFrame:
    """UNWIND pipe stage (UnwindExecutor.cpp:12-54): literal list explode
    cross-product with piped rows."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        LOOKUP ON region YIELD region.vid AS rk
        | UNWIND [1, 2, 3] AS q
        | YIELD $-.rk AS rk, $-.q AS q
    """)


def q_geo_dwithin(spark: SparkSession, sf: str) -> DataFrame:
    """Geo family (GeoFunction.cpp): st_point/st_distance/st_dwithin over
    synthetic customer coordinates; distance JVM-side haversine with the
    S2Earth radius. Distance cast to whole meters so the DuckDB oracle
    (same formula in SQL) compares integer-exact."""
    from nebula_spark.functions import geo as G
    c = spark.read.parquet(f"{sf}/customer.parquet")
    pt = G.st_point((F.col("c_custkey") * 7 % 3600) / 10.0 - 180.0,
                    (F.col("c_custkey") * 11 % 1700) / 10.0 - 85.0)
    center = G.st_point(F.lit(10.0), F.lit(20.0))
    return (c.withColumn("g", pt)
            .filter(G.st_dwithin(F.col("g"), center, 3_000_000.0))
            .select(F.col("c_custkey").alias("key"),
                    F.round(G.st_distance(F.col("g"), center))
                     .cast("long").alias("dist_m"))
            .orderBy("key"))


def q_geo_cover(spark: SparkSession, sf: str) -> DataFrame:
    """st_covers (point-in-polygon, ray-cast pandas UDF) with the Z-order
    cell prefilter in front (GeoIndex.cpp covering-cells analog)."""
    from nebula_spark.functions import geo as G
    s = spark.read.parquet(f"{sf}/supplier.parquet")
    pt = G.st_point((F.col("s_suppkey") * 131 % 3600) / 10.0 - 180.0,
                    (F.col("s_suppkey") * 173 % 1700) / 10.0 - 85.0)
    poly = F.lit("POLYGON((-50 -30, 50 -30, 50 30, -50 30, -50 -30))")
    return (s.withColumn("g", pt)
            .filter(G.st_covers_point(poly, F.col("g")))
            .select(F.col("s_suppkey").alias("key"))
            .orderBy("key"))


def q_geo_polygon(spark: SparkSession, sf: str) -> DataFrame:
    """LineString/Polygon WKT + st_intersects across shape kinds
    (GeoFunction.cpp:106-148): per-supplier synthetic point, a vertical
    segment through it, and a unit square around it, each intersected with
    a fixed rectangle. Shapes are axis-aligned so the DuckDB oracle is
    exact interval algebra while the engine runs the *general*
    segment/containment geometry; includes the point⊂polygon covers case
    so this slot supersedes geo_cover's."""
    from nebula_spark.functions import geo as G
    s = spark.read.parquet(f"{sf}/supplier.parquet")
    x = (F.col("s_suppkey") * 131 % 3600) / 10.0 - 180.0
    y = (F.col("s_suppkey") * 173 % 1700) / 10.0 - 85.0
    seg = F.format_string("LINESTRING(%s %s, %s %s)",
                          x.cast("string"), (y - 3).cast("string"),
                          x.cast("string"), (y + 3).cast("string"))
    sq = F.format_string("POLYGON((%s %s, %s %s, %s %s, %s %s, %s %s))",
                         (x - 1).cast("string"), (y - 1).cast("string"),
                         (x + 1).cast("string"), (y - 1).cast("string"),
                         (x + 1).cast("string"), (y + 1).cast("string"),
                         (x - 1).cast("string"), (y + 1).cast("string"),
                         (x - 1).cast("string"), (y - 1).cast("string"))
    rect = F.lit("POLYGON((-50 -30, 50 -30, 50 30, -50 30, -50 -30))")
    # same rectangle with an interior loop (hole, GeoUtils.h:43): even-odd
    # coverage — a point in the hole is NOT covered, hole rim IS
    holed = F.lit("POLYGON((-50 -30, 50 -30, 50 30, -50 30, -50 -30), "
                  "(-10 -10, 10 -10, 10 10, -10 10, -10 -10))")
    return (s.select(
        F.col("s_suppkey").alias("key"),
        G.st_covers_point(rect, G.st_point(x, y)).alias("covered"),
        G.st_covers_point(holed, G.st_point(x, y)).alias("covered_holed"),
        G.st_intersects(seg, rect).alias("seg_x"),
        G.st_intersects(sq, rect).alias("sq_x"))
        .orderBy("key"))


def q_time_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal family (Date.h / FunctionManager temporal): component
    extraction, datediff, calendar-aware month-duration add AND subtract
    (Duration.h:20 months kept separate from seconds), plus the TIME
    column convention (struct hour/minute/sec, Date.h:115) with wrapping
    time+duration arithmetic."""
    from nebula_spark.functions import temporal as T
    o = spark.read.parquet(f"{sf}/orders.parquet") \
        .filter(F.col("o_orderkey") % 50 == 0)
    dur = T.duration(months=3, days=10)
    key = F.col("o_orderkey")
    t = T.d_time(F.format_string("%02d:%02d:%02d", (key % 24).cast("int"),
                                 (key % 60).cast("int"),
                                 (key % 60).cast("int")))
    tp = T.time_plus(t, T.duration(hours=2, minutes=1, seconds=10))
    return o.select(
        key.alias("key"),
        T.extract("year", F.col("o_orderdate")).cast("long").alias("y"),
        T.extract("quarter", F.col("o_orderdate")).cast("long").alias("q"),
        T.extract("week", F.col("o_orderdate")).cast("long").alias("wk"),
        T.date_diff_days(F.lit("1998-12-31"), F.col("o_orderdate"))
         .cast("long").alias("age_days"),
        T.datetime_plus(F.col("o_orderdate").cast("timestamp"), dur)
         .cast("date").cast("string").alias("due"),
        T.datetime_minus(F.col("o_orderdate").cast("timestamp"), dur)
         .cast("date").cast("string").alias("since"),
        t["hour"].alias("t_hour"),
        tp["hour"].alias("tp_hour"),
        tp["minute"].alias("tp_min"),
        tp["sec"].cast("long").alias("tp_sec"),
    ).orderBy("key")


def q_fulltext(spark: SparkSession, sf: str) -> DataFrame:
    """FulltextIndexScan analog (FulltextIndexScanExecutor.cpp): wildcard +
    fuzzy predicates and a term-frequency score, all JVM-side — the ES
    cluster of the reference collapses into column predicates."""
    from nebula_spark.functions import fulltext as FT
    d = spark.read.parquet(f"{sf}/documents.parquet")
    # BM25 stats over the WHOLE corpus (like ES scoring against the full
    # index), filters applied after
    scored = FT.ft_bm25(d, "merge")
    return (scored.filter(FT.ft_wildcard(F.col("text"), "*merge*batch*"))
            .filter(FT.ft_fuzzy(F.col("text"), "vektor", 1))
            .select(F.col("doc_id"),
                    FT.ft_score(F.col("text"), "merge").cast("long").alias("score"),
                    F.round("bm25", 6).alias("bm25"))
            .orderBy("doc_id"))


def q_ngql_optional_match(spark: SparkSession, sf: str) -> DataFrame:
    """Cypher clause chain through the front end: MATCH + OPTIONAL MATCH
    (left join on the shared alias) + WITH implicit grouping."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        MATCH (c:customer) WHERE c.customer.c_nationkey == 5
        OPTIONAL MATCH (c:customer)-[p:placed]->(o:order)
        WITH c, count(o) AS n
        RETURN c.customer.vid AS key, n
        ORDER BY key
    """)


def q_ngql_listops(spark: SparkSession, sf: str) -> DataFrame:
    """List expressions (§2.9): comprehension, reduce, subscript, and the
    predicate functions all/any/none/single
    (ListComprehensionExpression.h / ReduceExpression.h /
    PredicateExpression.h) — all JVM-side higher-order functions
    (transform/filter/aggregate/forall/exists)."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        LOOKUP ON order WHERE order.vid % 200 == 0 YIELD order.vid AS key
        | YIELD $-.key AS key,
                reduce(acc = 0, x IN [1, 2, 3] | acc + x * $-.key) AS s,
                size([x IN [1, 2, 3, 4] WHERE x % 2 == 0]) AS n_even,
                [10, 20, 30][1] AS second,
                all(x IN [1, 2, 3] WHERE x < $-.key) AS p_all,
                any(x IN [1, 2, 3] WHERE x * 200 == $-.key) AS p_any,
                none(x IN [1, 2, 3] WHERE x > $-.key) AS p_none,
                single(x IN [1, 2, 3] WHERE x * 200 == $-.key) AS p_single
    """)


def q_ngql_match_2hop(spark: SparkSession, sf: str) -> DataFrame:
    """Two-hop MATCH through the front end: customer→order→part with
    filters on both endpoints and implicit grouping."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        MATCH (c:customer)-[:placed]->(o:order)-[:contains]->(p:part)
        WHERE c.customer.c_nationkey == 11 AND p.part.p_size > 40
        RETURN p.part.p_brand AS brand, count(*) AS n
        ORDER BY brand
    """)


def q_short_profile(spark: SparkSession, sf: str) -> DataFrame:
    """LDBC IS1-style short read through the front end: profile + location
    chain customer→nation→region (tests/tck/ldbc ShortReads parity)."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        MATCH (c:customer)-[:located_in]->(n:nation)-[:member_of]->(r:region)
        WHERE c.customer.c_acctbal > 9900.0
        RETURN c.customer.vid AS key, c.customer.c_name AS name,
               n.nation.n_name AS nation, r.region.r_name AS region
        ORDER BY key
    """)


def q_short_orders(spark: SparkSession, sf: str) -> DataFrame:
    """LDBC IS2-style short read: each flagged customer's 3 most recent
    orders (per-vertex top-k window over the hop join)."""
    from pyspark.sql.window import Window
    sp = tpch_space(spark, sf)
    placed = sp.edge("placed")
    flagged = sp.tag("customer").filter(F.col("c_acctbal") < -900) \
        .select(F.col("_vid").alias("_src"))
    hop = placed.join(F.broadcast(flagged), "_src")
    w = Window.partitionBy("_src").orderBy(F.desc("o_orderdate"),
                                           F.desc("_dst"))
    return (hop.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select(F.col("_src").alias("c_key"),
                    F.col("_dst").alias("o_key"),
                    F.col("o_orderdate").cast("string").alias("odate"),
                    F.col("rn"))
            .orderBy("c_key", "rn"))


def q_delete(spark: SparkSession, sf: str) -> DataFrame:
    """DELETE surface (DeleteExecutor.cpp → anti-join): remove orders of
    negative-balance customers, return the surviving per-status counts."""
    from nebula_spark.operators.mutate import delete_rows
    t = load_tables(spark, sf, ("orders", "customer"))
    bad = t["customer"].filter(F.col("c_acctbal") < 0) \
        .select(F.col("c_custkey").alias("o_custkey"))
    remaining = delete_rows(t["orders"], bad, ["o_custkey"])
    return (aggregate(remaining, ["o_orderstatus"],
                      agg_call("count", F.lit(1)).alias("n"))
            .orderBy("o_orderstatus"))


def q_cross_join(spark: SparkSession, sf: str) -> DataFrame:
    """CartesianProduct / CrossJoin (CartesianProductExecutor.cpp:1-71):
    region × nation grid with a computed column."""
    from nebula_spark.operators import cross_join
    t = load_tables(spark, sf, ("region", "nation"))
    r = t["region"].select(F.col("r_regionkey").cast("long").alias("rk"),
                           "r_name")
    n = t["nation"].select(F.col("n_nationkey").cast("long").alias("nk"),
                           "n_regionkey")
    return (cross_join(r, n)
            .select("rk", "r_name", "nk",
                    (F.col("n_regionkey").cast("long") == F.col("rk"))
                    .alias("is_home"))
            .orderBy("rk", "nk"))


def q_agg_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """The full reference aggregate-function set
    (AggFunctionManager.cpp:26-255): STD (population), BIT_AND/OR/XOR,
    COLLECT_SET — grouped by returnflag."""
    from nebula_spark.operators.aggregate import agg_call
    t = load_tables(spark, sf, ("lineitem",))
    li = t["lineitem"].withColumn("lq", F.col("l_quantity").cast("long"))
    return (aggregate(
        li, ["l_returnflag"],
        F.round(agg_call("std", F.col("lq")), 6).alias("std_qty"),
        agg_call("bit_and", F.col("lq")).alias("band"),
        agg_call("bit_or", F.col("lq")).alias("bor"),
        agg_call("bit_xor", F.col("lq")).alias("bxor"),
        F.array_join(F.array_sort(agg_call("collect_set", F.col("l_linestatus"))), ",")
         .alias("statuses"),
    ).orderBy("l_returnflag"))


def q_upsert(spark: SparkSession, sf: str) -> DataFrame:
    """UPDATE/UPSERT (mutate surface): read-modify-write customer balances
    from an orders-derived update set; unmatched keys inserted (UPSERT)."""
    from nebula_spark.operators.mutate import update_rows
    t = load_tables(spark, sf, ("customer", "orders"))
    table = t["customer"].select("c_custkey", "c_name", "c_acctbal")
    upd = (t["orders"].filter(F.col("o_custkey") % 25 == 0)
           .withColumn("c_custkey",
                       F.col("o_custkey") + F.when(
                           F.col("o_custkey") % 100 == 0, 1000000).otherwise(0))
           .groupBy("c_custkey")
           .agg(F.max("o_totalprice").alias("c_acctbal")))
    return update_rows(table, upd, ["c_custkey"], insertable=True)


def q_bfs_targets(spark: SparkSession, sf: str) -> DataFrame:
    """FIND SHORTEST PATH FROM … TO …: bidirectional meet-in-the-middle
    restricted to the target set (r4: bidir_distances replaced the
    single-direction bfs_shortest_paths — same semantics, pinned by
    tests/test_property.py, at half the search depth)."""
    from nebula_spark.operators.paths import bidir_distances
    t = load_tables(spark, sf, ("customer", "nation", "region"))
    seeds = t["customer"].filter(F.col("c_custkey") <= 20).select(
        _nk("c", F.col("c_custkey")).alias("_vid"))
    targets = t["region"].select(_nk("r", F.col("r_regionkey")).alias("_vid"))
    p = bidir_distances(_cnr_edges(t), seeds, targets, max_hops=3)
    return p.select(_nk_str(F.col("_src")).alias("src"),
                    _nk_str(F.col("_dst")).alias("dst"), "dist")


# ---------------------------------------------------------------------------
# pipeline queries (dedup / similarity / text) — oracles share the exact same
# md5-based hash constructions, generated from the same parameters
# ---------------------------------------------------------------------------

_NORM_SQL = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"
_MD5_64_SQL = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"

# byte i (1-based) of the md5 digest, from a hex column `m`
_MD5_BYTE = "(('0x' || substr(m, {i}*2-1, 2))::INT)"


def _shingle_sql(k: int = 3) -> str:
    return ("list_distinct(list_transform("
            f"range(1, greatest(len(toks) - {k - 1}, 0) + 1), "
            f"i -> array_to_string(toks[i:i+{k - 1}], ' ')))")


def q_doc_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Text analysis: token counts, quality score, language ID,
    fingerprint (lang_pred's stopword-vote CASE absorbed the retired
    lang_id slot in r4 — same generated oracle expression)."""
    from nebula_spark.pipeline.dedup import spread
    from nebula_spark.pipeline.text import (
        fingerprint, language_id, quality_score, token_count)
    docs = load_tables(spark, sf, ("documents",))["documents"]
    t = F.col("text")
    # spread (r11, guide §2.5 input skew): the regex/md5-heavy projection
    # otherwise serializes on the scan's task count — a single file is a
    # single task; no-op on a many-file corpus
    return spread(docs).select(
        "doc_id", F.length(t).alias("n_chars_calc"),
        token_count(t).alias("n_tokens"),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp64"))


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic distribution (rows-only check: the stopword
    vote is our heuristic, not SQL-canonical)."""
    from nebula_spark.pipeline.text import language_id
    docs = load_tables(spark, sf, ("documents",))["documents"]
    return (docs.select(language_id(F.col("text")).alias("lang_pred"))
            .groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("lang_pred"))


def q_cube_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Beyond-parity aggregation (SURVEY §2.5 'NOT present' row): CUBE
    grouping sets — free from Catalyst, absent in the reference."""
    t = load_tables(spark, sf, ("lineitem",))
    return (t["lineitem"].cube("l_returnflag", "l_linestatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 _dec_sum("l_quantity").alias("sum_qty"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_ngql_dml(spark: SparkSession, sf: str) -> DataFrame:
    """Front-end DML (InsertExecutor/UpdateExecutor/DeleteExecutor):
    DELETE + UPSERT + UPDATE sentences against a fresh space overlay, then
    an aggregate over the mutated table. Oracle applies the same script
    relationally."""
    from nebula_spark.catalog import GraphSpace
    from nebula_spark.plans import execute
    t = load_tables(spark, sf, ("customer",))["customer"]
    sp = GraphSpace(spark, "dml")
    sp.create_tag("customer", df=t.select(
        F.col("c_custkey").alias("vid"), "c_name", "c_acctbal"))
    execute(sp, "DELETE VERTEX 1, 2, 3")
    execute(sp, "UPSERT VERTEX ON customer 9999999 SET c_acctbal = 42.0")
    execute(sp, "UPDATE VERTEX ON customer 4 SET c_acctbal = c_acctbal + 100.0")
    return sp.tag("customer").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum("c_acctbal").alias("total"))


def q_dml_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """Full DML lifecycle through the nGQL front end (r6 verdict item 5):
    INSERT with temporal constructors (one batched validation job) →
    piped runtime-input UPDATE → DELETE TAG via pipe → DELETE VERTEX …
    WITH EDGE via pipe. The result aggregates every surviving table so
    the DuckDB oracle applies the same mutations relationally
    (InsertExecutor/UpdateExecutor/DeleteExecutor,
    src/graph/executor/mutate/)."""
    from nebula_spark.catalog import GraphSpace
    from nebula_spark.plans import execute
    t = load_tables(spark, sf, ("customer", "orders"))
    sp = GraphSpace(spark, "dml_lc")
    sp.options = {"vid_type": "int64"}
    sp.create_tag("member", df=t["customer"].select(
        F.col("c_custkey").alias("vid"), "c_name", "c_acctbal"))
    sp.create_tag("profile", df=t["customer"]
                  .filter(F.col("c_custkey") % 3 == 0)
                  .select(F.col("c_custkey").alias("vid"), "c_mktsegment"))
    sp.create_edge("placed", df=t["orders"].select(
        F.col("o_custkey").alias("src"), F.col("o_orderkey").alias("dst"),
        F.lit(0).cast("long").alias("_rank"), "o_totalprice"))
    execute(sp, 'CREATE TAG audit(evt string, at timestamp);'
                'INSERT VERTEX audit(evt, at) VALUES '
                '900000001:("batch-a", timestamp("2021-01-01T00:00:00")), '
                '900000002:("batch-b", timestamp("2021-06-01T12:30:00"))')
    execute(sp, 'LOOKUP ON member WHERE member.c_acctbal > 9000.0 '
                'YIELD id(vertex) AS k | UPDATE VERTEX ON member $-.k '
                'SET c_acctbal = c_acctbal + 100.0')
    execute(sp, 'LOOKUP ON member WHERE member.c_acctbal < 500.0 '
                'YIELD id(vertex) AS id | DELETE TAG profile FROM $-.id')
    execute(sp, 'LOOKUP ON member WHERE member.c_acctbal < 0.0 '
                'YIELD id(vertex) AS id | DELETE VERTEX $-.id WITH EDGE')
    return (sp.tag("member").agg(
                F.count(F.lit(1)).alias("n_member"),
                _dec_sum("c_acctbal").alias("total_bal"))
            .crossJoin(sp.tag("profile").agg(
                F.count(F.lit(1)).alias("n_profile")))
            .crossJoin(sp.tag("audit").agg(
                F.count(F.lit(1)).alias("n_audit"),
                F.min("at").cast("long").alias("first_at")))
            .crossJoin(sp.edge("placed").agg(
                F.count(F.lit(1)).alias("n_edges"))))


def q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Pregel-style iterative PageRank (operators/algo.py) over the
    customer→nation→region graph, 3 synchronous supersteps. Oracle is the
    same recurrence unrolled as three CTE levels."""
    from nebula_spark.operators.algo import pagerank
    sp = tpch_space(spark, sf)
    edges = sp.edge("located_in").unionByName(sp.edge("member_of"))
    pr = pagerank(edges, iterations=3)
    # integer micro-rank: floor(x*1e6 + 0.5) is the same IEEE op sequence
    # in both engines, unlike ROUND (Spark rounds the shortest decimal
    # repr half-up; DuckDB rounds the true binary value — they disagree
    # exactly on representation-boundary values)
    return (pr.select("vid", F.floor(F.col("rank") * 1000000.0 + 0.5)
                      .cast("long").alias("rank_e6"))
            .orderBy("vid"))


def q_ngql_assign(spark: SparkSession, sf: str) -> DataFrame:
    """nGQL variable assignment (Assign, AssignExecutor.cpp:1-32):
    `$var = <stmt>;` then traversal seeded FROM $var.col."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        $t = GO FROM 1, 2, 3 OVER located_in YIELD dst(edge) AS n;
        GO FROM $t.n OVER member_of YIELD DISTINCT dst(edge) AS r
        | ORDER BY $-.r
    """)


def q_shortest_path_fn(spark: SparkSession, sf: str) -> DataFrame:
    """MATCH shortestPath() through the Cypher front end (kShortestPath,
    SingleShortestPath.cpp:214-265): one minimal-hop row per reachable
    (start, end) pair over located_in|member_of. Vids are shared across
    tags (multi-tag vertices), so the oracle expands each vid's out-edges
    from every tag carrying them (customer located_in + nation member_of)
    at each hop and takes MIN(hops) per pair — exactly the single-shortest
    semantics."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        MATCH p = shortestPath(
            (s:supplier)-[:located_in|member_of*1..2]->(x))
        RETURN s.supplier.vid AS s_key, id(x) AS end_vid,
               length(p) AS hops
        ORDER BY s_key, end_vid
    """)


def q_step_limit(spark: SparkSession, sf: str) -> DataFrame:
    """Per-hop truncate clause (parser.yy truncate_clause :1424-1430;
    PushStepLimitDownGetNeighborsRule.cpp): GO 2 STEPS with LIMIT [2, 3]
    keeps the 2 smallest-(neighbor, rank) edges per vertex at hop 1 and 3
    at hop 2 — a per-vertex window inside each hop join, where the
    reference pushes the truncate into the GetNeighbors RPC; NOT a global
    limit. Vids are shared across tags, so hop-2 frontier customers with
    keys <= 24 re-expand as nations (same multi-tag convention as
    shortest_path_fn's oracle)."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    return execute(sp, """
        GO 2 STEPS FROM 0, 1, 2 OVER located_in REVERSELY
        YIELD located_in._src AS via, located_in._dst AS person LIMIT [2, 3]
        | ORDER BY $-.via, $-.person
    """)


def q_show_admin(spark: SparkSession, sf: str) -> DataFrame:
    """Admin/meta surface (ShowTagsExecutor/DescTagExecutor shapes,
    executor.py _exec_admin): SHOW TAGS + SHOW EDGES + DESCRIBE TAG/EDGE
    union-shaped into one (kind, name, dtype, nullable) frame so the
    catalog's names AND schema dtypes are value-checked by the oracle."""
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)

    def shaped(stmt: str, kind: str) -> DataFrame:
        df = execute(sp, stmt)
        if "Name" in df.columns:         # SHOW TAGS / SHOW EDGES
            return df.select(F.lit(kind).alias("kind"),
                             F.col("Name").alias("name"),
                             F.lit("").alias("dtype"),
                             F.lit("").alias("nullable"))
        return df.select(F.lit(kind).alias("kind"),      # DESCRIBE
                         F.col("Field").alias("name"),
                         F.col("Type").alias("dtype"),
                         F.col("Null").alias("nullable"))

    return (shaped("SHOW TAGS", "tag")
            .unionByName(shaped("SHOW EDGES", "edge"))
            .unionByName(shaped("DESCRIBE TAG nation", "desc_nation"))
            .unionByName(shaped("DESCRIBE EDGE contains", "desc_contains"))
            .orderBy("kind", "name"))


def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based session windows per user (streaming/ingest.sessionize —
    Spark native session_window, identical code path on a stream). Oracle
    is the classic gaps-and-islands rewrite: a session breaks when the gap
    to the previous event is >= the timeout (session windows are half-open
    [start, last+gap))."""
    from nebula_spark.streaming.ingest import sessionize
    ev = load_tables(spark, sf, ("events",))["events"]
    sess = sessionize(ev, gap="6 hours")
    return (sess.select("user_id",
                        F.col("s.start").alias("session_start"),
                        "n_events", F.col("last_ts").alias("last_ts"))
            .orderBy("user_id", "session_start"))


def q_multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal decode plumbing (training-data pipeline): document text
    bytes treated as an opaque binary column, pushed through the
    mapInPandas fake decoder (deterministic md5-derived dims + feature).
    The oracle replicates the md5-byte arithmetic in pure SQL, so the
    whole Arrow-batch path — schema, batching, salted partitioning — is
    value-checked, not just row-counted. feat0_byte recovers the first
    feature byte from the float32 feature (x255, round) so the compare is
    exact despite the float32 column type."""
    from nebula_spark.pipeline.multimodal import image_features
    docs = load_tables(spark, sf, ("documents",))["documents"]
    blobs = (docs.filter(F.col("doc_id") < 300)
             .select("doc_id", F.encode("text", "utf-8").alias("content")))
    # no salt repartition (r12, guide §4.2): the probe is bounded to
    # ≤300 tiny rows by the pushed doc_id filter — an 8-way content-hash
    # exchange only fragmented them into sub-vectorization Arrow batches
    # across 8 Python workers (the r11 scaling block's 0.85 ratio at 8
    # cores was this lane's over-parallelization). The salt stays the
    # right call for unbounded corpora and remains a parameter of
    # image_features.
    feats = image_features(blobs, fake=True)
    return (feats.select(
        "doc_id", "width", "height", "channels", "format",
        F.round(F.element_at("feat", 1) * 255).cast("int").alias("feat0_byte"))
        .orderBy("doc_id"))


def q_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame-sampling shape (1→N flatMap under mapInPandas): fake
    decoder derives a deterministic frame count from the content md5;
    oracle re-derives it and unnests a range."""
    from nebula_spark.pipeline.multimodal import frame_sample
    docs = load_tables(spark, sf, ("documents",))["documents"]
    blobs = (docs.filter(F.col("doc_id") < 100)
             .select("doc_id", F.encode("text", "utf-8").alias("content")))
    return (frame_sample(blobs, every_n=10, fake=True)
            .orderBy("doc_id", "frame_idx"))


def q_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from nebula_spark.pipeline import exact_dedup
    docs = load_tables(spark, sf, ("documents",))["documents"]
    return exact_dedup(docs)


def q_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash signatures (8 perms, 3-shingles), signature as csv string."""
    from nebula_spark.pipeline import minhash_signatures
    docs = load_tables(spark, sf, ("documents",))["documents"]
    sig = minhash_signatures(docs, k=3, num_hashes=8)
    return sig.select(
        F.col("id").alias("doc_id"),
        F.array_join(F.transform("sig", lambda x: x.cast("string")), ",")
        .alias("sig"))


def q_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """LSH candidate pairs (8 perms, 4 bands of 2)."""
    from nebula_spark.pipeline import minhash_lsh_pairs
    docs = load_tables(spark, sf, ("documents",))["documents"]
    return minhash_lsh_pairs(docs, k=3, num_hashes=8, bands=4)


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup cluster assignment: LSH bucket STAR edges → connected
    components, cluster id = min member (the doc a dedup pass keeps).
    Star edges (doc → bucket-min) span the same components as the
    all-pairs bucket cliques but stay LINEAR in bucket size — the
    100 TB shape where one duplicate-heavy template must not emit a
    quadratic pair list (r10; see pipeline.dedup.lsh_star_edges)."""
    from nebula_spark.pipeline import connected_components, lsh_star_edges
    docs = load_tables(spark, sf, ("documents",))["documents"]
    # distinct=False: connected_components symmetrizes-then-distincts the
    # pair list anyway, so the star edges' own dedup exchange is redundant
    # here (identical clusters, one less full shuffle)
    pairs = lsh_star_edges(docs, k=3, num_hashes=8, bands=4, distinct=False)
    cc = connected_components(pairs, "id_a", "id_b")
    return (cc.select(F.col("node").alias("doc_id"), "cluster_id")
            .orderBy("doc_id"))


def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    from nebula_spark.pipeline import simhash64
    docs = load_tables(spark, sf, ("documents",))["documents"]
    return simhash64(docs).select(F.col("id").alias("doc_id"), "simhash")


def q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (threshold 0.4)."""
    from nebula_spark.pipeline import ngram_jaccard_pairs
    docs = load_tables(spark, sf, ("documents",))["documents"]
    return ngram_jaccard_pairs(docs, k=3, threshold=0.4)


def q_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors."""
    from nebula_spark.pipeline import brute_force_topk
    embs = load_tables(spark, sf, ("embeddings",))["embeddings"]
    q = embs.filter(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    return brute_force_topk(embs, q, k=10)


def q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed approximate top-k. The md5-derived hyperplanes are
    deterministic, so the oracle replicates the exact bucketing + the
    bucket-local ranking (see _ann_lsh_oracle)."""
    from nebula_spark.pipeline import lsh_bucketed_topk
    embs = load_tables(spark, sf, ("embeddings",))["embeddings"]
    q = embs.filter(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    return lsh_bucketed_topk(embs, q, k=10, n_planes=6)


def q_near_dup_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Exact embedding near-dup pairs: all-pairs cosine ≥ 0.45
    (synthetic random embeddings top out near 0.51)."""
    from nebula_spark.functions.graphfns import cos_similarity
    embs = load_tables(spark, sf, ("embeddings",))["embeddings"]
    v = embs.select(F.col("vec_id").alias("id"),
                    F.col("embedding").cast("array<double>").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    return (a.join(b, F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.round(cos_similarity(F.col("a.v"), F.col("b.v")), 6)
                    .alias("cosine"))
            .filter(F.col("cosine") >= 0.45))


def _minhash_oracle() -> str:
    from nebula_spark.pipeline.dedup import MINHASH_P, _perm_params
    base = f"({_MD5_64_SQL.format(x='s')} % {MINHASH_P})"
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> ({a} * {base} + {b}) % {MINHASH_P}))"
        for a, b in _perm_params(8))
    return f"""
        WITH t AS (SELECT doc_id, {_shingle_sql(3)} AS sh
                   FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents))
        SELECT doc_id, array_to_string([{mins}], ',') AS sig FROM t
    """


def _simhash_oracle() -> str:
    def mask(bit: int) -> int:
        v = 1 << bit
        return v - (1 << 64) if v >= (1 << 63) else v
    h = f"list_transform(list_distinct(toks), t -> {_MD5_64_SQL.format(x='t')})"
    terms = " + ".join(
        "(CASE WHEN list_sum(list_transform(h, x -> CASE WHEN x & ({m}) <> 0 "
        "THEN 1 ELSE -1 END)) > 0 THEN CAST({m} AS BIGINT) ELSE 0 END)"
        .format(m=mask(b)) for b in range(64))
    return f"""
        WITH t AS (SELECT doc_id, {h} AS h
                   FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents))
        SELECT doc_id, {terms} AS simhash FROM t
    """


def _jaccard_oracle() -> str:
    return f"""
        WITH sh AS (
          SELECT doc_id AS id, len(sh) AS n, unnest(sh) AS s
          FROM (SELECT doc_id, {_shingle_sql(3)} AS sh
                FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents))
        ), inter AS (
          SELECT a.id AS id_a, b.id AS id_b, a.n AS n_a, b.n AS n_b,
                 COUNT(*) AS n_common
          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
          GROUP BY 1, 2, 3, 4
        )
        SELECT id_a, id_b,
               ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6)
               AS jaccard
        FROM inter
        WHERE ROUND(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) >= 0.4
    """


_COS_SQL = ("ROUND(list_cosine_similarity("
            "list_transform(a.embedding, x -> CAST(x AS DOUBLE)), "
            "list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6)")


def q_doc_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition metrics: duplicate-word fraction, top-bigram
    coverage, duplicate-trigram fraction (pipeline/curate.py)."""
    from nebula_spark.pipeline.curate import repetition_stats
    docs = load_tables(spark, sf, ("documents",))["documents"]
    return repetition_stats(docs).select(
        "doc_id", "n_words", "dup_word_frac", "top_bigram_frac",
        "dup_trigram_frac")


def q_train_split(spark: SparkSession, sf: str) -> DataFrame:
    """Curation chain: stratified per-(lang,source) sample → deterministic
    md5 train/val/test assignment → reproducible global shuffle key."""
    from nebula_spark.pipeline.curate import (
        global_shuffle, split_assign, stratified_sample)
    docs = load_tables(spark, sf, ("documents",))["documents"]
    sampled = stratified_sample(docs, ["lang", "source"], 25, seed=7)
    out = global_shuffle(split_assign(sampled, seed=42), seed=42)
    return out.select("doc_id", "split", "shuffle_key")


def q_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub over documents with deterministically injected synthetic
    PII (the corpus itself is PII-free word soup, so the query plants one
    email/url/ip/phone per row — both engines perform the identical
    injection, the oracle checks the regex semantics on real text)."""
    from nebula_spark.pipeline.curate import pii_counts, pii_scrub
    docs = load_tables(spark, sf, ("documents",))["documents"]
    did = F.col("doc_id").cast("string")
    planted = docs.select("doc_id", F.concat_ws(
        " ", F.col("text"),
        F.concat(F.lit("user"), did, F.lit("@example.com")),
        F.concat(F.lit("http://ex.org/d/"), did),
        F.concat(F.lit("10.0."), (F.col("doc_id") % 100).cast("string"),
                 F.lit("."), (F.col("doc_id") % 50).cast("string")),
        F.concat(F.lit("555-"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
    ).alias("text"))
    counts = pii_counts(F.col("text"))
    return planted.select(
        "doc_id", *[c.alias(k) for k, c in counts.items()],
        pii_scrub(F.col("text")).alias("scrubbed"))


def q_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle count + global clustering over the co-order part graph
    (parts linked when they appear in the same order) — degree-oriented
    compact-forward counting (operators/algo.py)."""
    from nebula_spark.operators.algo import triangle_count
    li = load_tables(spark, sf, ("lineitem",))["lineitem"]
    pairs = (li.alias("a").join(
        li.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("_src"),
                F.col("b.l_partkey").alias("_dst")))
    return triangle_count(pairs)


def q_k_core(spark: SparkSession, sf: str) -> DataFrame:
    """3-round k-core peel (k=40) of the co-order part graph: surviving
    vertices with their in-core degree (operators/algo.py). Fixed round
    count = deterministic, SQL-unrollable semantics."""
    from nebula_spark.operators.algo import k_core
    li = load_tables(spark, sf, ("lineitem",))["lineitem"]
    pairs = (li.alias("a").join(
        li.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .select(F.col("a.l_partkey").alias("_src"),
                F.col("b.l_partkey").alias("_dst")))
    return k_core(pairs, k=40, rounds=3)


def q_contamination(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-contamination detection (pipeline/curate.py): docs with
    doc_id % 97 == 0 act as the held-out benchmark corpus; every other
    document reports how many of its distinct word 5-grams appear in it.
    The near-duplicate documents the corpus deliberately contains surface
    with contamination_frac ≈ 1."""
    from nebula_spark.pipeline.curate import contamination
    docs = load_tables(spark, sf, ("documents",))["documents"]
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    probe = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination(probe, bench, n=5)


def q_doc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-size overlapping token windows (64 words, 16 overlap) — the
    corpus→training-examples shaping step (pipeline/curate.py)."""
    from nebula_spark.pipeline.curate import chunk_documents
    docs = load_tables(spark, sf, ("documents",))["documents"]
    return chunk_documents(docs, chunk_size=64, overlap=16)


def q_temperature_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-flattened language resampling (T=2, target 50%):
    keep-rate per lang ∝ √n_g / n_g, md5-deterministic membership
    (pipeline/curate.py)."""
    from nebula_spark.pipeline.curate import temperature_sample
    docs = load_tables(spark, sf, ("documents",))["documents"]
    out = temperature_sample(docs, "lang", target_frac=0.5,
                             temperature=2.0, seed=42)
    return out.select("doc_id", "lang", "rate")


def q_both_shortest(spark: SparkSession, sf: str) -> DataFrame:
    """BOTH-direction shortestPath pair query: meet-in-the-middle over the
    undirected c→n→r graph (bidir_min_paths — the SingleShortestPath.cpp
    conjunct design). Customers are sources; customers + nations are
    targets, so odd totals (1, 3 hops: own/neighbor nation) and even
    totals (2, 4 hops: same-nation / same-region customers) both arise,
    and source∩target overlap exercises the root-cycle search (empty
    here: a customer has one nation, so no edge-unique cycle exists)."""
    from nebula_spark.operators.paths import bidir_min_paths
    t = load_tables(spark, sf, ("customer", "nation"))
    custs = t["customer"].filter(F.col("c_custkey") <= 10).select(
        _nk("c", F.col("c_custkey")).alias("_vid"))
    nations = t["nation"].select(
        _nk("n", F.col("n_nationkey")).alias("_vid"))
    p = bidir_min_paths(_cnr_edges(t), custs,
                        custs.unionByName(nations), max_hops=4,
                        direction="both", mode="single")
    return (p.select(_nk_str(F.col("start_vid")).alias("src_key"),
                     _nk_str(F.col("end_vid")).alias("dst_key"), "hops")
            .orderBy("src_key", "dst_key"))


def q_weighted_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted shortest paths (Bellman-Ford BSP; the reference parses a
    WEIGHT clause but never implemented it — TraverseSentences.h:419-426):
    customer→order edges weighted by o_totalprice, order→part by
    l_quantity; min total weight per (customer, part) pair. Two layers →
    the oracle is the closed-form min over (order, line) combinations,
    with identical double arithmetic on both engines."""
    from nebula_spark.operators.paths import weighted_shortest_paths
    t = load_tables(spark, sf, ("orders", "lineitem"))
    placed = t["orders"].select(
        _nk("c", F.col("o_custkey")).alias("_src"),
        _nk("o", F.col("o_orderkey")).alias("_dst"),
        F.lit(0).cast("long").alias("_rank"),
        F.col("o_totalprice").cast("double").alias("weight"))
    contains = t["lineitem"].select(
        _nk("o", F.col("l_orderkey")).alias("_src"),
        _nk("p", F.col("l_partkey")).alias("_dst"),
        F.col("l_linenumber").cast("long").alias("_rank"),
        F.col("l_quantity").cast("double").alias("weight"))
    seeds = t["orders"].filter(F.col("o_custkey") <= 5).select(
        _nk("c", F.col("o_custkey")).alias("_vid")).distinct()
    parts = t["lineitem"].select(
        _nk("p", F.col("l_partkey")).alias("_vid")).distinct()
    w = weighted_shortest_paths(placed.unionByName(contains), seeds,
                                weight_col="weight", targets=parts)
    return (w.select(_nk_str(F.col("_src")).alias("src_key"),
                     _nk_str(F.col("_dst")).alias("dst_key"),
                     F.round("dist", 6).alias("dist"))
            .orderBy("src_key", "dst_key"))


def q_k_core(spark: SparkSession, sf: str) -> DataFrame:
    """4-core of the order–part bipartite graph, fixed 6 peels — the
    deterministic SQL-unrollable form (operators/algo.py k_core): each
    peel drops vertices with degree < 4, the oracle unrolls the same 6
    rounds."""
    from nebula_spark.operators.algo import k_core
    t = load_tables(spark, sf, ("lineitem",))
    e = t["lineitem"].select(
        _nk("o", F.col("l_orderkey")).alias("_src"),
        _nk("p", F.col("l_partkey")).alias("_dst"))
    core = k_core(e, k=4, rounds=6)
    return (core.select(_nk_str(F.col("vid")).alias("vid_key"), "deg")
            .orderBy("vid_key"))


def q_label_prop(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic label propagation (3 synchronous supersteps, ties →
    smallest label) over the namespaced c→n→r graph; the oracle unrolls
    the identical most-frequent/min-label recurrence."""
    from nebula_spark.operators.algo import label_propagation
    t = load_tables(spark, sf, ("customer", "nation"))
    lp = label_propagation(_cnr_edges(t), iterations=3)
    return lp.select("vid", "label").orderBy("vid")


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing (pipeline/curate.py): documents as single chunks
    laid out into 512-token sequences within 8 md5 buckets — bucket id,
    sequence id and token offset are all md5/window-derived, so the
    oracle reproduces them exactly."""
    from nebula_spark.pipeline.curate import pack_sequences
    from nebula_spark.pipeline.text import token_count
    docs = load_tables(spark, sf, ("documents",))["documents"]
    chunks = docs.select(
        "doc_id", F.lit(0).alias("chunk_id"),
        token_count(F.col("text")).cast("long").alias("n_tokens"))
    out = pack_sequences(chunks, seq_len=512, buckets=8, seed=42)
    return (out.select("doc_id", "n_tokens", "pack_bucket", "seq_id",
                       "seq_pos")
            .orderBy("doc_id"))


def q_find_path_yield(spark: SparkSession, sf: str) -> DataFrame:
    """FIND SHORTEST PATH … YIELD path AS p through the nGQL front end —
    PATH values rendered to the reference's textual form (r5:
    parser.yy:2317-2345 full production). Sources are customer vids,
    targets {0..4} — region vids that ALSO collide with low nation vids
    (the fixture's shared long-vid universe), so per-(src, dst-vid)
    minima mix 1-hop nation hits with 2-hop region paths and the oracle
    must take the min over both."""
    from nebula_spark.functions.graphfns import format_path
    from nebula_spark.plans import execute
    sp = tpch_space(spark, sf)
    df = execute(sp, "FIND SHORTEST PATH FROM 1, 2, 3, 4, 5, 6, 7, 8 "
                     "TO 0, 1, 2, 3, 4 OVER located_in, member_of "
                     "UPTO 3 STEPS YIELD path as p")
    return df.select(format_path(F.col("p")).alias("p")).orderBy("p")


def q_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN top-10 (rows-only driver check: the k-means|| coarse
    quantizer isn't SQL-expressible — centroids come from Spark ML's
    distributed Lloyd iterations. Self-match recall and agreement with
    brute force are pinned in tests/test_pipeline.py instead)."""
    from nebula_spark.pipeline.similarity import ivf_topk
    embs = load_tables(spark, sf, ("embeddings",))["embeddings"]
    q = embs.filter(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    return (ivf_topk(embs, q, k=10, n_centroids=16, nprobe=4)
            .orderBy("qid", F.desc("cosine"), "cid"))


# Exactly 50 entries — the driver's correctness harness runs the first 50
# dict keys, so every operator family must land inside the cap. r1's 14
# uncovered queries (the whole LLM-pipeline family + pagerank/shortest-path/
# sessionize/assign) run first; near-duplicate relational entries were merged
# (semi_anti) or retired in favor of the sibling that exercises the same
# operator through a wider path (e.g. go_1to2 ⊃ go_2step, ngql_dml ⊃
# upsert/delete, short_orders ⊃ window_topk, bfs_targets ⊃ bfs_distances).
# The retired q_* functions stay importable for bench.py's stable set.
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- r1-uncovered: pipeline / algo / streaming / front-end ops ---------
    "pagerank": q_pagerank,
    "ngql_assign": q_ngql_assign,
    "shortest_path_fn": q_shortest_path_fn,
    "sessionize": q_sessionize,
    "multimodal_meta": q_multimodal_meta,
    # frame_sample retired from the 50-cap (multimodal plumbing stays
    # covered by multimodal_meta's oracle row + tests/test_pipeline.py) to
    # make room for the dedup-cluster assignment stage
    "dedup_clusters": q_dedup_clusters,
    "exact_dedup": q_exact_dedup,
    # minhash rotated out in r4 (its signature array is the direct input
    # of minhash_lsh_pairs' green row and stays property-tested) to make
    # room for the curation family
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    # simhash rotated out in r4 (its 64-agg-expr single pass stays
    # pytest-covered in tests/test_pipeline.py; the dedup family keeps
    # three green rows: exact_dedup, minhash_lsh_pairs, dedup_clusters)
    # to make room for the r3-added graph algorithms
    # ngram_jaccard rotated out in r5: contamination drives the identical
    # shingle inverted-index join (explode distinct n-grams → equi-join →
    # per-doc regroup) against a benchmark table — the pairwise-jaccard
    # variant stays covered by tests/test_pipeline.py + property tests
    "contamination": q_contamination,
    "ann_topk": q_ann_topk,
    "ann_lsh": q_ann_lsh,
    # near_dup_cosine rotated out in r5: its hyperplane-bucketed cosine
    # join is the same machinery ann_lsh's green row exercises
    # (similarity.hyperplane_bucket shared); stays in tests/test_pipeline.py
    # ivf_topk rotated out in r5 per the r4 verdict (its oracle-less row
    # read as err at the dashboard; recall + brute-force agreement stay
    # pinned in tests/test_pipeline.py) for the PATH-value statement form
    "find_path_yield": q_find_path_yield,
    # doc_chunks rotated out in r4 (chunk windows stay pytest-covered;
    # pack_sequences' new row consumes the same token-count machinery) to
    # make room for the packing stage itself
    "pack_sequences": q_pack_sequences,
    # -- relational / traversal / front-end core ---------------------------
    "scan_project": q_scan_project,
    "agg_group": q_agg_group,
    # agg_global and topn rotated out of the 50-slot cap in r3 (overlap:
    # agg_global ⊂ agg_funcs, topn ⊂ short_orders' ranking family; both
    # q_* functions remain for bench.py's stable headline set) to make
    # room for the last uncovered §2 families: per-hop step LIMIT
    # (truncate clause) and SHOW/DESCRIBE admin
    "step_limit": q_step_limit,
    "show_admin": q_show_admin,
    # join_agg rotated out in r6: its HashInnerJoin+agg machinery stays
    # on bench.py's headline set (q_join_agg) and agg coverage keeps
    # agg_group/agg_funcs/ngql_groupby_pipe green rows; the slot goes to
    # the r6 joined-YIELD statement form (yield/join.feature)
    "ngql_yield_join": q_ngql_yield_join,
    # semi_anti rotated out in r7 per the r6 verdict (slot rotation:
    # semi/anti stay pytest-covered; the slot now runs the DML
    # lifecycle script the 50-slot check never exercised)
    "dml_lifecycle": q_dml_lifecycle,
    "rollup_apply": q_rollup_apply,
    "setops": q_setops,
    "fetch_vertices": q_fetch_vertices,
    # fetch_edges rotated out in r4 per the r3 verdict (⊂ fetch_vertices
    # family: same FETCH PROP key-join machinery, composite (src,dst,rank)
    # key covered by tests/test_ngql.py) for the weighted-path slot
    "lookup": q_lookup,
    # sample_hash rotated out in r5: md5-bucket sampling is the shared
    # primitive that train_split's green row (stratified_sample +
    # split_assign + shuffle_key) and step_limit's per-hop SAMPLE already
    # check; the bare 5%-filter form keeps its pytest coverage
    # temperature_sample rotated out in r4 (per-group md5-rank keep-rates
    # stay pytest-covered; the md5-rank primitive keeps train_split's
    # green row) to make room for label propagation
    "weighted_paths": q_weighted_paths,
    "scalar_funcs": q_scalar_funcs,
    # json_extract (⊂ scalar family, dedicated pytest) and window_funcs
    # (window family keeps event_windows' oracle row) rotated out in r4
    "event_windows": q_event_windows,
    "paths_query": q_paths_query,
    "subgraph": q_subgraph,
    "go_1to2": q_go_1to2,
    "ngql_go_pipe": q_ngql_go_pipe,
    "ngql_groupby_pipe": q_ngql_groupby_pipe,
    "ngql_unwind": q_ngql_unwind,
    # geo_dwithin rotated out in r4 (§2.9 geo keeps geo_polygon's green
    # row; the haversine/cell-prefilter path stays in tests/test_geo.py)
    # to make room for k-core
    "geo_polygon": q_geo_polygon,
    "time_funcs": q_time_funcs,
    "fulltext": q_fulltext,
    # cross_join rotated out in r4 per the r3 verdict (CartesianProduct ⊂
    # the semi_anti/rollup_apply join family; stays in tests/test_operators)
    "k_core": q_k_core,
    "label_prop": q_label_prop,
    "both_shortest": q_both_shortest,
    "agg_funcs": q_agg_funcs,
    "ngql_optional_match": q_ngql_optional_match,
    "ngql_listops": q_ngql_listops,
    "ngql_match_2hop": q_ngql_match_2hop,
    "short_orders": q_short_orders,
    "bfs_targets": q_bfs_targets,
    "doc_stats": q_doc_stats,
    # lang_id rotated out in r4: its generated stopword-vote CASE now rides
    # inside doc_stats' row as lang_pred — same oracle expression, one slot
    "ngql_dml": q_ngql_dml,
    # -- r4 additions: curation family + graph analytics -------------------
    "doc_repetition": q_doc_repetition,
    "train_split": q_train_split,
    "pii_scrub": q_pii_scrub,
    "triangle_count": q_triangle_count,
}



def _pagerank_oracle(iters: int = 3, d: float = 0.85) -> str:
    """The pagerank() recurrence unrolled: r0 = 1.0, each level one
    contribution-join + group + (1-d) + d*sum, dangling nodes keep (1-d).

    Arithmetic mirrors the operator bit-for-bit: rank stays DOUBLE (DuckDB
    would otherwise run the whole recurrence in DECIMAL — its numeric
    literals are decimal), while the per-node contribution SUM is cast to
    DECIMAL(30,15) so it is exact and order-independent in both engines."""
    levels = []
    for k in range(1, iters + 1):
        levels.append(f"""r{k} AS (
          SELECT n.vid, CAST({1 - d!r} AS DOUBLE) + CAST({d!r} AS DOUBLE)
                 * COALESCE(CAST(s.s AS DOUBLE), CAST(0 AS DOUBLE)) AS rank
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS vid,
                   SUM(CAST(r.rank / dg.outdeg AS DECIMAL(30,15))) AS s
            FROM e JOIN r{k - 1} r ON r.vid = e.src
                   JOIN deg dg ON dg.src = e.src
            GROUP BY e.dst) s ON s.vid = n.vid)""")
    return f"""
        WITH e AS (
          SELECT c_custkey AS src, CAST(c_nationkey AS BIGINT) AS dst
          FROM customer
          UNION
          SELECT CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)
          FROM nation
        ),
        nodes AS (SELECT src AS vid FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
        r0 AS (SELECT vid, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
        {', '.join(levels)}
        SELECT vid, CAST(FLOOR(rank * 1000000.0 + 0.5) AS BIGINT) AS rank_e6
        FROM r{iters} ORDER BY vid
    """


ORACLES: dict[str, str] = {
    "scan_project": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-06-01'
    """,
    "agg_group": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order,
               MAX(l_quantity) AS max_qty,
               MIN(l_shipdate) AS min_ship
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "step_limit": """
        WITH l1 AS (
          SELECT c_nationkey AS nat, c_custkey AS person,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_custkey) AS rn
          FROM customer WHERE c_nationkey IN (0, 1, 2)),
        f AS (SELECT DISTINCT person FROM l1 WHERE rn <= 2),
        l2 AS (
          SELECT c.c_nationkey AS via, c.c_custkey AS person,
                 ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                                    ORDER BY c.c_custkey) AS rn
          FROM customer c JOIN f ON f.person = c.c_nationkey)
        SELECT via, person FROM l2 WHERE rn <= 3 ORDER BY via, person
    """,
    "show_admin": """
        SELECT * FROM (VALUES
          ('tag', 'customer', '', ''), ('tag', 'nation', '', ''),
          ('tag', 'order', '', ''), ('tag', 'part', '', ''),
          ('tag', 'region', '', ''), ('tag', 'supplier', '', ''),
          ('edge', 'contains', '', ''), ('edge', 'located_in', '', ''),
          ('edge', 'member_of', '', ''), ('edge', 'placed', '', ''),
          ('desc_nation', 'vid', 'int64', 'YES'),
          ('desc_nation', 'n_name', 'string', 'YES'),
          ('desc_nation', 'n_regionkey', 'int32', 'YES'),
          ('desc_contains', 'l_quantity', 'double', 'YES'),
          ('desc_contains', 'l_extendedprice', 'double', 'YES'),
          ('desc_contains', 'l_discount', 'double', 'YES'),
          ('desc_contains', 'l_shipdate', 'datetime', 'YES')
        ) AS t(kind, name, dtype, nullable)
        ORDER BY kind, name
    """,
    "ngql_yield_join": """
        SELECT a.cid AS cid, a.bal AS bal, b.okey AS okey, b.price AS price
        FROM (SELECT c_custkey AS cid, c_acctbal AS bal
              FROM customer WHERE c_nationkey = 3) a
        JOIN (SELECT o_custkey AS ckey, o_orderkey AS okey,
                     o_totalprice AS price
              FROM orders WHERE o_totalprice > 100000) b
          ON a.cid = b.ckey
    """,
    "dml_lifecycle": """
        WITH upd AS (
          SELECT c_custkey,
                 c_acctbal + CASE WHEN c_acctbal > 9000.0
                                  THEN 100.0 ELSE 0.0 END AS bal
          FROM customer),
        dead AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0.0),
        live AS (SELECT * FROM upd
                 WHERE c_custkey NOT IN (SELECT c_custkey FROM dead)),
        -- the audit rows the script INSERTs, re-derived (not pinned as
        -- literal epochs) so the expectation can't drift independently
        -- of the query: DuckDB's own epoch() on the same UTC timestamps
        -- the engine's timestamp("…") constructor parses
        audit AS (SELECT * FROM (VALUES
          (CAST(epoch(TIMESTAMP '2021-01-01 00:00:00') AS BIGINT)),
          (CAST(epoch(TIMESTAMP '2021-06-01 12:30:00') AS BIGINT))
        ) a(at))
        SELECT
          (SELECT COUNT(*) FROM live) AS n_member,
          (SELECT CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE)
             FROM live) AS total_bal,
          (SELECT COUNT(*) FROM customer
            WHERE c_custkey % 3 = 0 AND c_acctbal >= 500.0) AS n_profile,
          (SELECT COUNT(*) FROM audit) AS n_audit,
          (SELECT MIN(at) FROM audit) AS first_at,
          (SELECT COUNT(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM dead)
              AND o_orderkey NOT IN (SELECT c_custkey FROM dead)) AS n_edges
    """,
    "rollup_apply": """
        SELECT c_custkey,
               COALESCE(array_to_string(list_sort(list(o_orderpriority)), ','), '') AS prios
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    """,
    "setops": """
        WITH c AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nk FROM customer),
             s AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nk FROM supplier)
        SELECT nk, 'union' AS op FROM (SELECT nk FROM c UNION SELECT nk FROM s)
        UNION ALL
        SELECT nk, 'intersect' AS op FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
        UNION ALL
        SELECT nk, 'minus' AS op FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
    """,
    "fetch_vertices": """
        SELECT c_custkey AS _vid, c_custkey AS customer_vid,
               c_name AS customer_c_name,
               c_nationkey AS customer_c_nationkey,
               c_acctbal AS customer_c_acctbal,
               c_mktsegment AS customer_c_mktsegment
        FROM customer WHERE c_custkey % 100 = 1
    """,
    "fetch_edges": """
        SELECT l_orderkey AS src, l_partkey AS dst,
               CAST(l_linenumber AS BIGINT) AS rank, l_quantity, l_extendedprice
        FROM lineitem WHERE l_orderkey % 50 = 0 AND l_linenumber <= 2
    """,
    "lookup": """
        SELECT p_partkey, p_name, p_size, p_type FROM part
        WHERE p_size >= 40 AND p_type LIKE 'STANDARD%'
    """,
    "sample_hash": """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT
              % 20 = 0
    """,
    "scalar_funcs": """
        SELECT p_partkey,
               ABS(p_retailprice * -1) AS f_abs,
               CAST(FLOOR(p_retailprice) AS BIGINT) AS f_floor,
               CAST(CEIL(p_retailprice) AS BIGINT) AS f_ceil,
               ROUND(SQRT(CAST(p_size AS DOUBLE)), 10) AS f_sqrt,
               ROUND(POW(CAST(p_size AS DOUBLE), 2.0), 6) AS f_pow,
               CAST(SIGN(CAST(p_size AS DOUBLE) - 25) AS DOUBLE) AS f_sign,
               LOWER(p_name) AS f_lower, UPPER(p_brand) AS f_upper,
               LENGTH(p_name) AS f_len,
               SUBSTR(p_type, 1, 5) AS f_substr,
               REVERSE(p_brand) AS f_rev,
               LPAD(p_brand, 12, '*') AS f_lpad,
               CONCAT_WS('|', p_brand, p_type) AS f_concat,
               len(string_split(p_type, ' ')) AS f_nwords,
               MD5(p_name) AS f_md5,
               COALESCE(NULL, p_brand) AS f_coalesce,
               CAST(TRUNC(p_retailprice) AS BIGINT) AS f_toint
        FROM part WHERE p_partkey <= 500
    """,
    "json_extract": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events WHERE event_id < 2000
    """,
    "window_funcs": """
        SELECT user_id, event_id,
               LAG(event_id) OVER w AS prev_event,
               COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS running_n
        FROM events WHERE user_id < 30
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "event_windows": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY day, event_type
    """,
    "paths_query": """
        WITH RECURSIVE edges AS (
          SELECT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst
          FROM customer
          UNION ALL
          SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
        ), paths(start_vid, end_vid, hops, path_str) AS (
          SELECT src, dst, 1, src || '>' || dst
          FROM edges WHERE src IN
            (SELECT 'c:' || c_custkey FROM customer WHERE c_custkey <= 10)
          UNION ALL
          SELECT p.start_vid, e.dst, p.hops + 1,
                 p.path_str || '|' || e.src || '>' || e.dst
          FROM paths p JOIN edges e ON p.end_vid = e.src WHERE p.hops < 2
        )
        SELECT start_vid, end_vid, hops, path_str FROM paths
        WHERE end_vid LIKE 'r:%'
    """,
    "subgraph": """
        WITH seeds(v) AS (
          SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10),
                 (11),(12),(13),(14),(15),(16),(17),(18),(19),(20))),
        s1 AS (
          SELECT o_custkey AS src, o_orderkey AS dst FROM orders
          WHERE o_custkey IN (SELECT v FROM seeds)
            AND o_totalprice > 30000.0 AND o_orderpriority LIKE '1%'),
        visited(v) AS (SELECT v FROM seeds UNION SELECT dst FROM s1),
        frontier(v) AS (SELECT dst FROM s1 EXCEPT SELECT v FROM seeds),
        closing AS (
          SELECT o_custkey AS src, o_orderkey AS dst FROM orders
          WHERE o_custkey IN (SELECT v FROM frontier)
            AND o_totalprice > 30000.0 AND o_orderpriority LIKE '1%'
            AND o_orderkey IN (SELECT v FROM visited))
        SELECT DISTINCT src, dst FROM
          (SELECT src, dst FROM s1 UNION ALL SELECT src, dst FROM closing)
    """,
    "go_1to2": """
        SELECT 'c:' || o_custkey AS src, 'o:' || o_orderkey AS dst,
               CAST(0 AS BIGINT) AS rank, 1 AS step
        FROM orders WHERE o_custkey % 20 = 0
          AND o_custkey IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'o:' || l_orderkey, 'p:' || l_partkey,
               CAST(l_linenumber AS BIGINT), 2
        FROM lineitem WHERE l_orderkey IN (
          SELECT o_orderkey FROM orders WHERE o_custkey % 20 = 0
            AND o_custkey IN (SELECT c_custkey FROM customer))
    """,
    "ngql_go_pipe": """
        SELECT o_custkey AS c_key, o_orderkey AS o_key, o_totalprice
        FROM orders WHERE o_custkey % 10 = 0 AND o_totalprice > 50000
          AND o_custkey IN (SELECT c_custkey FROM customer)
    """,
    "ngql_groupby_pipe": """
        SELECT o_custkey AS c_key, COUNT(*) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 7)
        GROUP BY o_custkey
    """,
    "ngql_unwind": """
        SELECT r_regionkey AS rk, q FROM region
        CROSS JOIN (SELECT 1 AS q UNION ALL SELECT 2 UNION ALL SELECT 3) t
    """,
    "geo_dwithin": """
        WITH pts AS (
          SELECT c_custkey AS key,
                 (c_custkey * 7 % 3600) / 10.0 - 180.0 AS lng,
                 (c_custkey * 11 % 1700) / 10.0 - 85.0 AS lat
          FROM customer
        ), d AS (
          SELECT key, 2 * 6371010.0 * ASIN(SQRT(
            POWER(SIN(RADIANS(20.0 - lat) / 2), 2)
            + COS(RADIANS(lat)) * COS(RADIANS(20.0))
              * POWER(SIN(RADIANS(10.0 - lng) / 2), 2))) AS dist
          FROM pts
        )
        SELECT key, CAST(ROUND(dist) AS BIGINT) AS dist_m
        FROM d WHERE dist <= 3000000.0 ORDER BY key
    """,
    "geo_polygon": """
        WITH pts AS (
          SELECT s_suppkey AS key,
                 (s_suppkey * 131 % 3600) / 10.0 - 180.0 AS x,
                 (s_suppkey * 173 % 1700) / 10.0 - 85.0 AS y
          FROM supplier
        )
        SELECT key,
               (x BETWEEN -50 AND 50 AND y BETWEEN -30 AND 30) AS covered,
               (x BETWEEN -50 AND 50 AND y BETWEEN -30 AND 30
                AND NOT (x > -10 AND x < 10 AND y > -10 AND y < 10))
                 AS covered_holed,
               (x BETWEEN -50 AND 50 AND y + 3 >= -30 AND y - 3 <= 30)
                 AS seg_x,
               (x + 1 >= -50 AND x - 1 <= 50 AND y + 1 >= -30 AND y - 1 <= 30)
                 AS sq_x
        FROM pts ORDER BY key
    """,
    "short_orders": """
        WITH ranked AS (
          SELECT o_custkey AS c_key, o_orderkey AS o_key,
                 CAST(o_orderdate AS VARCHAR) AS odate,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders
          WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal < -900)
        )
        SELECT c_key, o_key, odate, rn FROM ranked WHERE rn <= 3
        ORDER BY c_key, rn
    """,
    "ngql_match_2hop": """
        SELECT p_brand AS brand, COUNT(*) AS n
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN part ON p_partkey = l_partkey
        WHERE c_nationkey = 11 AND p_size > 40
        GROUP BY p_brand ORDER BY brand
    """,
    "ngql_listops": """
        SELECT o_orderkey AS key,
               CAST(6 * o_orderkey AS BIGINT) AS s,
               2 AS n_even,
               20 AS second,
               (3 < o_orderkey) AS p_all,
               (o_orderkey IN (200, 400, 600)) AS p_any,
               (3 <= o_orderkey) AS p_none,
               (o_orderkey IN (200, 400, 600)) AS p_single
        FROM orders WHERE o_orderkey % 200 = 0
    """,
    "ngql_optional_match": """
        SELECT c_custkey AS key, COUNT(o_orderkey) AS n
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        WHERE c_nationkey = 5
        GROUP BY c_custkey ORDER BY key
    """,
    "cross_join": """
        SELECT r_regionkey AS rk, r_name, n_nationkey AS nk,
               (n_regionkey = r_regionkey) AS is_home
        FROM region CROSS JOIN nation ORDER BY rk, nk
    """,
    "agg_funcs": """
        SELECT l_returnflag,
               ROUND(stddev_pop(CAST(l_quantity AS BIGINT)), 6) AS std_qty,
               bit_and(CAST(l_quantity AS BIGINT)) AS band,
               bit_or(CAST(l_quantity AS BIGINT)) AS bor,
               bit_xor(CAST(l_quantity AS BIGINT)) AS bxor,
               string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus)
                 AS statuses
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "time_funcs": """
        WITH t AS (
          SELECT *, (o_orderkey % 24) * 3600 + (o_orderkey % 60) * 60
                    + (o_orderkey % 60) + 7270 AS tsec
          FROM orders WHERE o_orderkey % 50 = 0)
        SELECT o_orderkey AS key,
               date_part('year', o_orderdate)::BIGINT AS y,
               date_part('quarter', o_orderdate)::BIGINT AS q,
               date_part('week', o_orderdate)::BIGINT AS wk,
               datediff('day', o_orderdate, DATE '1998-12-31')::BIGINT
                 AS age_days,
               CAST(CAST(o_orderdate + INTERVAL 3 MONTH + INTERVAL 10 DAY
                    AS DATE) AS VARCHAR) AS due,
               CAST(CAST(o_orderdate - INTERVAL 3 MONTH - INTERVAL 10 DAY
                    AS DATE) AS VARCHAR) AS since,
               CAST(o_orderkey % 24 AS INT) AS t_hour,
               CAST((tsec % 86400) // 3600 AS INT) AS tp_hour,
               CAST((tsec % 3600) // 60 AS INT) AS tp_min,
               CAST(tsec % 60 AS BIGINT) AS tp_sec
        FROM t ORDER BY key
    """,
    "fulltext": r"""
        WITH tf AS (
          SELECT doc_id, text,
                 len(regexp_extract_all(text, '\bmerge\b')) AS tf,
                 len(string_split_regex(text, '\s+')) AS dl
          FROM documents),
        stats AS (
          SELECT COUNT(*) AS n, AVG(dl) AS avgdl,
                 SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS df
          FROM tf)
        SELECT doc_id, len(regexp_extract_all(text, 'merge'))::BIGINT
                 AS score,
               ROUND(ln(1.0 + (n - df + 0.5) / (df + 0.5))
                     * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)),
                     6) AS bm25
        FROM tf CROSS JOIN stats
        WHERE regexp_matches(text, '^.*merge.*batch.*$')
          AND (contains(text, 'vektor') OR EXISTS (
                SELECT 1 FROM unnest(string_split_regex(text, '\s+')) t(w)
                WHERE levenshtein(w, 'vektor') <= 1))
        ORDER BY doc_id
    """,
    "find_path_yield": """
        WITH RECURSIVE edges AS (
          SELECT c_custkey AS src, CAST(c_nationkey AS BIGINT) AS dst,
                 'located_in' AS et FROM customer
          UNION ALL
          SELECT CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT),
                 'member_of' FROM nation
        ), walk(root, vid, hops, pstr) AS (
          SELECT src, src, 0, '<("' || CAST(src AS VARCHAR) || '")'
          FROM (SELECT DISTINCT c_custkey AS src FROM customer
                WHERE c_custkey BETWEEN 1 AND 8) s
          UNION ALL
          SELECT w.root, e.dst, w.hops + 1,
                 w.pstr || '-[:' || e.et || ']->("'
                        || CAST(e.dst AS VARCHAR) || '")'
          FROM walk w JOIN edges e ON w.vid = e.src WHERE w.hops < 3
        ), hits AS (
          SELECT root, vid, hops, pstr || '>' AS p FROM walk
          WHERE hops >= 1 AND vid IN (0, 1, 2, 3, 4)
        ), mins AS (
          SELECT root, vid, MIN(hops) AS mh FROM hits GROUP BY root, vid
        )
        SELECT h.p
        FROM hits h JOIN mins m
          ON h.root = m.root AND h.vid = m.vid AND h.hops = m.mh
        ORDER BY p
    """,
    "bfs_targets": """
        WITH RECURSIVE edges AS (
          SELECT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst
          FROM customer
          UNION ALL
          SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
        ), seeds AS (
          SELECT 'c:' || c_custkey AS vid FROM customer WHERE c_custkey <= 20
        ), bfs(root, vid, dist) AS (
          SELECT vid, vid, 0 FROM seeds
          UNION
          SELECT b.root, e.dst, b.dist + 1
          FROM bfs b JOIN edges e ON b.vid = e.src WHERE b.dist < 3
        )
        SELECT root AS src, vid AS dst, CAST(MIN(dist) AS INTEGER) AS dist
        FROM bfs WHERE dist > 0 AND vid LIKE 'r:%' GROUP BY root, vid
    """,
    "doc_stats": None,  # filled below (static stats + generated lang vote)
    "lang_id": None,  # filled below (generated from the stopword inventory)
    "ngql_dml": """
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM (
          SELECT CASE WHEN c_custkey = 4 THEN c_acctbal + 100.0
                 ELSE c_acctbal END AS bal
          FROM customer WHERE c_custkey NOT IN (1, 2, 3)
          UNION ALL SELECT 42.0)
    """,
    "pagerank": _pagerank_oracle(),
    "ngql_assign": """
        SELECT DISTINCT n_regionkey AS r
        FROM customer JOIN nation ON n_nationkey = c_nationkey
        WHERE c_custkey IN (1, 2, 3) ORDER BY r
    """,
    "shortest_path_fn": """
        WITH starts(v) AS (SELECT s_suppkey FROM supplier),
        out1 AS (
          SELECT v, c_nationkey AS w FROM starts JOIN customer ON c_custkey = v
          UNION SELECT v, n_regionkey FROM starts JOIN nation ON n_nationkey = v
        ),
        out2 AS (
          SELECT o.v, c_nationkey AS w FROM out1 o JOIN customer ON c_custkey = o.w
          UNION SELECT o.v, n_regionkey FROM out1 o JOIN nation ON n_nationkey = o.w
        ),
        paths AS (SELECT v, w, 1 AS hops FROM out1
                  UNION ALL SELECT v, w, 2 FROM out2)
        SELECT v AS s_key, w AS end_vid, MIN(hops) AS hops
        FROM paths GROUP BY v, w ORDER BY s_key, end_vid
    """,
    "sessionize": """
        WITH d AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL 6 HOUR
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS brk
          FROM events),
        g AS (SELECT user_id, ts,
                     SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM d)
        SELECT user_id, MIN(ts) AS session_start,
               COUNT(*) AS n_events, MAX(ts) AS last_ts
        FROM g GROUP BY user_id, sid
        ORDER BY user_id, session_start
    """,
    "multimodal_meta": f"""
        WITH h AS (SELECT doc_id, md5(text) AS m
                   FROM documents WHERE doc_id < 300)
        SELECT doc_id, 64 + {_MD5_BYTE.format(i=1)} AS width,
               64 + {_MD5_BYTE.format(i=2)} AS height,
               3 AS channels, 'fake/rgb' AS format,
               {_MD5_BYTE.format(i=1)} AS feat0_byte
        FROM h ORDER BY doc_id
    """,
    "dedup_clusters": None,  # filled below (needs the LSH pair CTE)
    "exact_dedup": f"""
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_count
        FROM documents GROUP BY md5({_NORM_SQL})
    """,
    "minhash": _minhash_oracle(),
    "minhash_lsh_pairs": None,  # filled below (needs the sig CTE)
    "simhash": _simhash_oracle(),
    "ngram_jaccard": _jaccard_oracle(),
    "ann_topk": f"""
        SELECT * FROM (
          SELECT a.vec_id AS qid, b.vec_id AS cid, {_COS_SQL} AS cosine,
                 CAST(ROW_NUMBER() OVER (PARTITION BY a.vec_id
                      ORDER BY {_COS_SQL} DESC, b.vec_id) AS INT) AS rank
          FROM embeddings a JOIN embeddings b ON a.vec_id <= 4)
        WHERE rank <= 10
    """,
    "near_dup_cosine": f"""
        SELECT * FROM (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_SQL} AS cosine
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        WHERE cosine >= 0.45
    """,
}


def _lsh_pairs_oracle() -> str:
    from nebula_spark.pipeline.dedup import MINHASH_P, _perm_params
    base = f"({_MD5_64_SQL.format(x='s')} % {MINHASH_P})"
    mins = ", ".join(
        f"list_min(list_transform(sh, s -> ({a} * {base} + {b}) % {MINHASH_P}))"
        for a, b in _perm_params(8))
    bands = " OR ".join(
        f"(a.sig[{i * 2 + 1}] = b.sig[{i * 2 + 1}] AND "
        f"a.sig[{i * 2 + 2}] = b.sig[{i * 2 + 2}])" for i in range(4))
    return f"""
        WITH sigs AS (
          SELECT doc_id, [{mins}] AS sig
          FROM (SELECT doc_id, {_shingle_sql(3)} AS sh
                FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(len(list_filter(range(1, 9),
                         i -> a.sig[i] = b.sig[i])) / 8.0, 6) AS est_jaccard
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id AND ({bands})
    """


ORACLES["minhash_lsh_pairs"] = _lsh_pairs_oracle()


def _dedup_clusters_oracle() -> str:
    """Connected components over the LSH pair list: recursive transitive
    closure (fine at oracle scale), cluster id = min reachable node."""
    return f"""
        WITH RECURSIVE pairs AS ({_lsh_pairs_oracle()}),
        edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(a, b) AS (
            SELECT a, b FROM edges
            UNION SELECT a, a FROM edges
            UNION SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS doc_id, MIN(b) AS cluster_id
        FROM reach GROUP BY a ORDER BY doc_id
    """


ORACLES["dedup_clusters"] = _dedup_clusters_oracle()


def _lang_vote_sql() -> tuple[str, str]:
    """Replicates pipeline.text.language_id verbatim: stopword-vote with
    dict-order tie-break (en > de > fr > es), 'und' when no hits.
    Returns (per-language hit column exprs, the CASE over those columns)."""
    from nebula_spark.pipeline.text import _LANG_STOPWORDS
    hits = ", ".join(
        "len(list_filter(regexp_split_to_array(lower(text), '[^a-zà-ÿ]+'), "
        f"t -> list_contains({words!r}, t))) AS {lang}"
        for lang, words in _LANG_STOPWORDS.items())
    langs = list(_LANG_STOPWORDS)  # vote priority = dict order
    case = " ".join(
        f"WHEN {langs[i]} >= GREATEST({', '.join(langs[i + 1:])}) "
        f"THEN '{langs[i]}'" for i in range(len(langs) - 1))
    case = (f"CASE WHEN GREATEST({', '.join(langs)}) < 1 THEN 'und' "
            f"{case} ELSE '{langs[-1]}' END")
    return hits, case


def _lang_id_oracle() -> str:
    hits, case = _lang_vote_sql()
    return f"""
        WITH s AS (SELECT {hits} FROM documents)
        SELECT lang_pred, COUNT(*) AS n FROM (
          SELECT {case} AS lang_pred FROM s)
        GROUP BY lang_pred ORDER BY lang_pred
    """


ORACLES["lang_id"] = _lang_id_oracle()


def _doc_stats_oracle() -> str:
    """The static doc_stats SQL plus the generated lang_pred vote column
    (same expressions as the retired lang_id row)."""
    hits, case = _lang_vote_sql()
    return f"""
        WITH s AS (SELECT doc_id, text, {hits} FROM documents)
        SELECT doc_id, LENGTH(text) AS n_chars_calc,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               ROUND(
                 0.4 * (CASE WHEN LENGTH(text) BETWEEN 100 AND 20000 THEN 1.0
                        WHEN LENGTH(text) < 100 THEN LENGTH(text) / 100.0
                        ELSE 20000.0 / LENGTH(text) END)
               + 0.3 * (LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                        / GREATEST(LENGTH(text), 1))
               + 0.15 * (CASE WHEN LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                         / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1)
                         <= 0.3 THEN 1.0 ELSE 0.5 END)
               + 0.15 * (CASE WHEN LENGTH(text)
                         / GREATEST(len(regexp_split_to_array(trim(text), '\\s+')), 1)
                         BETWEEN 3 AND 12 THEN 1.0 ELSE 0.5 END), 6) AS quality,
               {case} AS lang_pred,
               {_MD5_64_SQL.format(x=_NORM_SQL)} AS fp64
        FROM s
    """


ORACLES["doc_stats"] = _doc_stats_oracle()


def _ann_lsh_oracle(n_planes: int = 6, dim: int = 64,
                    salt: str = "ivf") -> str:
    """Replicates pipeline.similarity.hyperplane_bucket: the ±1 plane
    components are md5-derived constants, so they are precomputed here and
    embedded as literals — the oracle checks the *bucketing* and the
    bucket-local top-k, not just row counts."""
    import hashlib

    def sgn(p: int, i: int) -> float:
        h = int(hashlib.md5(f"{salt}:{p}:{i}".encode()).hexdigest()[:15], 16)
        return 1.0 if h % 2 == 0 else -1.0

    bits = " || ".join(
        "(CASE WHEN list_dot_product(cv, ["
        + ", ".join(str(sgn(p, i)) for i in range(dim))
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for p in range(n_planes))
    return f"""
        WITH c AS (
          SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
        cb AS (SELECT cid, cv, {bits} AS bkt FROM c),
        q AS (SELECT cid AS qid, cv AS qv, bkt FROM cb WHERE cid <= 4),
        scored AS (
          SELECT q.qid, cb.cid,
                 ROUND(list_cosine_similarity(cb.cv, q.qv), 6) AS cosine
          FROM cb JOIN q USING (bkt))
        SELECT qid, cid, cosine, rank FROM (
          SELECT qid, cid, cosine,
                 CAST(ROW_NUMBER() OVER (PARTITION BY qid
                      ORDER BY cosine DESC, cid) AS INT) AS rank
          FROM scored)
        WHERE rank <= 10
    """


ORACLES["ann_lsh"] = _ann_lsh_oracle()

# -- r4 curation + graph-analytics oracles ----------------------------------

ORACLES["doc_repetition"] = """
    WITH w AS (SELECT doc_id,
                      regexp_split_to_array(trim(text), '\\s+') AS W
               FROM documents),
    g AS (SELECT doc_id, W, len(W) AS nw,
                 list_transform(range(1, len(W)),
                                i -> W[i] || ' ' || W[i + 1]) AS B,
                 list_transform(range(1, len(W) - 1),
                                i -> W[i] || ' ' || W[i + 1] || ' '
                                     || W[i + 2]) AS T
          FROM w)
    SELECT doc_id, nw AS n_words,
           ROUND(1.0 - len(list_distinct(W)) / nw, 6) AS dup_word_frac,
           CASE WHEN len(B) > 0 THEN
             ROUND(list_max(list_transform(list_distinct(B),
                     g2 -> len(list_filter(B, x -> x = g2)))) / len(B), 6)
           ELSE 0.0 END AS top_bigram_frac,
           CASE WHEN len(T) > 0 THEN
             ROUND((len(T) - len(list_distinct(T))) / len(T), 6)
           ELSE 0.0 END AS dup_trigram_frac
    FROM g
"""

ORACLES["both_shortest"] = """
    WITH cc AS (SELECT c_custkey AS k, CAST(c_nationkey AS BIGINT) AS n
                FROM customer WHERE c_custkey <= 10),
         nn AS (SELECT CAST(n_nationkey AS BIGINT) AS n,
                       CAST(n_regionkey AS BIGINT) AS r FROM nation)
    SELECT * FROM (
      -- customer↔customer: 2 via the shared nation, else 4 via the region
      SELECT 'c:' || CAST(a.k AS VARCHAR) AS src_key,
             'c:' || CAST(b.k AS VARCHAR) AS dst_key,
             CASE WHEN a.n = b.n THEN 2 ELSE 4 END AS hops
      FROM cc a JOIN cc b ON a.k <> b.k
      JOIN nn na ON na.n = a.n JOIN nn nb ON nb.n = b.n
      WHERE a.n = b.n OR na.r = nb.r
      UNION ALL
      -- customer↔nation: 1 to its own nation, 3 to a same-region nation
      SELECT 'c:' || CAST(a.k AS VARCHAR),
             'n:' || CAST(m.n AS VARCHAR),
             CASE WHEN m.n = a.n THEN 1 ELSE 3 END
      FROM cc a JOIN nn na ON na.n = a.n
      JOIN nn m ON m.n = a.n OR m.r = na.r
    ) t ORDER BY src_key, dst_key
"""

ORACLES["weighted_paths"] = """
    SELECT 'c:' || CAST(o_custkey AS VARCHAR) AS src_key,
           'p:' || CAST(l_partkey AS VARCHAR) AS dst_key,
           ROUND(MIN(CAST(o_totalprice AS DOUBLE)
                     + CAST(l_quantity AS DOUBLE)), 6) AS dist
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_custkey <= 5
    GROUP BY 1, 2 ORDER BY src_key, dst_key
"""


def _k_core_oracle(k: int = 4, rounds: int = 6) -> str:
    """k_core with fixed ``rounds`` unrolled: each round keeps vertices
    whose symmetric degree is >= k, then both-endpoint-filters the edge
    set — exactly the operator's peel (operators/algo.py k_core)."""
    rs = []
    for i in range(1, rounds + 1):
        rs.append(f"""k{i} AS (
          SELECT u FROM s{i - 1} GROUP BY u HAVING COUNT(*) >= {k}),
        s{i} AS (
          SELECT s.u, s.v FROM s{i - 1} s
          JOIN k{i} a ON a.u = s.u JOIN k{i} b ON b.u = s.v)""")
    return f"""
        WITH e0 AS (
          SELECT DISTINCT 'o:' || CAST(l_orderkey AS VARCHAR) AS u,
                          'p:' || CAST(l_partkey AS VARCHAR) AS v
          FROM lineitem),
        s0 AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
        {",".join(rs)}
        SELECT u AS vid_key, COUNT(*) AS deg FROM s{rounds}
        GROUP BY u HAVING COUNT(*) >= {k} ORDER BY vid_key
    """


ORACLES["k_core"] = _k_core_oracle()


def _label_prop_oracle(iters: int = 3) -> str:
    """Deterministic LPA unrolled: per superstep each vertex takes its
    neighbors' most frequent label, min label on ties — the identical
    recurrence to operators/algo.py label_propagation, on the namespaced
    long vids (string keys would change MIN's ordering)."""
    off = 1 << 44
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(f"""l{i} AS (
          SELECT vid, MIN(label) AS label FROM (
            SELECT c.vid, c.label, c.n,
                   MAX(c.n) OVER (PARTITION BY c.vid) AS nmax
            FROM (SELECT s.u AS vid, l.label, COUNT(*) AS n
                  FROM sym s JOIN l{i - 1} l ON l.vid = s.v
                  GROUP BY s.u, l.label) c) t
          WHERE n = nmax GROUP BY vid)""")
    return f"""
        WITH und AS (
          SELECT DISTINCT {1 * off} + c_custkey AS u,
                 {2 * off} + CAST(c_nationkey AS BIGINT) AS v FROM customer
          UNION
          SELECT {2 * off} + CAST(n_nationkey AS BIGINT),
                 {5 * off} + CAST(n_regionkey AS BIGINT) FROM nation),
        sym AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v
                FROM und),
        l0 AS (SELECT DISTINCT u AS vid, u AS label FROM sym),
        {",".join(rounds)}
        SELECT vid, label FROM l{iters} ORDER BY vid
    """


ORACLES["label_prop"] = _label_prop_oracle()

ORACLES["pack_sequences"] = """
    WITH c AS (
      SELECT doc_id, 0 AS chunk_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
               AS n_tokens,
             ('0x' || substr(md5('pack:42:' || CAST(doc_id AS VARCHAR)),
                             1, 8))::BIGINT % 8 AS pack_bucket,
             md5('42:' || CAST(doc_id AS VARCHAR)) AS rk
      FROM documents),
    s AS (
      SELECT doc_id, n_tokens, pack_bucket,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY pack_bucket ORDER BY rk, doc_id, chunk_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               - n_tokens AS strt
      FROM c)
    SELECT doc_id, n_tokens, pack_bucket,
           pack_bucket * 1000000000 + strt // 512 AS seq_id,
           strt % 512 AS seq_pos
    FROM s ORDER BY doc_id
"""

ORACLES["train_split"] = """
    WITH s AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents),
    k AS (SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'),
                                 1, 8))::BIGINT % 1000 AS b
          FROM s WHERE rk <= 25)
    SELECT doc_id,
           CASE WHEN b < 900 THEN 'train'
                WHEN b < 950 THEN 'val' ELSE 'test' END AS split,
           ('0x' || substr(md5('shuf:42:' || CAST(doc_id AS VARCHAR)),
                           1, 15))::BIGINT AS shuffle_key
    FROM k
"""

_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\b\\d{3}[-.]\\d{3,4}\\b"
_PII_IPV4 = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
_PII_URL = "https?://[^\\s]+"

ORACLES["pii_scrub"] = f"""
    WITH t AS (
      SELECT doc_id,
             text || ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  || ' http://ex.org/d/' || CAST(doc_id AS VARCHAR)
                  || ' 10.0.' || CAST(doc_id % 100 AS VARCHAR) || '.'
                  || CAST(doc_id % 50 AS VARCHAR)
                  || ' 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             AS text
      FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
           len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
           len(regexp_extract_all(text, '{_PII_IPV4}')) AS n_ipv4,
           len(regexp_extract_all(text, '{_PII_URL}')) AS n_url,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_URL}', '<URL>', 'g'),
             '{_PII_IPV4}', '<IP>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed
    FROM t
"""

ORACLES["contamination"] = """
    WITH g AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(W) - 3),
                 i -> array_to_string(W[i:i+4], ' '))) AS G
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS W
            FROM documents)),
    bg AS (SELECT DISTINCT unnest(G) AS gram FROM g WHERE doc_id % 97 = 0),
    probe AS (
      SELECT doc_id, len(G) AS n_ngrams,
             unnest(CASE WHEN len(G) = 0 THEN [NULL::VARCHAR] ELSE G END)
               AS gram
      FROM g WHERE doc_id % 97 <> 0)
    SELECT p.doc_id, MAX(p.n_ngrams) AS n_ngrams,
           CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           ROUND(CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / GREATEST(MAX(p.n_ngrams), 1), 6)
             AS contamination_frac
    FROM probe p LEFT JOIN bg b ON p.gram = b.gram
    GROUP BY p.doc_id
"""

ORACLES["doc_chunks"] = """
    WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS W
               FROM documents),
    s AS (SELECT doc_id, W,
                 unnest(range(1, GREATEST(len(W), 1) + 1, 48)) AS start
          FROM w)
    SELECT doc_id, CAST((start - 1) // 48 AS INT) AS chunk_id, start,
           len(W[start:start+63]) AS n_tokens,
           array_to_string(W[start:start+63], ' ') AS chunk_text
    FROM s
    WHERE start = 1 OR len(W) >= start + 16
"""

ORACLES["temperature_sample"] = """
    WITH c AS (SELECT lang, COUNT(*) AS n_g FROM documents GROUP BY lang),
    t AS (SELECT SUM(n_g) AS n_total, SUM(pow(n_g, 0.5)) AS z FROM c),
    r AS (SELECT lang,
                 LEAST(CAST(1.0 AS DOUBLE),
                       ROUND(0.5 * n_total * pow(n_g, 0.5) / (z * n_g), 9))
                   AS rate
          FROM c, t)
    SELECT d.doc_id, d.lang, r.rate
    FROM documents d JOIN r USING (lang)
    WHERE ('0x' || substr(md5('temp:42:' || CAST(d.doc_id AS VARCHAR)),
                          1, 8))::BIGINT
          < CAST(floor(rate * 4294967296.0) AS BIGINT)
"""

# oriented u<v<w form — total is orientation-invariant, so it matches the
# operator's degree-oriented count exactly
ORACLES["triangle_count"] = """
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    deg AS (
      SELECT vid, COUNT(*) AS d FROM (
        SELECT u AS vid FROM pairs
        UNION ALL SELECT v AS vid FROM pairs) GROUP BY vid),
    tri AS (
      SELECT COUNT(*) AS t
      FROM pairs e1 JOIN pairs e2 ON e2.u = e1.v
           JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v)
    SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
           (SELECT COUNT(*) FROM pairs) AS n_edges,
           (SELECT t FROM tri) AS n_triangles,
           ROUND(3.0 * (SELECT t FROM tri)
                 / (SELECT SUM(d * (d - 1) / 2) FROM deg), 6)
           AS global_clustering
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-hop GO + join + aggregate on sf0.001."""
    return q_join_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
