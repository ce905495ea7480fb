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
    start = sp.tag("customer").filter(F.col("vid") % 10 == 0).select("vid")
    hop = go(sp.edge("placed"), start, 1, 1,
             edge_filter=F.col("o_totalprice") > 50000)
    return hop.select(F.col("src").alias("c_key"), F.col("dst").alias("o_key"),
                      "o_totalprice")


def q_go_2step(spark: SparkSession, sf: str) -> DataFrame:
    """GO 2 STEPS: customer→order→part over a namespaced-vid edge union
    (vids live in one space, so heterogeneous keys get a tag prefix)."""
    sp = tpch_space(spark, sf)
    start = sp.tag("customer").filter(F.col("vid") % 10 == 0).select(
        F.concat(F.lit("c:"), F.col("vid")).alias("vid"))
    placed = sp.edge("placed").select(
        F.concat(F.lit("c:"), F.col("src")).alias("src"),
        F.concat(F.lit("o:"), F.col("dst")).alias("dst"), "rank")
    contains = sp.edge("contains").select(
        F.concat(F.lit("o:"), F.col("src")).alias("src"),
        F.concat(F.lit("p:"), F.col("dst")).alias("dst"), "rank")
    hop = go(placed.unionByName(contains), start, 2, 2)
    return dedup(hop.select(F.col("src").alias("o_key"),
                            F.col("dst").alias("p_key"), "rank"))


def q_bfs_distances(spark: SparkSession, sf: str) -> DataFrame:
    """FIND SHORTEST PATH (distance form) on the namespaced c→n→r graph."""
    t = load_tables(spark, sf, ("customer", "nation"))
    e1 = t["customer"].select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("n:"), F.col("c_nationkey")).alias("dst"),
        F.lit(0).cast("long").alias("rank"))
    e2 = t["nation"].select(
        F.concat(F.lit("n:"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("r:"), F.col("n_regionkey")).alias("dst"),
        F.lit(0).cast("long").alias("rank"))
    edges = e1.unionByName(e2)
    seeds = t["customer"].filter(F.col("c_custkey") <= 20).select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("vid"))
    return bfs_shortest_paths(edges, seeds, max_hops=3)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "scan_project": q_scan_project,
    "agg_group": q_agg_group,
    "agg_global": q_agg_global,
    "join_agg": q_join_agg,
    "topn": q_topn,
    "left_join": q_left_join,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "dedup": q_dedup,
    "unwind": q_unwind,
    "rollup_apply": q_rollup_apply,
    "setops": q_setops,
    "window_topk": q_window_topk,
    "go_1step": q_go_1step,
    "go_2step": q_go_2step,
    "bfs_distances": q_bfs_distances,
}

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
    "agg_global": """
        SELECT COUNT(*) AS n_orders,
               COUNT(DISTINCT o_custkey) AS n_custs,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
    """,
    "join_agg": """
        SELECT n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "topn": """
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey
        ORDER BY spend DESC, o_custkey ASC LIMIT 10
    """,
    "left_join": """
        SELECT c_custkey, COALESCE(n, 0) AS n_orders
        FROM customer LEFT JOIN
          (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey) o
        ON c_custkey = o_custkey
    """,
    "semi_join": """
        SELECT c_custkey FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_totalprice > 200000)
        ORDER BY c_custkey
    """,
    "anti_join": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey
    """,
    "dedup": "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "unwind": """
        SELECT unnest(string_split(p_type, ' ')) AS word FROM part
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
    "window_topk": """
        SELECT p_brand, p_partkey, p_retailprice, rn FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
          FROM part) WHERE rn <= 3
    """,
    "go_1step": """
        SELECT o_custkey AS c_key, o_orderkey AS o_key, o_totalprice
        FROM orders WHERE o_custkey % 10 = 0 AND o_totalprice > 50000
          AND o_custkey IN (SELECT c_custkey FROM customer)
    """,
    "go_2step": """
        SELECT DISTINCT 'o:' || l_orderkey AS o_key, 'p:' || l_partkey AS p_key,
               CAST(l_linenumber AS BIGINT) AS rank
        FROM lineitem WHERE l_orderkey IN (
          SELECT o_orderkey FROM orders WHERE o_custkey % 10 = 0
            AND o_custkey IN (SELECT c_custkey FROM customer))
    """,
    "bfs_distances": """
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
        FROM bfs WHERE dist > 0 GROUP BY root, vid
    """,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-hop GO + join + aggregate on sf0.001."""
    return q_join_agg(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
