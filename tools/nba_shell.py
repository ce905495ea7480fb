"""Scratch harness: load the nba fixture and run front-end queries.

Usage: python tools/nba_shell.py 'QUERY' ['QUERY' ...]
Prints each query's rows (or the error) — for checking behavior against
reference TCK goldens while porting them into tests/test_tck_goldens.py.
"""
import sys

from pyspark.sql import SparkSession, functions as F

from nebula_spark.catalog import GraphSpace
from nebula_spark.plans import execute

NBA = "/root/reference/tests/data/nba"


def nba_space(spark):
    def _read(name, cols):
        return (spark.read.option("header", True)
                .csv(f"{NBA}/{name}.csv").toDF(*cols))

    player = _read("player", ["vid", "name", "age"])
    null_rows = _read("null", ["vid", "name", "age"])
    player = (player.unionByName(null_rows)
              .select("vid",
                      F.when(F.lower("name").isin("null", "__null__"),
                             None).otherwise(F.col("name")).alias("name"),
                      F.col("age").cast("long").alias("age")))
    team = _read("team", ["vid", "name"])
    bachelor = _read("bachelor", ["vid", "name", "speciality"])
    like = (_read("like", ["src", "dst", "likeness"])
            .select("src", "dst", F.lit(0).cast("long").alias("rank"),
                    F.col("likeness").cast("long").alias("likeness")))
    serve = (_read("serve", ["src", "dst", "rank", "start_year", "end_year"])
             .select("src", "dst", F.col("rank").cast("long").alias("rank"),
                     F.col("start_year").cast("long").alias("start_year"),
                     F.col("end_year").cast("long").alias("end_year")))
    teammate = (_read("teammate", ["src", "dst", "start_year", "end_year"])
                .select("src", "dst", F.lit(0).cast("long").alias("rank"),
                        F.col("start_year").cast("long").alias("start_year"),
                        F.col("end_year").cast("long").alias("end_year")))
    sp = GraphSpace(spark, "nba")
    sp.create_tag("player", df=player)
    sp.create_tag("team", df=team)
    sp.create_tag("bachelor", df=bachelor)
    sp.create_edge("like", df=like.dropDuplicates(["src", "dst", "rank"]))
    sp.create_edge("serve", df=serve.dropDuplicates(["src", "dst", "rank"]))
    sp.create_edge("teammate",
                   df=teammate.dropDuplicates(["src", "dst", "rank"]))
    return sp


if __name__ == "__main__":
    # the library session (nulls-normalized, ANSI off) — a bare
    # SparkSession would probe Spark-default semantics, not the engine's
    from nebula_spark.session import get_spark
    spark = get_spark("nba_shell", **{
        "spark.master": "local[8]",
        "spark.sql.shuffle.partitions": "8",
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("FATAL")
    sp = nba_space(spark)
    for q in sys.argv[1:]:
        print(f"=== {q}")
        try:
            df = execute(sp, q)
            for r in df.collect()[:60]:
                print(" ", tuple(r))
            print("  schema:", df.schema.simpleString())
        except Exception as ex:
            print("  ERROR:", type(ex).__name__, str(ex).split("\n")[0][:200])
