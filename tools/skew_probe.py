"""Skewed-data scale point (r9 verdict item 3): materialize a HOT-KEY
variant of sf0.1 and compare the four shuffle-sensitive queries against
the uniform baseline. The reference's per-vertex truncation
(storage.thrift:154-158 limit/filter pushdowns) exists precisely because
real graphs have celebrity vertices; a Spark engine meets the same shape
with AQE skew-join splitting + salting, and this probe measures whether
ours actually does.

Skew shapes injected (all deterministic, md5-keyed — no RNG):
  orders.o_custkey   — ~30% of all orders re-point at ONE customer whose
                       vid is ≡0 (mod 10), so q_go_2step's start set hits
                       a ~45k-out-edge hot vertex at sf0.1
  lineitem.l_partkey — ~30% of lineitems re-point at ONE part: the
                       2nd-hop dedup sees a hot destination
  customer.c_nationkey — half of all customers land on nation 7:
                       q_bfs_distances' frontier join gets a hot dst
  events.user_id     — Zipf(α≈2) remap via inverse-CDF on md5(event_id):
                       rank-1 user owns ~30-40% of events (sessionize's
                       session_window partitions by user)
  documents.text     — 10% of docs become near-copies of one template
                       (distinct ids, one shared shingle set): LSH gets
                       one giant band bucket and connected-components
                       one giant star component — the classic dedup
                       skew killer at corpus scale

Usage: python tools/skew_probe.py [--gen-only|--run-only]
Writes parquet under /root/repo/.skew_scale/ (gitignored).
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".skew_scale")

PASSTHROUGH = ["region", "nation", "part", "supplier", "embeddings"]
QUERIES = ["go_2step", "bfs_distances", "sessionize", "minhash_lsh_pairs",
           "dedup_clusters"]


def _u01(col):
    """Deterministic uniform(0,1] from a key column (md5 low 8 hex)."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("double") / F.lit(float(0xFFFFFFFF)) + F.lit(1e-9))


def generate(spark):
    os.makedirs(DST, exist_ok=True)

    def done(t):
        return os.path.exists(f"{DST}/{t}.parquet")

    for t in PASSTHROUGH:
        if not done(t):
            spark.read.parquet(f"{SRC}/{t}.parquet") \
                .write.mode("overwrite").parquet(f"{DST}/{t}.parquet")

    if not done("customer"):
        c = spark.read.parquet(f"{SRC}/customer.parquet")
        # half of all customers move to nation 7 (hot BFS destination)
        c = c.withColumn(
            "c_nationkey",
            F.when(_u01(F.col("c_custkey")) < 0.5, F.lit(7))
            .otherwise(F.col("c_nationkey")).cast("long"))
        c.write.mode("overwrite").parquet(f"{DST}/customer.parquet")

    if not done("orders"):
        o = spark.read.parquet(f"{SRC}/orders.parquet")
        # hot customer: vid 10 (≡0 mod 10 → inside go_2step's start set)
        o = o.withColumn(
            "o_custkey",
            F.when(_u01(F.col("o_orderkey")) < 0.3, F.lit(10))
            .otherwise(F.col("o_custkey")).cast("long"))
        o.write.mode("overwrite").parquet(f"{DST}/orders.parquet")

    if not done("lineitem"):
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        li = li.withColumn(
            "l_partkey",
            F.when(_u01(F.col("l_orderkey") * 7919 + F.col("l_linenumber"))
                   < 0.3, F.lit(1))
            .otherwise(F.col("l_partkey")).cast("long"))
        li.write.mode("overwrite").parquet(f"{DST}/lineitem.parquet")

    if not done("events"):
        ev = spark.read.parquet(f"{SRC}/events.parquet")
        n_users = ev.agg(F.max("user_id")).collect()[0][0]
        # Zipf(α=2) inverse CDF: rank = ceil(1/u), capped at n_users;
        # rank 1 draws ~ everything below u=1 → P(rank=1) ≈ 50%
        ev = ev.withColumn(
            "user_id",
            F.least(F.ceil(F.lit(1.0) / _u01(F.col("event_id"))),
                    F.lit(int(n_users))).cast("long"))
        ev.write.mode("overwrite").parquet(f"{DST}/events.parquet")

    if not done("documents"):
        d = spark.read.parquet(f"{SRC}/documents.parquet")
        tmpl = ("the quick brown fox jumps over the lazy dog again and "
                "again while the corpus deduplicates itself at scale")
        # 10% of docs share one shingle set (ids stay distinct): one
        # giant LSH bucket + one giant CC star
        d = d.withColumn(
            "text",
            F.when(_u01(F.col("doc_id")) < 0.10, F.lit(tmpl))
            .otherwise(F.col("text")))
        d = d.withColumn("n_chars", F.length("text").cast(
            dict(d.dtypes)["n_chars"]))
        d.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

    for t in PASSTHROUGH + ["customer", "orders", "lineitem", "events",
                            "documents"]:
        print(f"skew {t}: {spark.read.parquet(f'{DST}/{t}.parquet').count()}"
              " rows", flush=True)


def run(spark, sf_dir):
    import __spark_entry__ as E
    out = {}
    for q in QUERIES:
        fn = E.QUERIES.get(q) or getattr(E, f"q_{q}")
        best, n = None, None
        for _ in range(2):
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[q] = (round(best, 2), n)
        print(f"{os.path.basename(sf_dir) or sf_dir} {q}: {out[q][0]} s "
              f"({n} rows)", flush=True)
    return out


if __name__ == "__main__":
    from nebula_spark.session import get_spark
    spark = get_spark()
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode != "--run-only":
        generate(spark)
    if mode != "--gen-only":
        spark.read.parquet(f"{SRC}/lineitem.parquet").count()  # warmup
        a = run(spark, SRC)
        b = run(spark, DST)
        print("\n| query | uniform s | skewed s | skew/uniform |")
        print("|---|---|---|---|")
        for q in QUERIES:
            r = round(b[q][0] / a[q][0], 1)
            print(f"| {q} | {a[q][0]} | {b[q][0]} | {r}x |")
