"""Larger-scale bench point (r6 verdict item 6): materialize an sf1-like
dataset (sf0.1 × 10 copies with re-keyed ids) and run the five most
expensive bench queries once at each scale, printing a sec-per-query
table. A super-linear blowup would expose a hidden driver-side or skew
bottleneck no sf0.1 run can.

Re-keying: every entity key (custkey/orderkey/partkey/suppkey/doc_id)
shifts by copy*10_000_000, preserving referential joins within a copy;
nation/region stay fixed (real dims — the fan-in onto 25 nations grows
10×, which is the realistic skew shape). Document text is salted per
copy so the near-dup structure is preserved per copy instead of turning
every doc into a 10-clone exact-dup group (which would be a quadratic
worst case, not a scale test).

Usage: python tools/scale_probe.py [--gen-only|--run-only]
Writes parquet under /root/repo/.sf1_scale/ (gitignored, ~6M lineitem).
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
# COPIES is env-tunable (r8): SPARK_GRAFT_SCALE_COPIES=30 materializes an
# sf3-like point under .sf3_scale/ for a 3-point linearity trend
COPIES = int(os.environ.get("SPARK_GRAFT_SCALE_COPIES", "10"))
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   f".sf{COPIES // 10}_scale" if COPIES % 10 == 0
                   else f".sfx{COPIES}_scale")
SHIFT = 10_000_000

# which columns are entity keys, per table (shift by copy*SHIFT)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],                  # fixed dim
    "region": [],                  # fixed dim
    "documents": [],               # doc_id is a string — salted below
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}


def generate(spark):
    # SPARK_GRAFT_SCALE_TABLES="documents" materializes a subset — the
    # sf10-like point (COPIES=100, r9 verdict item 8) only feeds
    # minhash_lsh_pairs/dedup_clusters, which read documents alone
    only = os.environ.get("SPARK_GRAFT_SCALE_TABLES")
    wanted = set(only.split(",")) if only else None
    os.makedirs(DST, exist_ok=True)
    for t, keys in KEYS.items():
        if wanted is not None and t not in wanted:
            continue
        out = f"{DST}/{t}.parquet"
        if os.path.exists(out):
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if not keys and t not in ("documents",):
            df.write.mode("overwrite").parquet(out)
            continue
        parts = []
        for k in range(COPIES):
            c = df
            for col in keys:
                c = c.withColumn(col, F.col(col) + F.lit(k * SHIFT))
            if t == "documents":
                if k > 0:
                    c = (c.withColumn(
                            "doc_id", F.concat_ws("_", F.col("doc_id"),
                                                  F.lit(str(k))))
                         .withColumn(
                            "text", F.concat(F.col("text"),
                                             F.lit(f" copy{k}")))
                         .withColumn("n_chars",
                                     F.length("text").cast("int")))
            parts.append(c)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out)
        print(f"generated {t}: {spark.read.parquet(out).count()} rows",
              flush=True)


# r8 (r7 verdict item 4): the FULL 18-query headline set, not just the
# five most expensive — any query whose sf0.1→sf1 ratio exceeds ~5x for
# 10x data needs a plan explanation or a fix
QUERIES = ["scan_project", "agg_group", "join_agg", "topn", "left_join",
           "rollup_apply", "window_topk", "go_1step", "go_2step",
           "bfs_distances", "sessionize", "minhash_lsh_pairs", "ann_topk",
           "doc_stats", "multimodal_meta", "shortest_path_fn", "pagerank",
           "dedup_clusters"]


def run(spark, sf_dir):
    import __spark_entry__ as E
    only = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    qs = only.split(",") if only else QUERIES
    out = {}
    for q in qs:
        # bench-only queries (bfs_distances) aren't oracle slots — fall
        # back to the importable q_* function
        fn = E.QUERIES.get(q) or getattr(E, f"q_{q}")
        best, n = None, None
        for _ in range(2):               # min-of-2: amortize JVM warmup
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        out[q] = (round(best, 2), n)
        print(f"{sf_dir.split('/')[-1] or 'sf1'} {q}: {out[q][0]} s "
              f"({n} rows)", flush=True)
    return out


if __name__ == "__main__":
    from nebula_spark.session import get_spark
    spark = get_spark()
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode != "--run-only":
        generate(spark)
    if mode != "--gen-only":
        # session warmup so the first measured query isn't paying JVM
        # + codegen first-run costs
        spark.read.parquet(f"{SRC}/lineitem.parquet").count()
        a = run(spark, SRC)
        b = run(spark, DST)
        print("\n| query | sf0.1 s | sf1 s | ratio (10x data) |")
        print("|---|---|---|---|")
        for q in a:
            r = round(b[q][0] / a[q][0], 1)
            print(f"| {q} | {a[q][0]} | {b[q][0]} | {r}x |")
