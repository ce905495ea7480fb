"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": dir}.

Execution is measured end-to-end per query with a `noop` sink (full compute,
no driver-side result transfer) — the number the 2×-of-baseline gate reads.

Noise control (round-3 fix): a single cold pass cannot distinguish
regression from JVM/codegen warm-up — byte-identical queries recorded 0.62 s
one round and 2.03 s the next. So: one untimed warm-up pass of the FULL
query list (compiles every codegen tree, primes parquet footers and shuffle
paths), then ``$SPARK_GRAFT_BENCH_REPS`` (default 3) timed passes per query,
reporting the per-query MEDIAN in ``queries`` (what the gate reads) and
min/median/max detail in ``queries_detail``.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # relational + traversal headline set (stable since r1 for comparability)
    "scan_project", "agg_group", "join_agg", "topn", "left_join",
    "rollup_apply", "window_topk", "go_1step", "go_2step", "bfs_distances",
    # training-data pipeline + streaming-shape + front-end ops
    "sessionize", "minhash_lsh_pairs", "ann_topk", "doc_stats",
    "multimodal_meta", "shortest_path_fn", "pagerank",
    # r2 additions
    "dedup_clusters",
]

# Front-end latency lane (r9 verdict #6): execute() END-TO-END —
# parse→validate→plan in pure Python plus the Spark job — so parser/
# planner regressions show in the official artifact. Reported under
# "frontend"/"frontend_total_sec", NOT folded into the headline total
# (which stays comparable to the r1 baseline gate).
FRONTEND_LANE = {
    "frontend_go_pipe": "ngql_go_pipe",
    "frontend_match_2hop": "ngql_match_2hop",
    "frontend_lookup": "frontend_lookup",
    "frontend_dml_script": "dml_lifecycle",
}


def wait_for_quiet_machine() -> tuple[float, list[float], bool]:
    """Contention guard (r8, per r7 verdict task #1): three consecutive
    official BENCH artifacts were recorded on a loaded box (r7:
    load_avg_1m before=6.08 vs the builder's clean 0.26). If the 1-minute
    load exceeds LOAD_THRESHOLD at start, sleep and retry a bounded number
    of times; if it never clears, still run but stamp ``"contended": true``
    so the artifact self-reports instead of needing SCALE.md forensics.

    Returns (final_load_before, all_attempt_loads, contended_flag).
    Tunables: SPARK_GRAFT_LOAD_THRESHOLD (default 1.5),
    SPARK_GRAFT_LOAD_RETRIES (default 5), SPARK_GRAFT_LOAD_WAIT_SEC (60).
    """
    threshold = float(os.environ.get("SPARK_GRAFT_LOAD_THRESHOLD", "1.5"))
    retries = int(os.environ.get("SPARK_GRAFT_LOAD_RETRIES", "5"))
    wait_sec = float(os.environ.get("SPARK_GRAFT_LOAD_WAIT_SEC", "60"))
    attempts: list[float] = []
    for i in range(retries + 1):
        load = os.getloadavg()[0]
        attempts.append(round(load, 2))
        if load <= threshold:
            return load, attempts, False
        if i < retries:
            print(f"bench: 1m load {load:.2f} > {threshold} — "
                  f"waiting {wait_sec:.0f}s (attempt {i + 1}/{retries})",
                  file=sys.stderr)
            time.sleep(wait_sec)
    return attempts[-1], attempts, True


def main() -> None:
    import __spark_entry__ as entry
    from nebula_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # machine-contention evidence + guard (r6-r8: recorded artifacts
    # drifted +40% over two rounds purely from a busy box — SCALE.md
    # "Round-7 clean-machine bench re-record"); waits for a quiet machine
    # before burning any JVM time, stamps "contended" if it never clears
    load_before_val, load_attempts, contended = wait_for_quiet_machine()
    load_before = (load_before_val,)
    spark = get_spark("nebula_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def run(name: str) -> float:
        # q_* functions are the source of truth: the bench set stays stable
        # across rounds even when the (slot-capped) queries() dict rotates
        qn = FRONTEND_LANE.get(name, name)
        fn = getattr(entry, f"q_{qn}", None) or qs[qn]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm the JVM + parquet footer cache once, outside timing
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # untimed warm-up pass of the full list: whole-stage codegen compiles,
    # broadcast thresholds settle, shuffle dirs exist — after this, repeat
    # runs of a byte-identical query agree within ~20%
    for name in (*BENCH_QUERIES, *FRONTEND_LANE):
        run(name)

    samples: dict[str, list[float]] = {n: [] for n in BENCH_QUERIES}
    fe_samples: dict[str, list[float]] = {n: [] for n in FRONTEND_LANE}
    for _ in range(reps):
        for name in BENCH_QUERIES:
            samples[name].append(run(name))
        for name in FRONTEND_LANE:
            fe_samples[name].append(run(name))

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    detail = {n: {"min": round(min(s), 3),
                  "median": round(statistics.median(s), 3),
                  "max": round(max(s), 3)} for n, s in samples.items()}
    frontend = {n: round(statistics.median(s), 3)
                for n, s in fe_samples.items()}
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_detail": detail,
        "frontend": frontend,
        "frontend_total_sec": round(sum(frontend.values()), 3),
        "reps": reps,
        "sf": sf_dir,
        "load_avg_1m": {"before": round(load_before[0], 2),
                        "after": round(os.getloadavg()[0], 2),
                        "attempts": load_attempts},
        "contended": contended,
    }))


if __name__ == "__main__":
    main()
