"""Per-query Spark job/stage counts + wall time for the bench set.

Job and stage counts are load-independent evidence of plan shape (one
row per query: jobs, stages, tasks, wall seconds for a single noop-sink
run after one warmup). Usage:

    python tools/job_counts.py [query ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
import bench  # noqa: E402
from nebula_spark.session import get_spark  # noqa: E402


def main() -> None:
    only = sys.argv[1:] or None
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("job_counts")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = spark.sparkContext.statusTracker()
    names = list(bench.BENCH_QUERIES) + list(bench.FRONTEND_LANE)
    if only:
        names = [n for n in names if n in only]
    qs = entry.queries()

    def run(name: str) -> float:
        qn = bench.FRONTEND_LANE.get(name, name)
        fn = getattr(entry, f"q_{qn}", None) or qs[qn]
        t0 = time.time()
        df = fn(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warmup (codegen, footers)
    spark.read.parquet(f"{sf}/lineitem.parquet").count()
    for n in names:
        run(n)

    print(f"{'query':<22}{'jobs':>6}{'stages':>8}{'tasks':>8}{'sec':>8}")
    for n in names:
        j0 = tracker.getJobIdsForGroup()
        dt = run(n)
        j1 = tracker.getJobIdsForGroup()
        new_jobs = [j for j in j1 if j not in set(j0)]
        stages = 0
        tasks = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None and si.numActiveTasks + si.numCompletedTasks + si.numFailedTasks > 0:
                    stages += 1
                    tasks += si.numCompletedTasks
        print(f"{n:<22}{len(new_jobs):>6}{stages:>8}{tasks:>8}{dt:>8.2f}")


if __name__ == "__main__":
    main()
