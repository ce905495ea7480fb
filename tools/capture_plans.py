"""Dump .explain('formatted') for every bench query to plans/r12/<q>_<tag>.txt."""
import os, sys, io
sys.path.insert(0, "/root/repo")
tag = sys.argv[1] if len(sys.argv) > 1 else "before"
only = sys.argv[2:] or None
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
import __spark_entry__ as entry
from nebula_spark.session import get_spark
from contextlib import redirect_stdout

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("plan_capture")
spark.sparkContext.setLogLevel("ERROR")
import bench
names = list(bench.BENCH_QUERIES) + list(bench.FRONTEND_LANE)
for name in names:
    if only and name not in only:
        continue
    qn = bench.FRONTEND_LANE.get(name, name)
    fn = getattr(entry, f"q_{qn}", None) or entry.queries()[qn]
    try:
        df = fn(spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = buf.getvalue()
    except Exception as ex:
        out = f"ERROR building plan: {ex}\n"
    with open(f"/root/repo/plans/r12/{name}_{tag}.txt", "w") as f:
        f.write(out)
    print(name, "->", len(out), "bytes")
