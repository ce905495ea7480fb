"""Local replica of the driver's t2 correctness gate: run every
``__spark_entry__.queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compare row count + column names + exact values
(columns sorted by name, rows sorted by all columns).

Stricter than the driver can be: floats compare bitwise-exact. If this
passes, any reasonable value-hash passes.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm_cell(x)) for k, x in v.items()))
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main() -> int:
    import __spark_entry__ as entry
    from nebula_spark.session import get_spark

    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    ran = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        ran += 1
        t0 = time.time()
        try:
            df = fn(spark, SF)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows={len(srows)} (no oracle, rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        dt = time.time() - t0
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            failed.append(name)
        elif len(sr) != len(orr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(orr)}")
            failed.append(name)
        elif sr != orr:
            bad = next(i for i, (a, b) in enumerate(zip(sr, orr)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:\n"
                  f"  spark : {sr[bad]}\n  duckdb: {orr[bad]}")
            failed.append(name)
        else:
            print(f"PASS {name}: rows={len(sr)} ({dt:.1f}s)")
    # honest denominator (r8 verdict nit): count only slots actually RUN
    # under a filter, and name the skipped remainder
    skipped = len(qs) - ran
    tail = f" ({skipped} filtered out)" if skipped else ""
    print(f"\n{ran - len(failed)}/{ran} passed{tail}")
    if ONLY:
        unknown = ONLY - set(qs)
        if unknown:
            print(f"WARNING: unknown query names: {sorted(unknown)}")
            return 1
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
