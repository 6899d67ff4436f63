"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle on DuckDB at a given SF, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from __spark_entry__ import oracle_sql, queries
from htmlx.spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# The driver records AT MOST this many correctness rows (observed round 3:
# 51 registered queries -> exactly the first 50 in dict order got rows, the
# 51st was silently dropped; rounds 1-2 with fewer queries recorded all).
# Registering more than this silently un-gates the tail of the dict.
DRIVER_QUERY_CAP = 50


def check_registration(qs, oracles):
    """Fail fast on registration-level gaps before any Spark work."""
    errs = []
    if len(qs) > DRIVER_QUERY_CAP:
        errs.append(
            f"{len(qs)} queries registered but the driver records only the "
            f"first {DRIVER_QUERY_CAP} — merge or drop "
            f"{list(qs)[DRIVER_QUERY_CAP:]}"
        )
    for name in oracles:
        if name not in qs:
            errs.append(f"oracle {name!r} has no queries() entry")
    # Every registered query should have a row in the latest driver artifact
    # (new queries added since that run are expected to be absent — warn).
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    arts = sorted(
        f for f in os.listdir(root)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    )
    if arts:
        import json

        with open(os.path.join(root, arts[-1])) as fh:
            rows = json.load(fh)
        missing = [q for q in qs if q not in rows]
        if missing:
            print(
                f"WARN: registered but absent from {arts[-1]}: {missing} "
                "(expected only for queries added since that driver run)"
            )
        bad = [q for q, r in rows.items()
               if q in qs and not (r.get("rows_match") and r.get("schema_match"))]
        if bad:
            print(f"WARN: red rows in {arts[-1]}: {bad}")
    return errs


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = queries()
    oracles = oracle_sql()
    reg_errs = check_registration(qs, oracles)
    if reg_errs:
        for e in reg_errs:
            print(f"FAIL registration: {e}")
        spark.stop()
        return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = [dict(zip(ocols, row)) for row in rel.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            failures.append(name)
            continue
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            status.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if not status:
            a = normalize(srows, scols)
            b = normalize(orows, ocols)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                status.append(f"values differ; first diffs: {diff}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"OK   {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
    print("\n==", "ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
