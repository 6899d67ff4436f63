"""Extraction hot-path profiler (VERDICT r4 item 7).

Runs the full per-document extraction pipeline (the exact code mapInPandas
executes per row) over the synthesized pages corpus single-process, and
reports a per-STAGE CPU breakdown by aggregating cProfile tottime per
module — structural evidence, immune to the host's 3x wall-clock noise
band (per the build notes: prefer structural metrics over sub-60 s
wall-clock comparisons).

Usage: PYTHONPATH=/root/repo python tools/profile_extract.py [sf_dir] [reps]
Prints one JSON line: {"docs": N, "cpu_sec": S, "us_per_doc": U,
"stages": {module: {"tottime": s, "pct": p}}, ...}.
"""

from __future__ import annotations

import cProfile
import json
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGE_MODULES = (
    "core/dom.py", "core/scorer.py", "core/extraction.py", "core/sanitize.py",
    "core/textnorm.py", "core/entities.py", "core/media.py", "core/tables.py",
    "core/extract.py", "core/links.py", "core/urlutil.py", "core/encoding.py",
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import duckdb

    from htmlx.core.extract import Extractor
    from htmlx.spark.pages import duckdb_pages_cte

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    pages = [
        r[0].encode()
        for r in con.execute(
            "SELECT page_html FROM ({})".format(duckdb_pages_cte("links"))
        ).fetchall()
    ]
    ex = Extractor()
    for p in pages[:200]:  # warm caches/regex
        ex.extract(p)

    # headline CPU: plain pass, no profiler overhead
    t0 = time.process_time()
    for _ in range(reps):
        for p in pages:
            ex.extract(p)
    cpu = time.process_time() - t0

    # stage shares: profiled pass (profiler overhead cancels in the ratios)
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(reps):
        for p in pages:
            ex.extract(p)
    pr.disable()

    stats = pstats.Stats(pr)
    stages: dict[str, float] = {}
    total = 0.0
    for (fname, _lineno, _fn), (_cc, _nc, tottime, _ct, _callers) in stats.stats.items():
        total += tottime
        key = "other"
        for mod in STAGE_MODULES:
            if fname.endswith(mod):
                key = mod.split("/")[-1]
                break
        else:
            if fname.startswith("~") or "{" in fname:
                key = "builtins"
        stages[key] = stages.get(key, 0.0) + tottime
    n = len(pages) * reps
    out = {
        "docs": n,
        "cpu_sec": round(cpu, 3),
        "us_per_doc": round(1e6 * cpu / n, 1),
        "profile_total_sec": round(total, 3),
        "stages": {
            k: {"tottime": round(v, 4), "pct": round(100 * v / total, 1)}
            for k, v in sorted(stages.items(), key=lambda kv: -kv[1])
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
