"""Benchmark harness: headline extraction throughput + scaling evidence.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The north rule's two-cluster-size scaling criterion is evidenced by running
the SAME extraction job at two parallelism levels (local[N] and local[4N])
on the same input and reporting docs/sec at both plus efficiency =
(throughput_4N / throughput_N) / 4 (see BENCH/BASELINE.md). Because a
SparkSession's master is fixed per JVM, the two-level run is executed in
subprocesses (bench.py --scaling) and cached to BENCH/scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def run_throughput_once(cores: int, sf_dir: str, replicate: int = 4) -> dict:
    """Run the full-extraction job once at `cores` parallelism; returns
    docs/sec. Pages are synthesized from documents and replicated
    `replicate`x with distinct urls to get a meaningful corpus size."""
    from pyspark.sql import functions as F

    from htmlx.core.extract import Config
    from htmlx.spark.job import run_extraction
    from htmlx.spark.pages import pages_from_documents
    from htmlx.spark.session import get_spark

    spark = get_spark(cores=cores, app_name=f"htmlx-bench-{cores}")
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if replicate > 1:
            docs = docs.crossJoin(spark.range(replicate).withColumnRenamed("id", "rep")).withColumn(
                "doc_id", F.col("doc_id") + F.col("rep") * 1_000_000
            ).drop("rep")
        pages = pages_from_documents(docs, "links").persist()
        n_docs = pages.count()  # materialize input so timing excludes synth
        # Warm-up pass: spin up + import-load the Python workers on every core
        # (spark.python.worker.reuse keeps them alive). A long-running cluster
        # app runs warm; cold-start amortizes to zero at 10^12 docs, so the
        # steady-state number is the meaningful one.
        warm = run_extraction(pages.limit(cores * 128), Config(), num_partitions=cores)
        warm.where(F.col("error") == "").count()
        t0 = time.monotonic()
        out = run_extraction(pages, Config(), num_partitions=cores * 2)
        n_out = out.where(F.col("error") == "").count()
        elapsed = time.monotonic() - t0
        pages.unpersist()
        return {"cores": cores, "docs": n_docs, "ok": n_out, "sec": elapsed, "docs_per_sec": n_docs / elapsed}
    finally:
        spark.stop()


def run_queries(sf_dir: str, cores: int) -> dict:
    """Headline per-query wall times (the driver-facing bench payload)."""
    from htmlx.spark.session import get_spark
    from htmlx.spark.entryqueries import QUERIES

    headline = [
        "extract_text",
        "extract_links",
        "extract_markdown",
        "extract_all_links",
        "dedup_exact",
        "minhash_lsh_candidates",
        "ann_cosine_topk",
        "token_stats",
    ]
    spark = get_spark(cores=cores, app_name="htmlx-bench-queries")
    times = {}
    try:
        for name in headline:
            t0 = time.monotonic()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.monotonic() - t0, 3)
    finally:
        spark.stop()
    return times


def scaling_evidence(sf_dir: str, n_small: int, n_big: int) -> dict:
    """Run the same job at N and 4N cores in fresh subprocesses."""
    results = {}
    replicate = 64  # ~320k docs at sf0.1: timed region >> fixed overheads
    for cores in (n_small, n_big):
        # Pin the whole process (JVM + Python workers) to `cores` CPUs so the
        # small "cluster" cannot borrow idle cores for GC/shuffle/Arrow
        # threads — the honest simulation of an N-core vs 4N-core cluster.
        cmd = [sys.executable, __file__, "--one-run", str(cores), sf_dir, str(replicate)]
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3000)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    small, big = results[n_small], results[n_big]
    eff = (big["docs_per_sec"] / small["docs_per_sec"]) / (n_big / n_small)
    return {
        "n_small": n_small,
        "n_big": n_big,
        "docs_per_sec_small": round(small["docs_per_sec"], 1),
        "docs_per_sec_big": round(big["docs_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "docs": big["docs"],
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one-run":
        cores = int(sys.argv[2])
        sf_dir = sys.argv[3]
        replicate = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        print(json.dumps(run_throughput_once(cores, sf_dir, replicate)))
        return

    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        ev = scaling_evidence(SF_DIR, max(CPUS // 4, 2), CPUS)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/scaling.json", "w") as f:
            json.dump(ev, f, indent=1)
        print(json.dumps(ev))
        return

    t0 = time.monotonic()
    times = run_queries(SF_DIR, CPUS)
    total = round(time.monotonic() - t0, 3)
    payload = {
        "metric": "headline query wall time (full HTML extraction + dedup/ANN) at local[%d]" % CPUS,
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_label(SF_DIR),
    }
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            payload["scaling"] = json.load(f)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
