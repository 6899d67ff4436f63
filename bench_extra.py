"""r10 optimization instrumentation — bench.py is FROZEN for measurement,
so every extra probe lives here (guide §1: measure first, noop sink,
labeled jobs, plan capture).

Usage:
  python bench_extra.py plans <sf_dir> <outdir> [suffix] [query...]
      Write .explain("formatted") for each bench query to
      <outdir>/<query>_<suffix>.txt (suffix defaults to "before").
  python bench_extra.py time <sf_dir> <repeats> [query...]
      Warm-session noop-sink timing, bench.py methodology (same session,
      serial), printed as one JSON line per repeat.

The query set mirrors bench.py run_queries() exactly (including the
production-basis minhash/simhash rows that are not QUERIES entries).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _bench_named():
    from htmlx.spark import analytics
    from htmlx.spark.entryqueries import QUERIES

    def _docs(spark, d):
        return spark.read.parquet(f"{d}/documents.parquet")

    named = dict(QUERIES)
    named["minhash_lsh_candidates"] = lambda s, d: analytics.minhash_lsh_candidates(
        _docs(s, d)
    )
    named["minhash_lsh_oracle_md5"] = QUERIES["minhash_lsh_candidates"]
    named["simhash"] = lambda s, d: analytics.simhash_docs(_docs(s, d))
    named["simhash_oracle_md5"] = QUERIES["simhash"]
    return named


HEADLINE = [
    "extract_text",
    "extract_links",
    "extract_markdown",
    "extract_all_links",
    "dedup_exact",
    "minhash_lsh_candidates",
    "ann_cosine_topk",
    "token_stats",
    "simhash",
    "lang_id",
    "embedding_near_dup",
    "tpch_pricing_summary",
    "pdf_text_extract",
    "media_pixel_decode",
    "decontaminate",
    "jpeg_pixel_decode",
    "pdf_structural_parse",
    "corpus_filter",
    "minhash_lsh_oracle_md5",
    "simhash_oracle_md5",
]


def _get_spark(cores):
    from htmlx.spark.session import get_spark

    return get_spark(cores=cores, app_name="htmlx-bench-extra")


def cmd_plans(sf_dir: str, outdir: str, suffix: str, queries: list[str]) -> None:
    os.makedirs(outdir, exist_ok=True)
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    named = _bench_named()
    spark = _get_spark(cores)
    try:
        for name in queries or HEADLINE:
            df = named[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            n_exch = plan.count("Exchange")
            print(f"{name}: {len(plan)} chars, Exchange x{n_exch} -> {path}")
    finally:
        spark.stop()


def cmd_time(sf_dir: str, repeats: int, queries: list[str]) -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    named = _bench_named()
    spark = _get_spark(cores)
    sel = queries or HEADLINE
    try:
        # bench.py's warm-up shape
        named["extract_text"](spark, sf_dir).limit(cores * 64).write.format(
            "noop"
        ).mode("overwrite").save()
        for warm in ("jpeg_pixel_decode", "pdf_structural_parse", "audio_pcm_decode"):
            named[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()
        for r in range(repeats):
            times = {}
            for name in sel:
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.monotonic()
                named[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[name] = round(time.monotonic() - t0, 3)
                spark.sparkContext.setJobDescription(None)
            print(json.dumps({"repeat": r, "queries": times, "sum": round(sum(times.values()), 3)}), flush=True)
    finally:
        spark.stop()


def main() -> None:
    mode = sys.argv[1]
    if mode == "plans":
        sf_dir, outdir = sys.argv[2], sys.argv[3]
        suffix = sys.argv[4] if len(sys.argv) > 4 else "before"
        cmd_plans(sf_dir, outdir, suffix, sys.argv[5:])
    elif mode == "time":
        cmd_time(sys.argv[2], int(sys.argv[3]), sys.argv[4:])
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
