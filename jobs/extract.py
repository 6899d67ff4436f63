"""spark-submit entry point for the extraction pipeline.

  spark-submit --py-files htmlx.zip jobs/extract.py \
      --input <pages table/parquet path, or .warc/.warc.gz archives> \
      --output <results root> \
      [--metrics <metrics root>] [--run-id RID] [--groups 64] \
      [--mode extract|links|text] [--partitions N] \
      [--input-format auto|parquet|table|warc] \
      [--previous <prior pages parquet>] \
      [--cdx <cdxj index> --cdx-urls <url keep-list parquet> [--cdx-ranges]]

Reads the Common-Crawl-style pages table (url, warc_ts, html, text, lang),
runs the extraction engine with checkpointed resume (url-hash groups; each
group's append is one atomic commit), and writes results + per-partition
metrics. Re-running with the same --run-id skips committed groups.

Incremental runs: pass --previous with the PRIOR crawl's pages table and
only pages whose canonical URL is new or whose html digest changed are
extracted (analytics.snapshot_diff); the per-URL delta classification is
written to <output>/_snapshot_diff.parquet so callers can union the
fresh delta results with their prior results table for unchanged URLs
(and drop removed ones) — the standard incremental-refresh contract
without re-paying extraction for the unchanged bulk of the crawl.
"""

import argparse
import sys
import uuid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", default=None)
    ap.add_argument("--audit", default=None, help="audit-events table root (optional)")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--groups", type=int, default=64)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--mode", choices=["extract", "links", "text"], default="extract")
    ap.add_argument("--input-format", choices=["auto", "parquet", "table", "warc"],
                    default="auto",
                    help="input kind; 'warc' reads .warc/.warc.gz archives "
                         "(htmlx.spark.warc) straight into the pipeline — "
                         "'auto' also picks warc for *.warc/*.warc.gz paths")
    ap.add_argument("--previous", default=None,
                    help="prior crawl's pages parquet: extract only the delta "
                         "(added/changed canonical URLs) and write the diff "
                         "classification to <output>/_snapshot_diff.parquet")
    ap.add_argument("--cdx", default=None,
                    help="CDXJ capture index (cc-index text files) for warc "
                         "input: prune the archive scan to files containing "
                         "wanted records BEFORE reading archive bytes")
    ap.add_argument("--cdx-urls", default=None,
                    help="parquet with a url column — the keep-list joined "
                         "against --cdx; required with --cdx")
    ap.add_argument("--cdx-previous", default=None,
                    help="the PRIOR crawl's CDXJ index: extract only urls "
                         "whose latest-capture digest is new or changed vs "
                         "it (cdx_snapshot_delta — incremental recrawl "
                         "decided at index cost, before any archive byte)")
    ap.add_argument("--wet-output", default=None,
                    help="also publish the extracted text as WET archives "
                         "(.warc.wet.gz, conversion records) to this dir — "
                         "the crawl ecosystem's derived-text format "
                         "(htmlx.spark.warc.write_wet)")
    ap.add_argument("--fetch-plan", default=None,
                    help="fetch_plan.parquet from jobs/frontier.py: "
                         "process ONLY urls assigned to --fetch-window "
                         "(Crawl-delay politeness enforced per round)")
    ap.add_argument("--fetch-window", type=int, default=0,
                    help="which politeness window of --fetch-plan to "
                         "execute (default 0, the first)")
    ap.add_argument("--cdx-ranges", action="store_true",
                    help="with --cdx: read ONLY the selected records' byte "
                         "ranges (cdx offset/length spans) instead of whole "
                         "pruned archives — record-granularity reads, the "
                         "bytes touched collapse to the keep-list's size")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from htmlx.core.extract import Config, text_only_config
    from htmlx.spark.io import ParquetTableIO, run_with_resume
    from htmlx.spark.job import run_all_links

    spark = SparkSession.builder.appName("htmlx-extract").getOrCreate()
    run_id = args.run_id or uuid.uuid4().hex[:12]
    fmt = args.input_format
    if fmt == "auto" and args.input.rstrip("/").endswith((".warc", ".warc.gz")):
        fmt = "warc"
    if fmt == "warc":
        from htmlx.spark.warc import read_warc

        if args.cdx:
            # Common-Crawl-style pruning: never read 100 TB of archives
            # when the (tiny-by-comparison) capture index can name the
            # files that contain wanted records. File list collects to
            # the driver — it is a FILE LISTING (~72k entries per crawl
            # snapshot), the same structure any file source builds.
            from htmlx.spark.warc import cdx_archive_pruning, read_cdx

            if bool(args.cdx_urls) == bool(args.cdx_previous):
                sys.exit("--cdx requires exactly one of --cdx-urls "
                         "(explicit keep-list) or --cdx-previous "
                         "(incremental delta vs the prior crawl's index)")
            cdx = read_cdx(spark, args.cdx)
            if args.cdx_previous:
                # incremental recrawl at INDEX cost: diff the two crawl
                # indexes (no archive bytes read) and extract only the
                # added/changed captures
                from pyspark.sql import functions as F
                from htmlx.spark.warc import cdx_snapshot_delta

                keep_urls = (
                    cdx_snapshot_delta(read_cdx(spark, args.cdx_previous), cdx)
                    .where(F.col("status").isin("added", "changed"))
                    .select("url")
                )
            else:
                keep_urls = spark.read.parquet(args.cdx_urls)
            root = args.input.rstrip("/")
            if args.cdx_ranges:
                # record-granularity: seek-read ONLY the selected spans
                # (one sequential pass per file per task); a member can
                # hold several records, so the url filter still applies
                from pyspark.sql import functions as F
                from htmlx.spark.warc import cdx_record_pruning, read_warc_ranges

                spans = cdx_record_pruning(cdx, keep_urls).withColumn(
                    "filename",
                    F.when(
                        F.col("filename").rlike("^(/|file:|hdfs:|s3:)"),
                        F.col("filename"),
                    ).otherwise(F.concat(F.lit(root + "/"), F.col("filename"))),
                )
                pages = read_warc_ranges(spark, spans).join(
                    keep_urls.select("url").distinct(), "url", "left_semi"
                )
            else:
                selected = [
                    r["filename"]
                    for r in cdx_archive_pruning(cdx, keep_urls)
                    .select("filename")
                    .collect()
                ]
                paths = [
                    f if f.startswith(("/", "file:", "hdfs:", "s3:"))
                    else f"{root}/{f}"
                    for f in selected
                ]
                if not paths:
                    sys.exit("cdx pruning selected zero archives for the keep-list")
                # file-level pruning + record-level url filter (binaryFile
                # reads whole selected files; --cdx-ranges reads spans)
                pages = read_warc(spark, paths).join(
                    keep_urls.select("url").distinct(), "url", "left_semi"
                )
        else:
            pages = read_warc(spark, args.input)
    elif fmt == "table" or (
        fmt == "auto"
        and not args.input.endswith((".parquet", "/"))
        and "/" not in args.input
    ):
        pages = spark.read.table(args.input)
    else:
        pages = spark.read.parquet(args.input)

    out = ParquetTableIO(args.output)
    metrics = ParquetTableIO(args.metrics) if args.metrics else None
    audit = ParquetTableIO(args.audit) if args.audit else None

    if args.previous:
        import os

        from pyspark.sql import functions as F

        from htmlx.spark.analytics import canonical_url_col, snapshot_diff

        def _keyed(df, ts):
            # snapshot_diff keys on canonical URL and compares content
            # digests; pages tables have no stable integer id, so the
            # per-side id is xxhash64(url). It is ONLY a tie-break /
            # display value — the delta join back to pages is on the url
            # STRING (below), never on this 64-bit hash, so a birthday
            # collision at 10^12 docs cannot misroute or drop rows.
            return df.select(
                "url", F.col("html").alias("body"),
                F.lit(ts).cast("long").alias("warc_ts"),
                F.xxhash64("url").alias("doc_id"),
            )

        prev = (
            spark.read.table(args.previous)
            if not args.previous.endswith((".parquet", "/")) and "/" not in args.previous
            else spark.read.parquet(args.previous)
        )
        diff = snapshot_diff(
            _keyed(prev, 1), _keyed(pages, 2), text_col="body"
        ).persist()
        os.makedirs(args.output, exist_ok=True)
        diff.write.mode("overwrite").parquet(
            os.path.join(args.output, "_snapshot_diff.parquet")
        )
        counts = {r["status"]: r["n"] for r in
                  diff.groupBy("status").agg(F.count("*").alias("n")).collect()}
        # Join the delta back on STRINGS, not the 64-bit hash: restrict
        # pages to the added/changed canonical URLs, then keep exactly
        # the row snapshot_diff kept (constant per-side ts, so the
        # latest-capture tie-break is argmin xxhash64(url) — the hash
        # orders candidates but never equates them). Only thin
        # (url, canonical_url) rows shuffle; the fat pages join is one
        # equi-join on the unique url string.
        delta_canon = diff.where(
            F.col("status").isin("added", "changed")
        ).select("canonical_url")
        kept_urls = (
            pages.select("url", canonical_url_col("url").alias("canonical_url"))
            .join(delta_canon, "canonical_url")
            .groupBy("canonical_url")
            .agg(F.min_by("url", F.xxhash64("url")).alias("url"))
            .select("url")
        )
        pages = pages.join(kept_urls, "url")
        print(f"incremental: {counts} -> extracting only added+changed")

    if args.fetch_plan:
        # execute the recrawl planner's politeness schedule as-is: keep
        # only this --fetch-window's urls (jobs/frontier.py assigns every
        # url a window so a host never exceeds its Crawl-delay quota per
        # round). The plan is frontier-sized; the join is one left_semi
        # on the unique url string.
        from pyspark.sql import functions as F

        plan = spark.read.parquet(args.fetch_plan)
        window_urls = (
            plan.where(F.col("fetch_window") == args.fetch_window)
            .select("url")
            .distinct()
        )
        pages = pages.join(window_urls, "url", "left_semi")
        print(f"fetch-plan: executing window {args.fetch_window} "
              f"of {args.fetch_plan}")

    if args.mode == "links":
        result = run_all_links(pages, Config(), run_id, args.partitions)
        result.write.mode("overwrite").parquet(out.data_dir)
    else:
        config = text_only_config() if args.mode == "text" else Config()
        run_with_resume(
            spark, pages, out, metrics, run_id,
            num_groups=args.groups, config=config,
            partitions_per_group=args.partitions, audit_out=audit,
        )
        if args.wet_output:
            # publish the run's extracted text as WET conversion
            # archives (the crawl ecosystem's derived-text format) —
            # read back from the COMMITTED results so a resume-completed
            # run publishes the full table, not just this run's delta
            from pyspark.sql import functions as F

            from htmlx.spark.warc import write_wet

            results = out.read(spark).where(F.col("error") == "")
            # RESULT_SCHEMA carries no timestamp; recover each url's
            # latest capture time from the pages frame so published
            # WET records carry real WARC-Date headers, not epoch 0
            ts_col = None
            if "warc_ts" in pages.columns:
                results = results.join(
                    pages.groupBy("url").agg(F.max("warc_ts").alias("warc_ts")),
                    "url", "left",
                )
                ts_col = "warc_ts"
            man = write_wet(
                results, args.wet_output, n_files=args.groups, ts_col=ts_col
            ).agg(
                F.sum("n_records").alias("r"), F.sum("n_bytes").alias("b")
            ).collect()[0]
            print(f"wet: {man['r']} records, {man['b']} bytes "
                  f"-> {args.wet_output}")
    print(f"run_id={run_id} done")


if __name__ == "__main__":
    main()
