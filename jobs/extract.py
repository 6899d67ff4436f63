"""spark-submit entry point for the extraction pipeline.

  spark-submit --py-files htmlx.zip jobs/extract.py \
      --input <pages table/parquet path> --output <results root> \
      [--metrics <metrics root>] [--run-id RID] [--groups 64] \
      [--mode extract|links|text] [--partitions N]

Reads the Common-Crawl-style pages table (url, warc_ts, html, text, lang),
runs the extraction engine with checkpointed resume (url-hash groups; each
group's append is one atomic commit), and writes results + per-partition
metrics. Re-running with the same --run-id skips committed groups.
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
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from htmlx.core.extract import Config, text_only_config
    from htmlx.spark.io import ParquetTableIO, run_with_resume
    from htmlx.spark.job import run_all_links

    spark = SparkSession.builder.appName("htmlx-extract").getOrCreate()
    run_id = args.run_id or uuid.uuid4().hex[:12]
    pages = (
        spark.read.table(args.input) if not args.input.endswith((".parquet", "/")) and "/" not in args.input
        else spark.read.parquet(args.input)
    )

    out = ParquetTableIO(args.output)
    metrics = ParquetTableIO(args.metrics) if args.metrics else None
    audit = ParquetTableIO(args.audit) if args.audit else None

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
    print(f"run_id={run_id} done")


if __name__ == "__main__":
    main()
