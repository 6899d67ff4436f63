"""spark-submit entry point for building a CDX capture index.

  spark-submit --py-files htmlx.zip jobs/cdx.py \
      --input <.warc/.warc.gz archives (file, dir, or glob)> \
      --output <CDXJ index root> \
      [--record-types response[,conversion,...]]

Index once, prune every job after: the CDXJ output (cc-index line
format, `SURT ts14 {json}`) is what jobs/extract.py consumes via
--cdx/--cdx-urls [--cdx-ranges] to read only the archives — or only
the record byte ranges — that contain wanted captures. One
header-only pass per archive (no payload inflation, no HTML decode);
parallelism = archive count, the same binaryFile layout read_warc
uses. See htmlx/spark/warc.py (cdx_from_warc / write_cdxj).
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--record-types", default="response",
                    help="comma-separated WARC-Type values to index "
                         "(default: response; WET text archives use "
                         "conversion)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from htmlx.spark.warc import cdx_from_warc, write_cdxj

    spark = SparkSession.builder.appName("htmlx-cdx").getOrCreate()
    types = tuple(t.strip() for t in args.record_types.split(",") if t.strip())
    cdx = cdx_from_warc(spark, args.input, record_types=types)
    write_cdxj(cdx, args.output)
    # summary from the WRITTEN index (reading it back also smoke-checks
    # the round trip) — a tiny aggregate, not a data collect
    from htmlx.spark.warc import read_cdx

    stats = read_cdx(spark, args.output).agg(
        F.count(F.lit(1)).alias("records"),
        F.countDistinct("filename").alias("archives"),
    ).collect()[0]
    print(f"indexed {stats['records']} records from "
          f"{stats['archives']} archives -> {args.output}")


if __name__ == "__main__":
    main()
