"""spark-submit entry point for the WET extraction A/B.

  spark-submit --py-files htmlx.zip jobs/wetab.py \
      --results <extraction results parquet (url, text)> \
      --wet <WET archives dir (.warc.wet/.warc.wet.gz)> \
      --output <report root>

Compares this engine's extracted text against the crawl's published
WET text per url (char-multiset F1 + length ratio, full-outer so
coverage gaps are findings) and writes
<output>/per_url.parquet plus <output>/report.parquet (the one-row
coverage/distribution summary a crawl A/B dashboard ingests). The
compact report is also printed. See analytics.wet_ab_compare /
wet_ab_report and warc.read_wet.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True,
                    help="extraction results parquet with url + text columns")
    ap.add_argument("--wet", required=True,
                    help=".warc.wet/.warc.wet.gz dir — the crawl's own text")
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    import json
    import os

    from pyspark.sql import SparkSession

    from htmlx.spark.analytics import wet_ab_compare, wet_ab_report
    from htmlx.spark.warc import read_wet

    spark = SparkSession.builder.appName("htmlx-wetab").getOrCreate()
    results = spark.read.parquet(args.results).select("url", "text")
    wet = read_wet(spark, args.wet)
    os.makedirs(args.output, exist_ok=True)
    wet_ab_compare(results, wet).write.mode("overwrite").parquet(
        os.path.join(args.output, "per_url.parquet")
    )
    report = wet_ab_report(results, wet)
    report.write.mode("overwrite").parquet(
        os.path.join(args.output, "report.parquet")
    )
    row = report.collect()[0].asDict()
    print(json.dumps(row, default=str))


if __name__ == "__main__":
    main()
