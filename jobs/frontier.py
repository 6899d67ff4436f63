"""spark-submit entry point for recrawl-frontier planning.

  spark-submit --py-files htmlx.zip jobs/frontier.py \
      --input <pages table/parquet (url, warc_ts, html, ...)> \
      --output <fetch-plan root> \
      [--user-agent '*'] [--window 3600] [--default-delay 1.0] \
      [--cdx-previous <prior crawl CDXJ> --cdx-current <current CDXJ>]

The full crawl-planning chain, derived ENTIRELY from a crawl's own
captures — no side inputs:

  1. robots_table_from_pages: per-host robots.txt (latest capture,
     fetch status kept for the fail-closed policy);
  2. sitemap discovery: `Sitemap:` directives from those robots files,
     plus any sitemap XML already captured in the pages table;
  3. sitemap_entries -> sitemap_frontier: site-listed URLs not yet
     crawled (kind='url'), with max(lastmod) for recrawl priority, and
     the uncaptured sub-sitemaps (kind='sitemap') reported separately;
  4. robots_filter over the frontier (RFC 9309 longest-match, 5xx
     fail-closed) — a frontier URL a site disallows is never planned;
  5. host_fetch_quota: Crawl-delay politeness slots per host per
     scheduling window (deterministic assignment; priority-ordered, so
     urgent rows take the early slots and windows).

With --cdx-previous/--cdx-current, the two crawl indexes diff at INDEX
cost (warc.cdx_snapshot_delta — no archive bytes) and fold into the
plan: priority 0 = site-listed never-captured urls, 1 = changed
captures (proven drift), 2 = added captures; unchanged/removed urls
are never planned.

Output: <output>/fetch_plan.parquet (url, lastmod, priority,
plan_source, host, crawl_delay, fetch_rank, scheduled, fetch_window,
robots_allowed) — fetch_window assigns EVERY url a politeness window,
so jobs/extract.py --fetch-plan can execute the plan window by window —
and <output>/sitemaps_to_fetch.parquet (sub-sitemaps + discovered
sitemap URLs not present in the pages table). 100 TB plan: everything
here is scan-side parses, host-bounded Python, host-keyed joins of
per-host tables, and one per-host window over the frontier (frontier
volume, not corpus volume).
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--user-agent", default="*")
    ap.add_argument("--window", type=float, default=3600.0,
                    help="scheduling window in seconds (politeness slots "
                         "= floor(window / crawl_delay) per host)")
    ap.add_argument("--default-delay", type=float, default=1.0,
                    help="politeness floor in seconds for hosts without "
                         "a Crawl-delay")
    ap.add_argument("--cdx-previous", default=None,
                    help="the PRIOR crawl's CDXJ index: diff against "
                         "--cdx-current (cdx_snapshot_delta, index cost "
                         "only) and fold changed/added captures into the "
                         "plan — unchanged urls are never planned")
    ap.add_argument("--cdx-current", default=None,
                    help="the CURRENT crawl's CDXJ index (required with "
                         "--cdx-previous)")
    args = ap.parse_args()
    if bool(args.cdx_previous) != bool(args.cdx_current):
        ap.error("--cdx-previous and --cdx-current go together")

    import os

    from pyspark.sql import SparkSession, functions as F

    from htmlx.spark.analytics import (
        sitemap_entries,
        sitemap_frontier,
        sitemap_urls_from_robots,
    )
    from htmlx.spark.robotstxt import (
        host_fetch_quota,
        robots_crawl_delay,
        robots_filter,
        robots_table_from_pages,
    )

    spark = SparkSession.builder.appName("htmlx-frontier").getOrCreate()
    pages = spark.read.parquet(args.input)

    path = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.col("url"), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
            ),
            F.lit(""),
        ),
        F.lit("/"),
    )
    robots_tbl = robots_table_from_pages(
        pages.where(path == "/robots.txt"),
        status_col="http_status" if "http_status" in pages.columns else None,
        ts_col="warc_ts" if "warc_ts" in pages.columns else None,
    )
    entries = sitemap_entries(pages)
    # priority 0: site-listed urls never captured; the CDX delta (when
    # given) appends 1: changed captures (proven content drift — recrawl)
    # and 2: added captures (fresh this crawl — lowest urgency).
    # unchanged/removed urls are never planned: the whole point of
    # deciding the recrawl at INDEX cost (cdx_snapshot_delta reads no
    # archive bytes).
    frontier = sitemap_frontier(entries, pages).select(
        "url", "lastmod",
        F.lit(0).cast("long").alias("priority"),
        F.lit("uncrawled").alias("plan_source"),
    )
    if args.cdx_previous:
        from htmlx.spark.warc import cdx_snapshot_delta, read_cdx

        delta = cdx_snapshot_delta(
            read_cdx(spark, args.cdx_previous), read_cdx(spark, args.cdx_current)
        ).where(F.col("status").isin("changed", "added"))
        recrawl = delta.select(
            "url",
            F.lit(None).cast("timestamp").alias("lastmod"),
            F.when(F.col("status") == "changed", F.lit(1))
            .otherwise(F.lit(2))
            .cast("long")
            .alias("priority"),
            F.col("status").alias("plan_source"),
        )
        # a url both site-listed and in the delta keeps its most urgent
        # (minimum) priority row
        frontier = (
            frontier.unionByName(recrawl)
            .groupBy("url")
            .agg(
                F.max("lastmod").alias("lastmod"),
                F.min(F.struct("priority", "plan_source")).alias("p"),
            )
            .select("url", "lastmod", F.col("p.priority").alias("priority"),
                    F.col("p.plan_source").alias("plan_source"))
        )

    allowed = robots_filter(
        frontier.withColumn("doc_id", F.xxhash64("url")),
        robots_tbl,
        user_agent=args.user_agent,
        status_col="status",
    ).select("url", "robots_allowed")
    plan = host_fetch_quota(
        frontier.join(allowed, "url").where(F.col("robots_allowed")),
        robots_crawl_delay(robots_tbl, user_agent=args.user_agent),
        window_s=args.window,
        default_delay=args.default_delay,
        priority_col="priority",
    )
    os.makedirs(args.output, exist_ok=True)
    plan_path = os.path.join(args.output, "fetch_plan.parquet")
    plan.write.mode("overwrite").parquet(plan_path)

    # sub-sitemaps listed by index files + robots-discovered sitemap
    # URLs, minus those already captured: the next sitemap fetch round
    listed = entries.where(F.col("kind") == "sitemap").select(
        F.col("loc").alias("url")
    )
    discovered = sitemap_urls_from_robots(robots_tbl).select(
        F.col("sitemap_url").alias("url")
    )
    to_fetch = (
        listed.unionByName(discovered)
        .distinct()
        .join(pages.select("url").distinct(), "url", "left_anti")
    )
    to_fetch.write.mode("overwrite").parquet(
        os.path.join(args.output, "sitemaps_to_fetch.parquet")
    )

    n = plan.count()
    n_sched = plan.where("scheduled").count()
    print(f"frontier: {n} allowed urls, {n_sched} scheduled this window "
          f"-> {plan_path}")


if __name__ == "__main__":
    main()
