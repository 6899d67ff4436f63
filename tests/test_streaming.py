"""Structured Streaming extraction — availableNow trigger over a parquet
file source, results appended per micro-batch (htmlx/spark/streaming.py)."""

import os

import pytest

from htmlx.core.extract import Config
from htmlx.spark.job import run_extraction
from htmlx.spark.pages import pages_from_documents
from htmlx.spark.session import get_spark
from htmlx.spark.streaming import read_pages_stream, start_extraction_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-stream-test")
    yield s
    s.stop()


def test_streaming_matches_batch(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("stream"))
    pages_dir = os.path.join(root, "pages")
    out_dir = os.path.join(root, "out")
    ckpt_dir = os.path.join(root, "ckpt")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    pages = pages_from_documents(docs, "text")
    pages.repartition(4).write.parquet(pages_dir)

    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    q = start_extraction_stream(stream, out_dir, ckpt_dir, Config(), available_now=True)
    q.awaitTermination(120)

    got = {(r.url, r.text) for r in spark.read.parquet(out_dir).select("url", "text").collect()}
    want = {
        (r.url, r.text)
        for r in run_extraction(spark.read.parquet(pages_dir), Config()).select("url", "text").collect()
    }
    assert got == want
    assert len(got) == 50


def test_stateful_host_stats(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from htmlx.spark.streaming import host_stats_stream

    root = str(tmp_path_factory.mktemp("hostcustomers"))
    pages_dir = os.path.join(root, "pages")
    out_dir = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    pages_from_documents(docs, "text").repartition(4).write.parquet(pages_dir)

    stream = read_pages_stream(spark, pages_dir, max_files_per_trigger=2)
    stats = host_stats_stream(stream)
    # memory sink: parquet doesn't support update mode
    q = (
        stats.writeStream.outputMode("update")
        .format("memory")
        .queryName("hoststats")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # final state per host = totals from the batch table
    got = {
        r.host: (r.docs, r.bytes)
        for r in spark.sql(
            "SELECT host, max(docs) AS docs, max(bytes) AS bytes FROM hoststats GROUP BY host"
        ).collect()
    }
    pages = spark.read.parquet(pages_dir)
    want = {
        r.host: (r.docs, r.bytes)
        for r in pages.withColumn("host", F.regexp_extract("url", r"^https?://([^/]+)", 1))
        .groupBy("host")
        .agg(F.count("*").alias("docs"), F.sum(F.length("html")).alias("bytes"))
        .collect()
    }
    assert got == want
    assert len(got) >= 2
