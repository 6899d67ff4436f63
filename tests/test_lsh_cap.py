"""LSH mega-bucket cap: k near-identical docs sharing every band would emit
k²/2 pairs without the cap (VERDICT r1 #5/#7). With the cap the pair
expansion stays linear and normal-corpus results are unchanged."""

import time

import pytest

from pyspark.sql import functions as F

from htmlx.spark.analytics import lsh_bucket_stats, minhash_lsh_candidates
from htmlx.spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-lshcap-test")
    yield s
    s.stop()


def test_mega_bucket_capped_completes_linearly(spark):
    # 10k IDENTICAL docs -> one bucket of 10k per band -> 400M pairs uncapped.
    # With the cap the whole bucket is dropped and the job is instant.
    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("boilerplate only page with no unique content at all").alias("text"),
    )
    t0 = time.monotonic()
    out = minhash_lsh_candidates(docs, max_bucket_size=64)
    assert out.count() == 0  # the mega-bucket is dropped, not expanded
    assert time.monotonic() - t0 < 60

    stats = lsh_bucket_stats(docs, max_bucket_size=64).first()
    assert stats.dropped_buckets >= 1
    assert stats.max_bucket == n


def test_cap_does_not_change_normal_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    capped = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_candidates(docs, max_bucket_size=1024).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_candidates(docs, max_bucket_size=None).collect()
    }
    assert capped == uncapped and len(capped) > 0
