"""Incremental extraction (jobs/extract.py --previous): only pages whose
canonical URL is new or whose html digest changed are re-extracted; the
per-URL delta classification lands at <output>/_snapshot_diff.parquet.
Drives the REAL CLI main() over parquet snapshots."""

import shutil
import sys

import pytest

from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-incremental-test")
    yield s
    s.stop()


def _page(body):
    return bytearray(
        "<html><head><title>T</title></head><body><article><h1>T</h1>"
        f"<p>{body}</p></article></body></html>", "utf-8",
    )


def test_incremental_delta_only(spark, tmp_path):
    import jobs.extract as je

    old = [
        ("https://a.com/keep", _page("stable body words here for scoring")),
        ("https://a.com/edit", _page("old body version with words")),
        ("https://a.com/gone", _page("to be removed")),
    ]
    new = [
        ("https://a.com/keep", _page("stable body words here for scoring")),
        ("https://a.com/edit", _page("NEW body version with words")),
        ("https://a.com/born", _page("freshly added page body words")),
    ]
    op, np_, out = tmp_path / "old", tmp_path / "new", tmp_path / "out"
    spark.createDataFrame(old, "url string, html binary").write.parquet(str(op))
    spark.createDataFrame(new, "url string, html binary").write.parquet(str(np_))
    argv = sys.argv
    try:
        sys.argv = ["extract.py", "--input", str(np_), "--output", str(out),
                    "--previous", str(op), "--run-id", "inc1", "--groups", "4"]
        je.main()
    finally:
        sys.argv = argv
    diff = {r["canonical_url"]: r["status"] for r in
            spark.read.parquet(str(out / "_snapshot_diff.parquet")).collect()}
    assert diff == {
        "https://a.com/keep": "unchanged", "https://a.com/edit": "changed",
        "https://a.com/gone": "removed", "https://a.com/born": "added",
    }
    rows = {r["url"]: r["text"] for r in
            spark.read.parquet(str(out / "data")).collect()}
    assert sorted(rows) == ["https://a.com/born", "https://a.com/edit"]
    assert "NEW body version" in rows["https://a.com/edit"]


def test_incremental_canonical_dup_joins_on_url_string(spark, tmp_path):
    """Two raw urls sharing one canonical URL: the delta join back to
    pages is on the url STRING (never xxhash64 equality — collision-unsafe
    at 1e12 docs), and exactly the row snapshot_diff kept (constant
    per-side ts, argmin-xxhash64 tie-break) is extracted."""
    import jobs.extract as je
    from pyspark.sql import functions as F

    dup_urls = ["https://a.com/edit", "https://a.com/edit?utm_source=x"]
    old = [("https://a.com/keep", _page("stable body words here for scoring"))]
    new = [("https://a.com/keep", _page("stable body words here for scoring"))] + [
        (u, _page("fresh canonical-dup body words")) for u in dup_urls
    ]
    op, np_, out = tmp_path / "old", tmp_path / "new", tmp_path / "out"
    spark.createDataFrame(old, "url string, html binary").write.parquet(str(op))
    spark.createDataFrame(new, "url string, html binary").write.parquet(str(np_))
    argv = sys.argv
    try:
        sys.argv = ["extract.py", "--input", str(np_), "--output", str(out),
                    "--previous", str(op), "--run-id", "inc2", "--groups", "4"]
        je.main()
    finally:
        sys.argv = argv
    diff = {r["canonical_url"]: r["status"] for r in
            spark.read.parquet(str(out / "_snapshot_diff.parquet")).collect()}
    assert diff == {"https://a.com/keep": "unchanged",
                    "https://a.com/edit": "added"}
    kept = (
        spark.createDataFrame([(u,) for u in dup_urls], "url string")
        .agg(F.min_by("url", F.xxhash64("url")).alias("u"))
        .collect()[0]["u"]
    )
    rows = [r["url"] for r in spark.read.parquet(str(out / "data")).collect()]
    assert rows == [kept]
