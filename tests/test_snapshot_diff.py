"""Crawl snapshot diff (analytics.snapshot_diff): per canonical URL,
added/removed/changed/unchanged between two crawl snapshots, each side
collapsed to its latest capture first (max warc_ts, ties to smallest
doc_id — the latest_capture rule).

Pins: the four statuses, within-snapshot recrawl collapse (the OLDER
capture's text must NOT drive the diff), cosmetic-URL canonicalization
joining the two sides, and the zero-Python plan."""

import pytest

from htmlx.spark.analytics import snapshot_diff
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-snapshot-diff-test")
    yield s
    s.stop()


SCHEMA = "doc_id long, url string, text string, warc_ts long"


def _run(spark, old_rows, new_rows):
    o = spark.createDataFrame(old_rows, SCHEMA)
    n = spark.createDataFrame(new_rows, SCHEMA)
    return {
        r["canonical_url"]: r.asDict() for r in snapshot_diff(o, n).collect()
    }


def test_four_statuses(spark):
    old = [
        (1, "https://a.com/keep", "same", 10),
        (2, "https://a.com/edit", "before", 10),
        (3, "https://a.com/gone", "bye", 10),
    ]
    new = [
        (11, "https://a.com/keep", "same", 20),
        (12, "https://a.com/edit", "after", 20),
        (14, "https://a.com/new", "hello", 20),
    ]
    out = _run(spark, old, new)
    assert out["https://a.com/keep"]["status"] == "unchanged"
    assert out["https://a.com/edit"]["status"] == "changed"
    assert out["https://a.com/gone"]["status"] == "removed"
    assert out["https://a.com/gone"]["new_doc_id"] is None
    assert out["https://a.com/new"]["status"] == "added"
    assert out["https://a.com/new"]["old_doc_id"] is None
    assert out["https://a.com/keep"]["old_doc_id"] == 1
    assert out["https://a.com/keep"]["new_doc_id"] == 11


def test_latest_capture_within_snapshot_drives_diff(spark):
    # old snapshot holds TWO captures of the same url; the newest (ts=15,
    # text 'v2') is the one compared — so vs new 'v2' it's unchanged,
    # even though the older capture differs.
    old = [
        (1, "https://a.com/p", "v1", 10),
        (2, "https://a.com/p", "v2", 15),
    ]
    new = [(21, "https://a.com/p", "v2", 30)]
    out = _run(spark, old, new)
    assert out["https://a.com/p"]["status"] == "unchanged"
    assert out["https://a.com/p"]["old_doc_id"] == 2


def test_cosmetic_url_variants_join(spark):
    # the same logical page under HTTPS://HOST:443 + utm param on one
    # side and the clean form on the other must land on ONE row.
    old = [(1, "HTTPS://A.COM:443/p?utm_source=x", "body", 10)]
    new = [(2, "https://a.com/p", "body", 20)]
    out = _run(spark, old, new)
    assert list(out) == ["https://a.com/p"]
    assert out["https://a.com/p"]["status"] == "unchanged"


def test_plan_no_python(spark):
    o = spark.createDataFrame([(1, "https://a.com/p", "x", 1)], SCHEMA)
    n = spark.createDataFrame([(2, "https://a.com/p", "x", 2)], SCHEMA)
    plan = snapshot_diff(o, n)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
