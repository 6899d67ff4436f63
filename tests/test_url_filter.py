"""URL filtering (analytics.url_filter): RefinedWeb/UT1-style blocklist +
keyword + structural rules with first-match reason precedence
(bad_scheme > url_too_long > blocked_host > blocked_keyword > kept).

Pins the label-boundary suffix semantics ('b.com' blocks 'a.b.com' but
NOT 'notb.com'), case/port folding on both the URL host and the
blocklist entries, the 2000-UTF-8-byte cap, and the all-Catalyst
broadcast-only plan."""

import pytest

from htmlx.spark.analytics import url_filter
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-url-filter-test")
    yield s
    s.stop()


def _run(spark, rows, bl_hosts):
    df = spark.createDataFrame(rows, "doc_id long, url string")
    bl = spark.createDataFrame([(h,) for h in bl_hosts], "host string")
    return {r["doc_id"]: (r["reason"], r["keep"]) for r in url_filter(df, bl).collect()}


def test_reasons_and_precedence(spark):
    out = _run(
        spark,
        [
            (1, "https://a.blocked.example.com/page"),
            (2, "https://blocked.example.com/x"),
            (3, "https://notblocked.example.com/x"),  # label boundary
            (4, "ftp://files.example.com/x"),
            (5, "https://ok.example.com/" + "a" * 2100),
            (6, "https://ok.example.com/free-casino-chips"),
            (7, "https://ok.example.com/article"),
            (8, "https://BLOCKED.EXAMPLE.COM:443/x"),  # case + port folds
            (9, "https://sub.example.org/x"),  # blocklist entry case-folds
            # precedence: scheme beats blocklist beats keyword
            (10, "ftp://blocked.example.com/xxx"),
            (11, "https://blocked.example.com/xxx"),
        ],
        ["blocked.example.com", "EXAMPLE.ORG"],
    )
    assert out[1] == ("blocked_host", False)
    assert out[2] == ("blocked_host", False)
    assert out[3] == ("kept", True)
    assert out[4] == ("bad_scheme", False)
    assert out[5] == ("url_too_long", False)
    assert out[6] == ("blocked_keyword", False)
    assert out[7] == ("kept", True)
    assert out[8] == ("blocked_host", False)
    assert out[9] == ("blocked_host", False)
    assert out[10] == ("bad_scheme", False)
    assert out[11] == ("blocked_host", False)


def test_byte_cap_is_utf8_bytes(spark):
    # 700 three-byte chars = 2100 bytes but only ~720 chars: must trip the cap
    long_utf8 = "https://ok.example.com/" + "€" * 700
    out = _run(spark, [(1, long_utf8)], ["unused.example"])
    assert out[1] == ("url_too_long", False)


def test_all_catalyst_broadcast_only(spark):
    df = spark.createDataFrame([(1, "https://a.com/p")], "doc_id long, url string")
    bl = spark.createDataFrame([("b.com",)], "host string")
    plan = url_filter(df, bl)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # the single-row blocklist array arrives via broadcast, never a shuffle
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
