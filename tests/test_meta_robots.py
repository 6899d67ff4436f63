"""Meta-robots compliance pre-filter (analytics.meta_robots): raw-byte
regex over the page head, run scan-side before extraction.

Pins: quoted/unquoted/case variants, attribute order flips, the 'none'
shorthand, exact-token name matching ('robotsish' must NOT match),
directive whitespace tolerance, the head_bytes bound, binary-column
input, and the zero-shuffle zero-Python plan."""

import pytest

from htmlx.spark.analytics import meta_robots
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-meta-robots-test")
    yield s
    s.stop()


def _run(spark, pages, **kw):
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "doc_id long, html string"
    )
    return {r["doc_id"]: r.asDict() for r in meta_robots(df, **kw).collect()}


def _page(meta):
    return f"<html><head><title>t</title>{meta}</head><body><p>x</p></body></html>"


def test_variants(spark):
    out = _run(spark, [
        _page('<meta name="robots" content="noindex, follow">'),       # 0
        _page("<meta NAME=ROBOTS CONTENT='NOFOLLOW'>"),                # 1
        _page("<meta content='none' name='robots'>"),                  # 2 flipped
        _page('<meta name="robots" content=noindex,nofollow>'),        # 3 unquoted
        _page('<meta name="description" content="noindex">'),          # 4 not robots
        _page(""),                                                     # 5 no meta
        _page('<meta name="robotsish" content="noindex">'),            # 6 token bound
        _page('<meta name=robots content=" NOINDEX , NOFOLLOW ">'),    # 7 ws+case
        _page('<meta name=robots>'),                                   # 8 no content
    ])
    assert (out[0]["noindex"], out[0]["nofollow"]) == (True, False)
    assert (out[1]["noindex"], out[1]["nofollow"]) == (False, True)
    assert (out[2]["noindex"], out[2]["nofollow"]) == (True, True)
    assert (out[3]["noindex"], out[3]["nofollow"]) == (True, True)
    for i in (4, 5, 6):
        assert out[i]["robots_content"] is None
        assert (out[i]["noindex"], out[i]["nofollow"]) == (False, False)
        assert out[i]["keep"] is True
    assert (out[7]["noindex"], out[7]["nofollow"]) == (True, True)
    assert out[7]["robots_content"] == " noindex , nofollow "
    assert (out[8]["noindex"], out[8]["nofollow"]) == (False, False)
    assert out[8]["robots_content"] == ""  # tag present, empty directives
    assert out[0]["keep"] is False and out[1]["keep"] is True


def test_head_bytes_bound(spark):
    far = "<html><head>" + "x" * 70000 + \
        '<meta name="robots" content="noindex"></head><body></body></html>'
    near = _page('<meta name="robots" content="noindex">')
    out = _run(spark, [far, near])
    assert out[0]["keep"] is True   # beyond the 64 KB contract: ignored
    assert out[1]["keep"] is False


def test_binary_column_input(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_page('<meta name=robots content=noindex>'),
                       "utf-8"))],
        "doc_id long, html binary",
    )
    r = meta_robots(df).collect()[0]
    assert r["noindex"] is True and r["keep"] is False


def test_plan_scan_side(spark):
    df = spark.createDataFrame([(1, "<html></html>")], "doc_id long, html string")
    plan = meta_robots(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_multiple_robots_tags_union(spark):
    """Directives union across ALL robots meta tags (r6 ADVICE fix):
    real CMSes emit split tags (one noindex, one nofollow); crawlers OR
    them. robots_content joins tag contents in document order."""
    out = _run(spark, [
        _page('<meta name="robots" content="noindex">'
              '<meta name="robots" content="nofollow">'),               # 0 split
        _page('<meta name=robots content=follow>'
              "<meta content='none' name='robots'>"),                   # 1 2nd tag none
        _page('<meta name="robots" content="noindex">'
              '<meta name="description" content="nofollow">'),          # 2 only 1 robots
    ])
    assert (out[0]["noindex"], out[0]["nofollow"]) == (True, True)
    assert out[0]["robots_content"] == "noindex,nofollow"
    assert out[0]["keep"] is False
    assert (out[1]["noindex"], out[1]["nofollow"]) == (True, True)
    assert out[1]["robots_content"] == "follow,none"
    assert (out[2]["noindex"], out[2]["nofollow"]) == (True, False)
    assert out[2]["robots_content"] == "noindex"
