"""URL canonicalization + latest-capture recrawl dedup
(analytics.canonical_url_col / latest_capture).

The rule set is the conservative crawl-dedup subset: case-fold scheme and
host, strip fragments, drop default ports, collapse a bare '/' path, drop
tracking params, sort the rest. Nothing that could change which resource
the URL names (no %-decoding, no path collapsing) — pinned here case by
case, plus the keep-newest-capture semantics."""

import pytest

from htmlx.spark.analytics import canonical_url_col, latest_capture
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-url-canon-test")
    yield s
    s.stop()


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonical_url_col("url")).collect()]


CASES = [
    # (raw, canonical)
    ("https://Example.COM/a", "https://example.com/a"),
    ("HTTPS://example.com:443/a", "https://example.com/a"),
    ("http://example.com:80/a", "http://example.com/a"),
    # non-default port survives
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    # :443 is only default for https
    ("http://example.com:443/a", "http://example.com:443/a"),
    ("https://example.com/a#section-2", "https://example.com/a"),
    ("https://example.com/", "https://example.com"),
    # a non-bare path keeps its trailing slash (resource-changing)
    ("https://example.com/a/", "https://example.com/a/"),
    ("https://example.com/a?b=2&a=1", "https://example.com/a?a=1&b=2"),
    ("https://example.com/a?utm_source=x&a=1", "https://example.com/a?a=1"),
    ("https://example.com/a?utm_campaign=y&utm_source=x", "https://example.com/a"),
    ("https://example.com/a?fbclid=abc&gclid=def&z=1", "https://example.com/a?z=1"),
    # empty query marker drops
    ("https://example.com/a?", "https://example.com/a"),
    # %-encoding and case inside the path are preserved verbatim
    ("https://example.com/A%20b?x=%2F", "https://example.com/A%20b?x=%2F"),
    # not absolute URLs: passed through verbatim, never collapsed onto a
    # shared degenerate key
    ("not a url", "not a url"),
    ("/relative/path?b=1", "/relative/path?b=1"),
    ("", ""),
]


def test_malformed_urls_stay_distinct(spark):
    got = _canon(spark, ["garbage one", "garbage two", "://", ""])
    assert len(set(got)) == 4


def test_canonicalization_cases(spark):
    got = _canon(spark, [raw for raw, _ in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw!r} -> {g!r}, want {want!r}"


def test_equal_pages_collide_distinct_pages_dont(spark):
    a = _canon(spark, [
        "https://News.example.com:443/story/77?b=2&a=1#top",
        "https://news.example.com/story/77?utm_source=rss&a=1&b=2",
    ])
    assert a[0] == a[1] == "https://news.example.com/story/77?a=1&b=2"
    b = _canon(spark, [
        "https://news.example.com/story/77?a=1",
        "https://news.example.com/story/78?a=1",
        "http://news.example.com/story/77?a=1",  # scheme differs
    ])
    assert len(set(b)) == 3


def test_latest_capture_keeps_newest(spark):
    rows = [
        # three captures of one page under cosmetic variants
        (1, "https://a.com/p?x=1", 100),
        (2, "https://A.COM:443/p?utm_source=t&x=1", 300),
        (3, "https://a.com/p?x=1#frag", 200),
        # a singleton
        (4, "https://a.com/other", 50),
        # tie on ts -> smallest doc_id wins
        (5, "https://b.com/q", 70),
        (6, "https://B.com/q", 70),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts long")
    out = {r["canonical_url"]: r for r in latest_capture(df).collect()}
    assert out["https://a.com/p?x=1"]["keep_id"] == 2
    assert out["https://a.com/p?x=1"]["n_captures"] == 3
    assert out["https://a.com/other"]["keep_id"] == 4
    assert out["https://b.com/q"]["keep_id"] == 5
    assert out["https://b.com/q"]["n_captures"] == 2


def test_all_catalyst_single_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "https://a.com/p", 1)], "doc_id long, url string, warc_ts long"
    )
    plan = latest_capture(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # one exchange: the canonical-url hash aggregate
    assert plan.count("Exchange") <= 1


def test_canonicalization_idempotent_and_total(spark):
    """canon(canon(u)) == canon(u): a dedup key must be a fixpoint, or
    re-running the pipeline over already-canonical URLs would re-bucket
    rows. Checked over structured randoms + garbage; also pins totality
    (no expression error on any input)."""
    import random

    rng = random.Random(11)
    urls = []
    for _ in range(300):
        kind = rng.randrange(6)
        if kind == 0:
            urls.append("".join(rng.choice(" abc:/?#&=%ÃÂ.") for _ in range(rng.randrange(30))))
        else:
            scheme = rng.choice(["http", "HTTPS", "ftp", "a+b-c"])
            host = rng.choice(["Example.COM", "x.y.z", "h0st:8080", "h:443", ""])
            path = rng.choice(["", "/", "/a/b", "/A%20b/", "//double"])
            q = "&".join(
                rng.choice(["a=1", "b=2", "utm_source=x", "fbclid=1", "", "z"])
                for _ in range(rng.randrange(4))
            )
            frag = rng.choice(["", "#f", "#a?b=1"])
            urls.append(f"{scheme}://{host}{path}" + (f"?{q}" if q else "") + frag)
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    for u, a, b in zip(urls, once, twice):
        assert a == b, f"not a fixpoint: {u!r} -> {a!r} -> {b!r}"
