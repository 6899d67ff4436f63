"""Inlink anchor-text aggregation (analytics.anchor_text_agg): the
corpus-level rollup of the extraction pipeline's link stage (reference
links.go collects href + anchor text per page; this aggregates the
endorsement signal per target host).

Pins: UTF-8 BYTE anchor lengths (Go len() convention), the cross-host
self-link filter (and its cross_host_only=False escape), NULL/whitespace
anchor accounting, host parsing (case + port folding), distinct-source
breadth, and the zero-Python no-join plan."""

import pytest

from htmlx.spark.analytics import anchor_text_agg
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-anchor-agg-test")
    yield s
    s.stop()


LINKS_SCHEMA = "src_url string, dst_url string, anchor_text string"


def _rows(df):
    return {r["dst_host"]: r.asDict() for r in df.collect()}


def test_aggregates_and_byte_semantics(spark):
    df = spark.createDataFrame(
        [
            # two src hosts -> t.com; one multibyte anchor (é = 2 bytes)
            ("https://a.com/x", "https://t.com/p", "résumé"),  # 8 bytes, 6 chars
            ("https://b.com/y", "https://t.com/p", "link"),  # 4 bytes
            ("https://a.com/z", "https://t.com/q", None),  # NULL -> 0 bytes, empty
            ("https://a.com/w", "https://t.com/r", "   "),  # whitespace-only -> empty
            # self-link: must be dropped by default
            ("https://t.com/self", "https://t.com/p", "me"),
            # other target, single source
            ("https://a.com/x", "https://u.com/p", "hi"),
        ],
        LINKS_SCHEMA,
    )
    out = _rows(anchor_text_agg(df))
    t = out["t.com"]
    assert t["n_inlinks"] == 4
    assert t["n_src_hosts"] == 2
    assert t["anchor_bytes"] == 8 + 4 + 0 + 3  # bytes, not chars
    assert t["n_empty_anchors"] == 2  # NULL + whitespace-only
    u = out["u.com"]
    assert (u["n_inlinks"], u["n_src_hosts"], u["anchor_bytes"]) == (1, 1, 2)


def test_cross_host_only_escape(spark):
    df = spark.createDataFrame(
        [
            ("https://t.com/a", "https://t.com/b", "nav"),
            ("https://a.com/x", "https://t.com/p", "ext"),
        ],
        LINKS_SCHEMA,
    )
    strict = _rows(anchor_text_agg(df))
    assert strict["t.com"]["n_inlinks"] == 1
    loose = _rows(anchor_text_agg(df, cross_host_only=False))
    assert loose["t.com"]["n_inlinks"] == 2
    assert loose["t.com"]["n_src_hosts"] == 2


def test_host_parse_case_and_port(spark):
    # HTTPS://A.COM:443 and https://a.com parse to the same src host;
    # dst host port is stripped too, so both rows land on one dst key.
    df = spark.createDataFrame(
        [
            ("HTTPS://A.COM:443/x", "https://t.com:8443/p", "one"),
            ("https://a.com/y", "https://T.COM/q", "two"),
        ],
        LINKS_SCHEMA,
    )
    out = _rows(anchor_text_agg(df))
    assert set(out) == {"t.com"}
    assert out["t.com"]["n_inlinks"] == 2
    assert out["t.com"]["n_src_hosts"] == 1


def test_plan_no_python_no_join(spark):
    df = spark.createDataFrame(
        [("https://a.com/x", "https://t.com/p", "hi")], LINKS_SCHEMA
    )
    plan = anchor_text_agg(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    # one shuffle for the group-by; the distinct-source count may add the
    # two-phase (dst, src) partial exchange — never more
    assert plan.count("Exchange hashpartitioning") <= 2
