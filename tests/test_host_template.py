"""Per-host template-line removal (analytics.host_template_lines): the
corpus-level intra-site boilerplate pass (RefinedWeb/Dolma-style) that
complements the per-document DOM boilerplate strip — a line present in
>= min_frac of a host's docs (and >= min_docs) is removed from EVERY doc
of that host (zero copies kept, unlike paragraph dedup's keep-one).

Pins: the frequency rule on distinct docs, the min_docs floor on tiny
hosts, host isolation (the same line on another host survives), blank
lines never being template candidates, all-copies removal of within-doc
repeats, and the zero-Python cleaning plan."""

import pytest

from htmlx.spark.analytics import host_template_lines
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-host-template-test")
    yield s
    s.stop()


SCHEMA = "doc_id long, url string, text string"


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {r["doc_id"]: r.asDict() for r in host_template_lines(df, **kw).collect()}


def test_template_removed_from_every_doc(spark):
    rows = [
        (1, "https://a.com/1", "NAV\nunique one"),
        (2, "https://a.com/2", "NAV\nunique two"),
        (3, "https://a.com/3", "NAV\nunique three"),
        (4, "https://a.com/4", "NAV\nunique four\nNAV"),  # within-doc repeat
    ]
    out = _run(spark, rows)
    assert out[1]["cleaned_text"] == "unique one"
    assert out[1]["n_removed"] == 1 and out[1]["n_lines"] == 2
    # within-doc repeat: counted once for frequency, ALL copies removed
    assert out[4]["cleaned_text"] == "unique four"
    assert out[4]["n_removed"] == 2


def test_min_docs_floor_and_host_isolation(spark):
    rows = [
        # tiny host: 2/2 docs share DUP but min_docs=3 -> kept
        (1, "https://tiny.com/1", "DUP\nalpha"),
        (2, "https://tiny.com/2", "DUP\nbeta"),
        # big host where NAV is template; the same NAV text lives on
        # tiny.com? no — host isolation: NAV only template on big.com
        (3, "https://big.com/1", "NAV\na"),
        (4, "https://big.com/2", "NAV\nb"),
        (5, "https://big.com/3", "NAV\nc"),
        (6, "https://other.com/1", "NAV\nsolo"),  # 1/1 but min_docs=3
    ]
    out = _run(spark, rows)
    assert out[1]["cleaned_text"] == "DUP\nalpha" and out[1]["n_removed"] == 0
    assert out[3]["cleaned_text"] == "a"
    assert out[6]["cleaned_text"] == "NAV\nsolo"  # isolated host untouched


def test_min_frac_threshold(spark):
    # PROMO in 2 of 5 docs (0.4 < 0.5) -> kept; NAV in 5/5 -> removed
    rows = [
        (i, f"https://a.com/{i}",
         "NAV\nbody %d%s" % (i, "\nPROMO" if i <= 2 else ""))
        for i in range(1, 6)
    ]
    out = _run(spark, rows)
    assert out[1]["cleaned_text"] == "body 1\nPROMO"
    assert out[5]["cleaned_text"] == "body 5"
    # lower the threshold: PROMO at 0.4 >= 0.25 but only 2 docs < min_docs=3;
    # with min_docs=2 it goes too
    out2 = _run(spark, rows, min_docs=2, min_frac=0.25)
    assert out2[1]["cleaned_text"] == "body 1"


def test_blank_lines_never_template(spark):
    rows = [
        (i, f"https://a.com/{i}", f"NAV\n\npara {i}") for i in range(1, 5)
    ]
    out = _run(spark, rows)
    # the blank separator is in 4/4 docs but stays; NAV goes
    assert out[1]["cleaned_text"] == "\npara 1"


def test_plan_no_python(spark):
    df = spark.createDataFrame(
        [(1, "https://a.com/1", "x\ny")], SCHEMA
    )
    plan = host_template_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
