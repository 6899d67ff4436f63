"""CCNet dedup normalization (analytics.ccnet_norm_col, Wenzek et al.
2020 §4.1): case-fold, Latin accent-fold, digit->0, punctuation strip,
whitespace collapse — and the normalize=True mode of dedup_exact /
dedup_paragraphs that hashes the normalized form.

The Catalyst expression is pinned against an INDEPENDENT pure-Python
replay (str.translate + re, no Spark) on crafted and random strings."""

import re

import pytest

from pyspark.sql import functions as F

from htmlx.spark.analytics import (
    CCNET_ACC_FROM,
    CCNET_ACC_TO,
    ccnet_norm_col,
    dedup_exact,
    dedup_paragraphs,
    split_paragraphs,
)
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-ccnet-norm-test")
    yield s
    s.stop()


_ACC = str.maketrans(CCNET_ACC_FROM, CCNET_ACC_TO)


def _py_norm(t: str) -> str:
    """Independent replay: same spec, different machinery (char-level
    predicates instead of a regex class)."""
    t = t.lower().translate(_ACC)
    t = re.sub(r"[0-9]", "0", t)
    t = "".join(c for c in t if c == "0" or c.isspace() or c.isalpha())
    t = re.sub(r"\s+", " ", t)
    return t.strip()


CASES = [
    "RÉSUMÉ  Sample, Text!! Number 4,2",
    "resume sample text number 42",
    "Çà et là — déjà vu; naïve façade!",
    "tabs\tand\nnewlines\r\nfold   to one",
    "MIXED123digits456",
    "  leading and trailing  ",
    "ünïcödé pùnct: «quotes» …ellipsis…",
    "",
    "!!!",
    "ø Ø slashed o folds",
]


def test_matches_independent_python_replay(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)],
                               "i long, text string")
    got = {
        r["i"]: r["n"]
        for r in df.select("i", ccnet_norm_col("text").alias("n")).collect()
    }
    for i, c in enumerate(CASES):
        assert got[i] == _py_norm(c), (c, got[i], _py_norm(c))


def test_cosmetic_variants_collapse(spark):
    assert _py_norm(CASES[0]) == _py_norm(CASES[1])  # the spec itself
    df = spark.createDataFrame(
        [(1, CASES[0]), (2, CASES[1]), (3, "a genuinely different text")],
        "doc_id long, text string",
    )
    out = {r["text_md5"]: r for r in dedup_exact(df, normalize=True).collect()}
    counts = sorted(r["dup_count"] for r in out.values())
    assert counts == [1, 2]
    dup = next(r for r in out.values() if r["dup_count"] == 2)
    assert dup["keep_doc_id"] == 1
    # raw mode must NOT merge them
    assert all(
        r["dup_count"] == 1 for r in dedup_exact(df).collect()
    )


def test_paragraph_normalize_mode(spark):
    df = spark.createDataFrame(
        [(1, "Subscribe NOW!\nbody one"), (2, "subscribe now\nbody two")],
        "doc_id long, text string",
    )
    paras = split_paragraphs(df)
    out = dedup_paragraphs(paras, normalize=True)
    dups = [r for r in out.collect() if r["dup_count"] == 2]
    assert len(dups) == 1 and dups[0]["keep_doc_id"] == 1


def test_norm_plan_scan_side(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        df.select(ccnet_norm_col("text"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
