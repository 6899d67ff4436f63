"""Per-line language mixing (analytics.lang_mix_docs): the
code-switch/boilerplate-contamination signal doc-level lang-ID
averages away. Pinned: per-line classification reuses the SAME
classifier (one grammar), deterministic dominance ties, the
min-line-chars evidence gate, NULL/zero rows for unscorable docs,
integer-only outputs, and the zero-Python plan."""

import pytest
from pyspark.sql import functions as F

from htmlx.spark import analytics
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-langmix-test")
    yield s
    s.stop()


EN = "the cat sat on the mat and that was that with style"
FR = "le chat est sur le tapis et la vie est une chanson"


def test_mixed_doc_counts_and_dominance(spark):
    docs = spark.createDataFrame(
        [
            (1, "\n".join([EN, EN, FR])),            # 2 en lines, 1 fr
            (2, EN),                                  # single-line doc
            (3, "short\n\nx"),                        # nothing scorable
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in analytics.lang_mix_docs(docs).collect()}
    r1 = got[1]
    assert r1["dominant_line_lang"] == "en"
    assert (r1["dom_line_cnt"], r1["n_scored_lines"], r1["n_line_langs"]) == (2, 3, 2)
    r2 = got[2]
    assert r2["dominant_line_lang"] == "en"
    assert (r2["dom_line_cnt"], r2["n_scored_lines"], r2["n_line_langs"]) == (1, 1, 1)
    r3 = got[3]  # no line passed the evidence gate: NULL lang, zero counts
    assert r3["dominant_line_lang"] is None
    assert (r3["dom_line_cnt"], r3["n_scored_lines"], r3["n_line_langs"]) == (0, 0, 0)


def test_per_line_uses_same_classifier(spark):
    """A line classified alone by lang_id_docs gets the same prediction
    inside lang_mix_docs — one grammar by construction, checked for
    every line of a mixed doc."""
    lines = [EN, FR, "der hund ist im haus und das ist gut so denn"]
    docs = spark.createDataFrame([(1, "\n".join(lines))], "doc_id long, text string")
    solo = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lines)], "doc_id long, text string"
    )
    expect = {r["doc_id"]: r["pred_lang"]
              for r in analytics.lang_id_docs(solo).collect()}
    per_line = analytics.lang_id_docs(
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", "\n")).alias("line_no", "text"),
        ),
        id_cols=("doc_id", "line_no"),
    )
    got = {r["line_no"]: r["pred_lang"] for r in per_line.collect()}
    assert got == {i: expect[i] for i in range(len(lines))}
    assert len(set(got.values())) == 3  # genuinely three languages


def test_dominance_tie_is_deterministic(spark):
    """1 en line + 1 fr line: the tie must break the same way every run
    (max over (count, lang) structs -> the lexically larger lang)."""
    docs = spark.createDataFrame(
        [(1, EN + "\n" + FR)], "doc_id long, text string"
    )
    for _ in range(3):
        r = analytics.lang_mix_docs(docs).collect()[0]
        assert r["dominant_line_lang"] == "fr"  # max('en','fr') on the tie
        assert r["dom_line_cnt"] == 1 and r["n_line_langs"] == 2


def test_lang_mix_plan_zero_python(spark):
    docs = spark.createDataFrame([(1, EN)], "doc_id long, text string")
    plan = analytics.lang_mix_docs(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    for m in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert m not in plan


def test_curate_langmix_cli(spark, tmp_path, monkeypatch):
    import sys

    from jobs.curate import main

    inp = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, EN + "\n" + EN + "\n" + FR)], "doc_id long, text string"
    ).write.parquet(inp)
    out = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--mode", "langmix", "--input", inp, "--output", out,
    ])
    main()
    r = spark.read.parquet(out).collect()[0]
    assert r["dominant_line_lang"] == "en"
    assert (r["dom_line_cnt"], r["n_scored_lines"], r["n_line_langs"]) == (2, 3, 2)
