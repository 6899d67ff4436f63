"""Corpus-self-perplexity (analytics.char_trigram_perplexity): add-one
char-trigram model trained on the corpus itself, mean bits per trigram
per document — the CCNet quality pillar next to its dedup and pre-hash
normalization (Wenzek 2020 uses a pre-trained KenLM; this is the
self-contained corpus-trained variant).

Pins: an independent pure-Python replay (collections.Counter + math),
the semantic direction (corpus-typical text scores FEWER bits than an
outlier), the <3-char NULL contract, and the zero-Python plan."""

import math
from collections import Counter

import pytest

from htmlx.spark.analytics import char_trigram_perplexity
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-trigram-ppl-test")
    yield s
    s.stop()


def _py_replay(texts):
    tris = {i: [t[j:j + 3] for j in range(len(t) - 2)]
            for i, t in texts.items() if len(t) >= 3}
    model = Counter(t for ts in tris.values() for t in ts)
    n, v = sum(model.values()), len(model)
    out = {}
    for i, ts in tris.items():
        bits = [-math.log2((model[t] + 1) / (n + v)) for t in ts]
        out[i] = round(sum(bits) / len(bits), 2)
    return out


def test_matches_independent_replay(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps again and again",
        3: "zzzzqqqqxxxx totally atypical glyph soup",
        4: "the the the the the",
        5: "ab",  # too short -> NULL
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r["tri_bits"]
           for r in char_trigram_perplexity(df).collect()}
    exp = _py_replay(texts)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=0.011), (i, got[i], exp[i])
    assert got[5] is None
    # semantic direction: corpus-typical 'the ...' text is cheaper than
    # the glyph soup, and pure repetition is cheapest of all
    assert got[4] < got[1] < got[3]


def test_plan_no_python(spark):
    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    plan = (
        char_trigram_perplexity(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan  # the scalar side is broadcast


def test_pretrained_model_score_many(spark, tmp_path):
    """train_char_trigram -> parquet -> score-only run: scoring the
    training corpus against its own saved model equals inline
    self-scoring (the left join degenerates to inner), and a doc whose
    trigrams the model never saw scores exactly the add-one floor
    -log2(1/(N+V)) for every trigram."""
    import math

    from pyspark.sql import functions as F

    from htmlx.spark import analytics

    docs = spark.createDataFrame(
        [(1, "abcabcab"), (2, "xyzxyzxy"), (3, "abcxyzab")],
        "doc_id long, text string",
    )
    model = analytics.train_char_trigram(docs)
    mp = str(tmp_path / "trigram_model.parquet")
    model.write.parquet(mp)
    loaded = spark.read.parquet(mp)
    inline = {r["doc_id"]: r["tri_bits"]
              for r in analytics.char_trigram_perplexity(docs).collect()}
    scored = {r["doc_id"]: r["tri_bits"]
              for r in analytics.char_trigram_perplexity(
                  docs, model=loaded).collect()}
    assert scored == inline
    # unseen text: every trigram takes the floor P = 1/(N+V)
    n = sum(r["count"] for r in model.collect())
    v = model.count()
    floor_bits = round(-math.log2(1.0 / (n + v)), 2)
    unseen = spark.createDataFrame([(9, "QQQQQ")], "doc_id long, text string")
    got = analytics.char_trigram_perplexity(unseen, model=loaded).collect()
    assert got[0]["tri_bits"] == floor_bits
