"""Temperature-based domain rebalancing (analytics.temperature_sample):
rate derivation (q ∝ n^alpha, no-upsampling T), determinism, and the
all-Catalyst broadcast-only plan."""

import pytest

from pyspark.sql import functions as F

from htmlx.spark.analytics import temperature_sample
from htmlx.spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-temp-sample-test")
    yield s
    s.stop()


def _docs(spark, sizes):
    rows = []
    i = 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_rates_follow_temperature_rule(spark):
    sizes = {"head": 1000, "mid": 100, "tail": 10}
    out = temperature_sample(_docs(spark, sizes), alpha=0.7)
    rates = {
        r["source"]: r["keep_rate"]
        for r in out.select("source", "keep_rate").distinct().collect()
    }
    # independent replay
    import math

    w = {s: n ** 0.7 for s, n in sizes.items()}
    norm = sum(w.values())
    q = {s: w[s] / norm for s in sizes}
    t = min(sizes[s] / q[s] for s in sizes)
    want = {s: min(1.0, t * q[s] / sizes[s]) for s in sizes}
    for s in sizes:
        assert math.isclose(rates[s], want[s], rel_tol=1e-12), (s, rates[s], want[s])
    # alpha < 1: the scarcest domain keeps everything, the head downsamples
    assert rates["tail"] == 1.0
    assert rates["head"] < rates["mid"] < 1.0
    # realized keep fraction tracks the rate (md5 buckets are near-uniform)
    kept = (
        out.groupBy("source")
        .agg(F.avg(F.col("sample_keep").cast("double")).alias("frac"))
        .collect()
    )
    for r in kept:
        assert abs(r["frac"] - want[r["source"]]) < 0.1


def test_alpha_one_keeps_everything(spark):
    out = temperature_sample(_docs(spark, {"a": 500, "b": 50}), alpha=1.0)
    assert out.where(~F.col("sample_keep")).count() == 0
    assert {r["keep_rate"] for r in out.select("keep_rate").distinct().collect()} == {1.0}


def test_target_frac_scales_total(spark):
    docs = _docs(spark, {"a": 800, "b": 200})
    out = temperature_sample(docs, alpha=0.5, target_frac=0.3)
    kept = out.where("sample_keep").count()
    assert abs(kept - 300) < 60  # md5-uniformity tolerance


def test_deterministic_across_runs(spark):
    docs = _docs(spark, {"a": 300, "b": 40})
    a = {r["doc_id"]: r["sample_keep"] for r in temperature_sample(docs).collect()}
    b = {r["doc_id"]: r["sample_keep"] for r in temperature_sample(docs.repartition(7)).collect()}
    assert a == b


def test_plan_broadcast_only_no_python(spark):
    docs = _docs(spark, {"a": 20, "b": 5})
    plan = temperature_sample(docs)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "CartesianProduct" not in plan
    # the corpus-side join against the rate table must be a broadcast join
    assert "BroadcastHashJoin" in plan


def test_mojibake_stats(spark):
    """Encoding-artifact detection (analytics.mojibake_stats): the three
    artifact families count independently; legit 'SAO'-style uppercase
    A-tilde + ASCII text stays clean."""
    from htmlx.spark.analytics import mojibake_stats

    rows = [
        (1, "cafÃ© and menÃ¼ twice"),    # 'cafÃ© menÃ¼'
        (2, "itâ€™s â€œok"),    # cp1252 quotes x2
        (3, "lossy � twice �"),
        (4, "SÃO PAULO via maÃ§a"),           # legit + 1 artifact
        (5, "perfectly clean ascii text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_moji_utf8"], r["n_moji_punct"], r["n_moji_repl"], r["mojibake"])
        for r in mojibake_stats(df).collect()
    }
    assert got[1] == (2, 0, 0, True)
    assert got[2] == (0, 2, 0, True)
    assert got[3] == (0, 0, 2, True)
    assert got[4] == (1, 0, 0, True)  # 'SÃO' does not match; 'Ã§' does
    assert got[5] == (0, 0, 0, False)
    plan = mojibake_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan
