"""ANN: brute-force exactness (vs numpy) + IVF scale-path recall."""

import numpy as np
import pytest

from htmlx.spark.analytics import ann_topk, ann_topk_ivf, ivf_assign
from htmlx.spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(cores=4, app_name="htmlx-ann-test")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def numpy_topk(emb_df, num_queries=5, k=5):
    rows = emb_df.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    E = np.array([r.embedding for r in rows], dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    out = set()
    for q in range(num_queries):
        qi = int(np.where(ids == q)[0][0])
        sims = En @ En[qi]
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))
        order = [j for j in order if ids[j] != q][:k]
        for rank, j in enumerate(order, 1):
            out.add((q, int(ids[j]), rank))
    return out


def test_brute_force_matches_numpy(spark, emb):
    got = {(r.query_id, r.neighbor_id, r.rank) for r in ann_topk(emb).collect()}
    assert got == numpy_topk(emb)


def test_ivf_assignment_partitions_all(spark, emb):
    assigned, centroids = ivf_assign(emb, num_centroids=8)
    n = emb.count()
    assert assigned.count() == n  # every vector in exactly one bucket
    buckets = {r.bucket for r in assigned.select("bucket").distinct().collect()}
    assert len(buckets) >= 4  # non-degenerate bucketing


def test_ivf_recall(spark, emb):
    exact = numpy_topk(emb, num_queries=5, k=5)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_topk_ivf(emb, num_queries=5, k=5, num_centroids=8, nprobe=3).collect()
    }
    exact_pairs = {(q, n) for q, n, _ in exact}
    recall = len(approx & exact_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"IVF recall@5 too low: {recall}"


def test_ivf_deterministic(spark, emb):
    a = sorted(tuple(r) for r in ann_topk_ivf(emb).collect())
    b = sorted(tuple(r) for r in ann_topk_ivf(emb).collect())
    assert a == b


def test_embedding_near_dup_blocked_is_exact(spark, emb):
    """Block-pair decomposition must produce EXACTLY the pairs of a naive
    all-pairs cosine join — each unordered pair meets in exactly one task
    (no dupes), every pair meets somewhere (no loss)."""
    from pyspark.sql import functions as F

    from htmlx.spark.analytics import _dot, _normalized, embedding_near_dup

    got = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup(emb, threshold=0.4, num_blocks=5).collect()
    }
    norm = _normalized(emb)
    naive = (
        norm.alias("a")
        .join(norm.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").cast("long").alias("vec_a"),
            F.col("b.vec_id").cast("long").alias("vec_b"),
            _dot("a.nvec", "b.nvec").alias("cosine"),
        )
        .where(F.col("cosine") >= 0.4)
    )
    want = {(r.vec_a, r.vec_b) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_embedding_near_dup_ivf_recall(spark, emb):
    """The approximate IVF near-dup path must (a) emit only true pairs
    (precision 1 — in-bucket scores are exact) and (b) recall TRUE
    near-duplicates (tight cosine): inject clusters of tiny perturbations
    of base vectors — those co-locate in a cell by construction. (At loose
    thresholds like 0.4 the pairs are not near-dups and recall is poor —
    that regime belongs to the exact path; measured 0.3-0.5 there.)"""
    import numpy as np

    from htmlx.spark.analytics import embedding_near_dup, embedding_near_dup_ivf

    rng = np.random.RandomState(7)
    dim = 16
    rows = []
    vid = 0
    for cluster in range(10):
        base = rng.randn(dim)
        base /= np.linalg.norm(base)
        for _ in range(3):  # 3 near-identical members per cluster
            v = base + 0.01 * rng.randn(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(100):  # decoys
        v = rng.randn(dim)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    emb2 = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {(r.vec_a, r.vec_b) for r in embedding_near_dup(emb2, 0.99).collect()}
    approx = {(r.vec_a, r.vec_b) for r in embedding_near_dup_ivf(emb2, 0.99, num_centroids=8).collect()}
    assert approx <= exact  # precision 1: no false pairs
    assert len(exact) >= 25  # ~30 true pairs injected
    recall = len(approx) / len(exact)
    assert recall >= 0.9, recall  # true near-dups co-locate


def test_ivf_fixed_centroids_reuse(spark, emb, tmp_path):
    """Persisted centroids are a fixed index artifact: re-assigning the
    training vectors against the saved table equals inline training
    output exactly, and a NEW batch assigns into the same bucket space
    without retraining (the incremental-index contract — per-batch
    retraining would bucket the same vector differently across
    batches)."""
    from htmlx.spark import analytics

    assigned, cents = analytics.ivf_assign(emb, num_centroids=4)
    cp = str(tmp_path / "centroids.parquet")
    cents.write.parquet(cp)
    loaded = spark.read.parquet(cp)
    re_assigned, _ = analytics.ivf_assign(emb, centroids=loaded)
    a = {r["vec_id"]: r["bucket"] for r in assigned.collect()}
    b = {r["vec_id"]: r["bucket"] for r in re_assigned.collect()}
    assert a == b
    # a new batch (ids offset, same vectors) lands in the same buckets
    from pyspark.sql import functions as F

    shifted = emb.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    c = {r["vec_id"] - 1000: r["bucket"]
         for r in analytics.ivf_assign(shifted, centroids=loaded)[0].collect()}
    assert c == a
    # query path accepts the artifact too
    got = analytics.ann_topk_ivf(emb, num_queries=2, k=3, centroids=loaded)
    assert got.count() == 6


def test_int8_quantization_roundtrip_and_recall(spark, emb):
    """Affine int8 quantization: schema really is array<tinyint> (the
    4-8x shuffle/storage win), per-element reconstruction error is
    bounded by scale/2, a constant vector round-trips exactly, and
    brute-force top-k over dequantized vectors keeps high recall vs the
    float originals."""
    from pyspark.sql import functions as F

    from htmlx.spark import analytics

    q = analytics.quantize_embeddings(emb)
    assert dict(q.dtypes)["qvec"] == "array<tinyint>"
    deq = analytics.dequantize_embeddings(q)
    err = (
        emb.join(deq.withColumnRenamed("embedding", "approx"), "vec_id")
        .join(q.select("vec_id", "scale"), "vec_id")
        .select(
            F.aggregate(
                F.zip_with(
                    F.expr("transform(embedding, x -> CAST(x AS DOUBLE))"),
                    "approx",
                    lambda a, b: F.abs(a - b),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ).alias("max_err"),
            (F.col("scale") / 2 + F.lit(1e-9)).alias("bound"),
        )
    )
    assert err.where(F.col("max_err") > F.col("bound")).count() == 0
    # constant vector: scale 0 path, exact round trip
    const = spark.createDataFrame(
        [(1, [0.5, 0.5, 0.5])], "vec_id long, embedding array<double>"
    )
    back = analytics.dequantize_embeddings(
        analytics.quantize_embeddings(const)).collect()[0]["embedding"]
    assert back == [0.5, 0.5, 0.5]
    # end-to-end recall of exact brute-force top-k under quantization
    exact = {(r["query_id"], r["neighbor_id"])
             for r in analytics.ann_topk(emb, num_queries=5, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in analytics.ann_topk(deq, num_queries=5, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_curate_embdedup_cli(spark, tmp_path, monkeypatch):
    """--mode embdedup e2e over an embeddings parquet: a planted
    near-identical pair collapses to one keeper (min vec_id), distinct
    vectors stay; --emb-approx runs the IVF path on the same input."""
    import sys

    from jobs.curate import main

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9999, 0.01, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    inp = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(inp)
    for flag in ([], ["--emb-approx", "--emb-centroids", "1"]):
        out = str(tmp_path / ("out" + str(len(flag))))
        monkeypatch.setattr(sys, "argv", [
            "curate.py", "--mode", "embdedup", "--input", inp,
            "--output", out, "--threshold", "0.95", *flag,
        ])
        main()
        got = {r["vec_id"]: (r["keep_vec_id"], r["is_dup"])
               for r in spark.read.parquet(out).collect()}
        assert got == {1: (1, False), 2: (1, True),
                       3: (3, False), 4: (4, False)}, flag


def test_curate_embdedup_quantized_input(spark, tmp_path, monkeypatch):
    """embdedup auto-dequantizes an int8-quantized table (qvec/scale/
    offset, no embedding column): same keep-list as the float input."""
    import sys

    from jobs.curate import main
    from htmlx.spark import analytics

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = analytics.quantize_embeddings(emb)
    inp = str(tmp_path / "qemb.parquet")
    q.write.parquet(inp)
    out = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "curate.py", "--mode", "embdedup", "--input", inp,
        "--output", out, "--threshold", "0.95",
    ])
    main()
    got = {r["vec_id"]: (r["keep_vec_id"], r["is_dup"])
           for r in spark.read.parquet(out).collect()}
    assert got == {1: (1, False), 2: (1, True), 3: (3, False)}


def test_quantization_is_scan_side(spark, emb):
    """quantize/dequantize are pure Catalyst transforms: no Exchange, no
    Python evaluation — the int8 view is free at scan time."""
    from htmlx.spark import analytics

    for df in (
        analytics.quantize_embeddings(emb),
        analytics.dequantize_embeddings(analytics.quantize_embeddings(emb)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        for m in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert m not in plan
