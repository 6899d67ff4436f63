"""Large-scale training-data pipeline operators over `documents` and
`embeddings` — deduplication, similarity search, text analysis.

Design rule: everything that CAN be a built-in `pyspark.sql.functions`
expression IS one (stays in WholeStageCodegen / JVM); Python appears only in
the genuinely bit-twiddly ops (simhash, language-ID profiles) as
Arrow-vectorized pandas UDFs.

Scale notes (100 TB / 1000 executors):
- exact dedup: hash-groupBy on md5(text) — one shuffle keyed by digest, no
  skew (digests are uniform).
- MinHash+LSH: signatures computed scan-side (map-only), bands exploded and
  shuffled by (band_id, band_hash) — candidate buckets are tiny; the
  quadratic pair expansion happens per-bucket, never globally.
- ANN: brute-force top-k broadcasts the (small) query set and computes
  partial top-k per partition before the final shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup via content digest group-by: one row per distinct text
    with the kept (minimum) doc_id and the duplicate count."""
    return (
        documents.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.min("doc_id").cast("long").alias("keep_doc_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
    )


def shingles_col(text_col: str = "text", k: int = 3):
    """k-word shingles as an array<string> column (pure SQL, no Python)."""
    return F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) < {k} THEN array({text_col}) "
        f"ELSE transform(sequence(1, size(split({text_col}, ' ')) - {k - 1}), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {k}))) END"
    )


def minhash_signatures(documents: DataFrame, num_hashes: int = 32, shingle_k: int = 3) -> DataFrame:
    """MinHash signatures: sig[j] = min over shingles of xxhash64(shingle, j).

    All JVM-side (xxhash64 + array_min inside transform); the signature is
    computed in the scan stage with zero shuffles. Tokenization and shingle
    materialization are staged as separate projections so the split/shingle
    arrays are computed once per row, not once per hash function (Catalyst
    does not CSE across the per-hash lambdas)."""
    k = shingle_k
    tokens = F.split(F.col("text"), " ")
    sh = F.expr(
        f"CASE WHEN size(__tokens) < {k} THEN array(text) "
        f"ELSE transform(sequence(1, size(__tokens) - {k - 1}), "
        f"i -> concat_ws(' ', slice(__tokens, i, {k}))) END"
    )
    sig = F.array(
        *[
            F.array_min(F.expr(f"transform(__shingles, s -> xxhash64(s, {j})) "))
            for j in range(num_hashes)
        ]
    )
    return (
        documents.withColumn("__tokens", tokens)
        .withColumn("__shingles", sh)
        .withColumn("minhash_sig", sig)
        .drop("__tokens", "__shingles")
    )


def minhash_lsh_candidates(
    documents: DataFrame, num_hashes: int = 32, bands: int = 8, shingle_k: int = 3
) -> DataFrame:
    """LSH banding: split each signature into `bands` bands of
    num_hashes/bands rows, hash each band, shuffle by (band, hash), and emit
    candidate near-duplicate pairs that collide in any band (deduped)."""
    rows = num_hashes // bands
    with_sig = minhash_signatures(documents, num_hashes, shingle_k).select("doc_id", "minhash_sig")
    banded = with_sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.xxhash64(
                            F.concat_ws(",", F.slice("minhash_sig", b * rows + 1, rows).cast("array<string>"))
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(
            F.col("a.doc_id").cast("long").alias("doc_a"),
            F.col("b.doc_id").cast("long").alias("doc_b"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(documents: DataFrame, candidates: DataFrame, shingle_k: int = 3) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (array_intersect/union —
    JVM-side). Join candidates back to shingle sets; at scale the candidate
    set is tiny relative to the corpus, so both joins broadcast-build."""
    sets = documents.select(
        F.col("doc_id"), F.array_distinct(shingles_col("text", shingle_k)).alias("sh")
    )
    return (
        candidates.join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
    )


def simhash_udf():
    """64-bit SimHash over whitespace tokens — Arrow-vectorized pandas UDF
    (bit-parallel accumulation in numpy; a per-bit SQL aggregate would need
    64 shuffled aggregations)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def simhash(texts):
        out = np.zeros(len(texts), dtype=np.int64)
        bits = np.arange(64, dtype=np.uint64)
        for i, t in enumerate(texts):
            if not t:
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in t.split(" "):
                # FNV-1a 64-bit — stable across platforms/runs
                h = np.uint64(0xCBF29CE484222325)
                for ch in tok.encode():
                    h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
                bitvals = (int(h) >> bits) & np.uint64(1)
                acc += np.where(bitvals.astype(bool), 1, -1)
            sig = 0
            for b in range(64):
                if acc[b] > 0:
                    sig |= 1 << b
            out[i] = np.int64(sig - (1 << 64) if sig >= (1 << 63) else sig)
        return pd.Series(out)

    return simhash


def simhash_docs(documents: DataFrame) -> DataFrame:
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"), simhash_udf()(F.col("text")).alias("simhash")
    )


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above `threshold`.

    Brute-force pairwise at test SF; at 100 TB scale the same op runs after
    an LSH/IVF bucketing stage so the join keys on bucket id instead of a
    cross product (see ann_topk for the bucketed scale path)."""
    norm = _normalized(embeddings)
    return (
        norm.alias("a")
        .join(norm.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _dot("a.nvec", "b.nvec").alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _normalized(embeddings: DataFrame) -> DataFrame:
    vec_d = F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    norm = F.sqrt(F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x * x))
    return embeddings.select(
        "vec_id", F.expr(
            "transform(embedding, x -> CAST(x AS DOUBLE) / "
            "sqrt(aggregate(transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, y) -> acc + y)))"
        ).alias("nvec"),
    )


def _dot(a: str, b: str):
    return F.expr(f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def ivf_assign(embeddings: DataFrame, num_centroids: int = 8, lloyd_iters: int = 1) -> tuple:
    """IVF bucketing: deterministic seed centroids (smallest xxhash64 of
    vec_id — no RNG, reproducible across runs/parallelism) refined with
    `lloyd_iters` Lloyd iterations (groupBy-mean — one shuffle each), then
    every vector assigned to its nearest centroid.

    Returns (assigned_df with bucket column, centroids_df). At 100 TB scale
    this replaces the ANN cross join: queries probe nprobe buckets and the
    candidate join keys on bucket id, so the pairwise work shrinks by
    ~num_centroids/nprobe."""
    norm = _normalized(embeddings)
    seeds = (
        norm.withColumn("__h", F.xxhash64(F.col("vec_id")))
        .orderBy("__h")
        .limit(num_centroids)
        .select(F.col("vec_id").alias("centroid_id"), F.col("nvec").alias("cvec"))
    )
    centroids = seeds.withColumn(
        "centroid_id", F.row_number().over(Window.orderBy("centroid_id")) - 1
    )

    def assign(vectors: DataFrame, cents: DataFrame) -> DataFrame:
        scored = vectors.crossJoin(F.broadcast(cents)).select(
            "vec_id", "nvec", "centroid_id", _dot("nvec", "cvec").alias("sim")
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("centroid_id"))
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") == 1)
            .select("vec_id", "nvec", F.col("centroid_id").alias("bucket"))
        )

    assigned = assign(norm, centroids)
    for _ in range(lloyd_iters):
        # recompute centroids as bucket means (renormalized), one shuffle
        dim = len(embeddings.select("embedding").first()[0])
        mean_cols = [
            F.avg(F.col("nvec")[i]).alias(f"c{i}") for i in range(dim)
        ]
        means = assigned.groupBy("bucket").agg(*mean_cols)
        means = means.select(
            F.col("bucket").alias("centroid_id"),
            F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("raw"),
        ).select(
            "centroid_id",
            F.expr(
                "transform(raw, x -> x / sqrt(aggregate(transform(raw, y -> y * y), "
                "CAST(0.0 AS DOUBLE), (a, y) -> a + y)))"
            ).alias("cvec"),
        )
        assigned = assign(norm, means)
        centroids = means
    return assigned, centroids


def ann_topk_ivf(
    embeddings: DataFrame,
    num_queries: int = 5,
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 3,
) -> DataFrame:
    """IVF-bucketed approximate top-k: probe only the nprobe buckets whose
    centroids are nearest each query. Same output contract as ann_topk
    (query_id, neighbor_id, rank); approximate recall traded for a
    bucket-join instead of a full cross product — the 100 TB path."""
    assigned, centroids = ivf_assign(embeddings, num_centroids)
    queries = assigned.where(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"), F.col("nvec").alias("qvec")
    )
    qprobe = (
        queries.crossJoin(F.broadcast(centroids))
        .select("query_id", "qvec", "centroid_id", _dot("qvec", "cvec").alias("csim"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), F.col("centroid_id"))
    probes = (
        qprobe.withColumn("__r", F.row_number().over(wq))
        .where(F.col("__r") <= nprobe)
        .select("query_id", "qvec", F.col("centroid_id").alias("bucket"))
    )
    scored = (
        assigned.join(F.broadcast(probes), on="bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), _dot("qvec", "nvec").alias("cosine")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("neighbor_id").cast("long"),
            F.col("rank").cast("long"),
        )
    )


def ann_topk(embeddings: DataFrame, num_queries: int = 5, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: the query set (vec_id < num_queries) is tiny
    and broadcast; ranks tie-break on neighbor id for determinism.

    Scale path: replace the broadcast-cross-join with an IVF bucketing
    (kmeans-lite on a sample -> bucket join) — same output contract."""
    norm = _normalized(embeddings)
    queries = norm.where(F.col("vec_id") < num_queries).select(
        F.col("vec_id").alias("query_id"), F.col("nvec").alias("qvec")
    )
    scored = (
        norm.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dot("qvec", "nvec").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long"),
            F.col("neighbor_id").cast("long"),
            F.col("rank").cast("long"),
        )
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace token counting + distinct-token counts (JVM-side)."""
    toks = F.split(F.col("text"), " ")
    return documents.select(
        F.col("doc_id").cast("long"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length band, type-token ratio, stopword
    ratio, mean token length — integer outputs (scaled pct) for stable
    cross-engine comparison."""
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    stopwords = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "in")))
    return documents.select(
        F.col("doc_id").cast("long"),
        F.floor(n_distinct * 100 / n_tokens).cast("long").alias("ttr_pct"),
        F.floor(stopwords * 100 / n_tokens).cast("long").alias("stopword_pct"),
        F.floor(F.length("text") * 10 / n_tokens).cast("long").alias("mean_token_len_x10"),
        (F.length("text") >= 100).cast("boolean").alias("len_ok"),
    )


def doc_fingerprints(documents: DataFrame) -> DataFrame:
    """Content fingerprint (md5 digest — portable across engines)."""
    return documents.select(
        F.col("doc_id").cast("long"), F.md5(F.col("text")).alias("fingerprint")
    )


def lang_distribution(documents: DataFrame) -> DataFrame:
    return documents.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))


_LANG_PROFILES = {
    # tiny stopword/char profiles for the n-gram heuristic language ID
    "en": {"the", "and", "of", "to", "in", "is", "that"},
    "fr": {"le", "la", "et", "les", "des", "une", "est"},
    "es": {"el", "la", "los", "que", "una", "es", "por"},
    "de": {"der", "die", "und", "das", "ist", "ein", "nicht"},
}


def lang_id_udf():
    """Language-ID heuristic: stopword profile votes + CJK char detection —
    vectorized pandas UDF (profiles are Python dicts; a JVM rewrite would be
    a big CASE expression with no perf need at this stage)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def lang_id(texts):
        out = []
        for t in texts:
            if not t:
                out.append("und")
                continue
            if any("一" <= c <= "鿿" for c in t[:200]):
                out.append("zh")
                continue
            toks = set(t.lower().split())
            best, best_score = "und", 0
            for lang, prof in sorted(_LANG_PROFILES.items()):
                score = len(toks & prof)
                if score > best_score:
                    best, best_score = lang, score
            out.append(best)
        return pd.Series(out)

    return lang_id


def lang_id_docs(documents: DataFrame) -> DataFrame:
    return documents.select(
        F.col("doc_id").cast("long"), lang_id_udf()(F.col("text")).alias("pred_lang")
    )
