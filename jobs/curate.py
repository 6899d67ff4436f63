"""spark-submit entry point for the corpus-curation pipeline.

  spark-submit --py-files htmlx.zip jobs/curate.py \
      --input <documents table/parquet path> --output <keep-list root> \
      [--mode filter|dedup|components|split|decontaminate|pii|pack|quality|paradedup] \
      [--threshold 0.9] [--min-chars 100] [--hash-basis xxhash64] \
      [--iters 0] [--eval-input <eval parquet>] [--seq-len 2048]

Modes:
  filter      full keep/drop decision per document with a precedence-
              ordered reason column (exact_dup > near_dup > low_quality >
              und_lang) — what a training-data ingest actually consumes.
  dedup       near-dup keep-list only (LSH -> exact-Jaccard verify ->
              connected components).
  components  same as dedup but expects a precomputed pairs table at
              --pairs (doc_a, doc_b).
  split       deterministic train/val/test assignment by md5 id buckets
              (reproducible across engines and cluster sizes).
  decontaminate  flag docs sharing any 13-gram with the eval set at
              --eval-input (a parquet with a text column); eval grams
              broadcast, the corpus is never shuffled.
  pii         redact emails/IPv4s/long digit runs to typed tokens with
              per-kind counts (clean_text column).
  pack        next-fit sequence packing into --seq-len token bins,
              parallel across --pack-buckets hash buckets.
  quality     published C4 + Gopher rule suites per document over real
              newline-split lines (gopher_pass / c4_pass columns plus
              every sub-signal) — scan-side, zero shuffle.
  paradedup   CCNet-style paragraph-level dedup keep-list: one row per
              distinct paragraph digest with keeper doc and count.

--iters 0 (default) iterates label propagation to convergence (one scalar
count() per round); a positive value pins a fixed round budget.
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--pairs", default=None, help="precomputed pairs table (components mode)")
    ap.add_argument(
        "--mode",
        choices=["filter", "dedup", "components", "split", "decontaminate",
                 "pii", "pack", "quality", "paradedup"],
        default="filter",
    )
    ap.add_argument("--eval-input", default=None, help="eval-set parquet (decontaminate mode)")
    ap.add_argument("--seq-len", type=int, default=2048, help="token bin size (pack mode)")
    ap.add_argument("--pack-buckets", type=int, default=256, help="parallel packing units (pack mode)")
    ap.add_argument("--threshold", type=float, default=0.9, help="Jaccard verify threshold")
    ap.add_argument("--min-chars", type=int, default=100)
    ap.add_argument("--hash-basis", choices=["xxhash64", "md5"], default="xxhash64")
    ap.add_argument("--iters", type=int, default=0, help="0 = iterate to convergence")
    args = ap.parse_args()
    if args.iters < 0:
        ap.error("--iters must be >= 0 (0 = iterate to convergence)")
    if args.mode == "components" and not args.pairs:
        ap.error("--mode components requires --pairs")
    if args.mode == "decontaminate" and not args.eval_input:
        ap.error("--mode decontaminate requires --eval-input")

    from pyspark.sql import SparkSession, functions as F

    from htmlx.spark import analytics

    spark = SparkSession.builder.appName("htmlx-curate").getOrCreate()
    docs = spark.read.parquet(args.input)

    def keep_list(pairs):
        kw = (
            {"max_iters": 50, "until_converged": True}
            if args.iters == 0
            else {"max_iters": args.iters}
        )
        return analytics.near_dup_components(docs, pairs, **kw)

    def verified_pairs():
        cands = analytics.minhash_lsh_candidates(docs, hash_basis=args.hash_basis)
        return (
            analytics.ngram_jaccard_pairs(docs, cands)
            .where(F.col("jaccard") >= args.threshold)
            .select("doc_a", "doc_b")
        )

    if args.mode == "quality":
        out = analytics.c4_gopher_quality(docs)
    elif args.mode == "paradedup":
        out = analytics.dedup_paragraphs(analytics.split_paragraphs(docs))
    elif args.mode == "split":
        out = analytics.hash_split(docs)
    elif args.mode == "decontaminate":
        ev = spark.read.parquet(args.eval_input)
        out = analytics.decontaminate(docs, ev, hash_basis=args.hash_basis)
    elif args.mode == "pii":
        out = analytics.pii_scrub(docs)
    elif args.mode == "pack":
        out = analytics.pack_sequences(
            docs, seq_len=args.seq_len, num_buckets=args.pack_buckets
        )
    elif args.mode == "components":
        pairs = spark.read.parquet(args.pairs)
        out = keep_list(pairs)
    elif args.mode == "dedup":
        out = keep_list(verified_pairs())
    else:
        base = docs.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.md5("text").alias("text_md5"),
            F.length("text").alias("n_chars"),
        )
        exact = analytics.dedup_exact(docs).select(
            "text_md5", F.col("keep_doc_id").alias("exact_keep")
        )
        comp = keep_list(verified_pairs()).select(
            "doc_id", F.col("is_dup").alias("near_dup")
        )
        lang = analytics.lang_id_docs(docs)
        # corpus-sized sides on uniform keys: shuffle joins, no broadcasts
        joined = base.join(exact, "text_md5").join(comp, "doc_id").join(lang, "doc_id")
        reason = (
            F.when(F.col("doc_id") != F.col("exact_keep"), F.lit("exact_dup"))
            .when(F.col("near_dup"), F.lit("near_dup"))
            .when(F.col("n_chars") < args.min_chars, F.lit("low_quality"))
            .when(F.col("pred_lang") == "und", F.lit("und_lang"))
            .otherwise(F.lit(""))
        )
        out = joined.select("doc_id", reason.alias("reason")).withColumn(
            "keep", (F.col("reason") == "").cast("boolean")
        )

    out.write.mode("overwrite").parquet(args.output)
    print(f"mode={args.mode} rows={spark.read.parquet(args.output).count()} -> {args.output}")


if __name__ == "__main__":
    sys.exit(main())
