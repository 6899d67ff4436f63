"""The extraction job: salted repartition + vectorized mapInPandas stage.

Spark-first design (SURVEY.md §3.3, §4.3):
  spark.read...  -> select(url, html)            [Catalyst prunes columns]
  -> repartition(N, xxhash64(url, salt))         [defeat host-domain skew]
  -> mapInPandas(extract_batch, RESULT_SCHEMA)   [Arrow-vectorized transport;
                                                  per-document tree work runs
                                                  inside the batch function]
  -> append to results + metrics tables

The per-row error column replaces the reference's BatchResult.Errors
(batch.go:10-23); Spark's task scheduler replaces its worker pool
(batch.go:205-314); metrics rows replace Statistics (processor.go:254-271).
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core.extract import Config, Extractor
from .schemas import ALL_LINKS_SCHEMA, AUDIT_SCHEMA, METRICS_SCHEMA, RESULT_SCHEMA


def _partition_id() -> int:
    try:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        return ctx.partitionId() if ctx is not None else -1
    except Exception:
        return -1


def _result_row(url: str, r, run_id: str, pid: int) -> dict:
    return {
        "url": url,
        "title": r.title,
        "text": r.text,
        "images": r.images,
        "links": r.links,
        "videos": r.videos,
        "audios": r.audios,
        "word_count": r.word_count,
        "reading_time_ms": r.reading_time_ms,
        "processing_time_ms": r.processing_time_ms,
        "error": r.error,
        "run_id": run_id,
        "partition_id": pid,
    }


def make_extract_batch(config: Config, run_id: str = ""):
    """Build the mapInPandas batch function for the main extraction stage.

    The Extractor is constructed once per Python worker (module-level
    amortization replaces the reference's processor pool,
    processor_pool.go:21-89)."""

    def extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extractor = Extractor(config)
        pid = _partition_id()
        for pdf in batches:
            urls = pdf["url"].tolist()
            htmls = pdf["html"].tolist()
            n = len(urls)
            # columnar result build (dict-of-lists): cheaper pandas/Arrow
            # conversion than a list of per-row dicts
            titles = [None] * n
            texts = [None] * n
            images = [None] * n
            links = [None] * n
            videos = [None] * n
            audios = [None] * n
            word_counts = [0] * n
            reading = [0] * n
            proc_ms = [0] * n
            errors = [""] * n
            for i in range(n):
                html = htmls[i]
                if html is None:
                    html = b""
                elif isinstance(html, (bytearray, memoryview)):
                    html = bytes(html)
                r = extractor.extract(html)
                titles[i] = r.title
                texts[i] = r.text
                images[i] = r.images
                links[i] = r.links
                videos[i] = r.videos
                audios[i] = r.audios
                word_counts[i] = r.word_count
                reading[i] = r.reading_time_ms
                proc_ms[i] = r.processing_time_ms
                errors[i] = r.error
            yield pd.DataFrame(
                {
                    "url": urls,
                    "title": titles,
                    "text": texts,
                    "images": images,
                    "links": links,
                    "videos": videos,
                    "audios": audios,
                    "word_count": word_counts,
                    "reading_time_ms": reading,
                    "processing_time_ms": proc_ms,
                    "error": errors,
                    "run_id": run_id,
                    "partition_id": pid,
                }
            )

    return extract_batch


def make_metrics_batch(config: Config, run_id: str = ""):
    """Batch function computing per-partition metric rows alongside results.

    Used by run_extraction_with_metrics; emits one metrics row per Arrow
    batch tagged (run_id, partition_id) for lineage."""

    def metrics_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extractor = Extractor(config)
        pid = _partition_id()
        for pdf in batches:
            t0 = time.monotonic()
            docs_in = len(pdf)
            docs_err = 0
            bytes_in = 0
            audit_events = 0
            for html in pdf["html"]:
                b = bytes(html) if html is not None else b""
                bytes_in += len(b)
                r = extractor.extract(b)
                if r.error:
                    docs_err += 1
                audit_events += len(r.audit)
            yield pd.DataFrame(
                [
                    {
                        "run_id": run_id,
                        "partition_id": pid,
                        "docs_in": docs_in,
                        "docs_ok": docs_in - docs_err,
                        "docs_error": docs_err,
                        "bytes_in": bytes_in,
                        "extract_ms": int((time.monotonic() - t0) * 1000),
                        "audit_events": audit_events,
                    }
                ]
            )

    return metrics_batch


def make_audit_batch(config: Config, run_id: str = ""):
    """Batch function emitting one row per security/audit event (blocked
    tags/attrs/URLs during sanitization) tagged with (run_id, partition_id)
    lineage — the Spark-native replacement for the reference's audit sink
    zoo (audit.go:157-640): audit events are DATA appended to a table."""
    audit_config = Config(**{**config.__dict__, "audit_enabled": True})

    def audit_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        extractor = Extractor(audit_config)
        pid = _partition_id()
        cols = [f.name for f in AUDIT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                b = bytes(html) if html is not None else b""
                r = extractor.extract(b)
                for ev in r.audit:
                    rows.append(
                        {
                            "run_id": run_id,
                            "partition_id": pid,
                            "url": url,
                            "event_type": ev.get("event_type", ""),
                            "tag": ev.get("tag", ""),
                            "attribute": ev.get("attribute", ""),
                            "blocked_url": ev.get("blocked_url", ""),
                            "message": ev.get("message", ""),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return audit_batch


def run_audit(
    df: DataFrame,
    config: Config | None = None,
    run_id: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Audit-event stage: one output row per blocked tag/attr/URL."""
    config = config or Config()
    projected = df.select("url", "html")
    if num_partitions:
        projected = salted_repartition(projected, num_partitions)
    return projected.mapInPandas(make_audit_batch(config, run_id), AUDIT_SCHEMA)


def dedup_pages_by_content(df: DataFrame) -> DataFrame:
    """Content-hash dedup BEFORE extraction — the Spark-idiomatic
    replacement for the reference's result cache (SURVEY.md §4.1): at
    10^12 docs an LRU is pointless, but crawls repeat pages; extracting
    each distinct html once and joining results back is the scalable
    equivalent. Returns one representative row per distinct html
    (keeps the min url for determinism)."""
    hashed = df.withColumn("__h", F.sha2(F.col("html"), 256))
    w_min = hashed.groupBy("__h").agg(F.min("url").alias("url"))
    return (
        hashed.join(w_min, on=["__h", "url"], how="inner")
        .drop("__h")
    )


def to_json_results(results: DataFrame) -> DataFrame:
    """JSON serialization of results — ExtractToJSON analogue
    (output.go:44-66) via the built-in `to_json` (ms durations, same field
    names as the reference's MarshalJSON, output.go:270-302)."""
    payload = F.struct(
        F.col("text"),
        F.col("title"),
        F.col("images"),
        F.col("links"),
        F.col("videos"),
        F.col("audios"),
        F.col("word_count"),
        F.col("reading_time_ms"),
        F.col("processing_time_ms"),
    )
    return results.select("url", F.to_json(payload).alias("json"))


def salted_repartition(df: DataFrame, num_partitions: int, salt: str = "htmlx") -> DataFrame:
    """Explicit skew-defeating shuffle on url-hash (north_rule requirement).

    Host-domain skew (many pages per domain) concentrates work when data is
    partitioned by crawl order or host; hashing the full url with a salt
    spreads rows uniformly. xxhash64 stays JVM-side (no Python roundtrip)."""
    return df.repartition(num_partitions, F.xxhash64(F.col("url"), F.lit(salt)))


def run_extraction(
    df: DataFrame,
    config: Config | None = None,
    run_id: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Main entry: pages DataFrame (url, html, ...) -> results DataFrame.

    Selects only (url, html) so Catalyst prunes every other column down to
    the parquet scan — `html` is the fat column; never read `text` here."""
    config = config or Config()
    projected = df.select("url", "html")
    if num_partitions:
        projected = salted_repartition(projected, num_partitions)
    return projected.mapInPandas(make_extract_batch(config, run_id), RESULT_SCHEMA)


def run_metrics(
    df: DataFrame,
    config: Config | None = None,
    run_id: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-partition metrics stage (audit-table rows with lineage)."""
    config = config or Config()
    projected = df.select("url", "html")
    if num_partitions:
        projected = salted_repartition(projected, num_partitions)
    return projected.mapInPandas(make_metrics_batch(config, run_id), METRICS_SCHEMA)


def make_all_links_batch(config: Config, run_id: str = ""):
    """mapInPandas batch function for the ExtractAllLinks mode
    (links.go:24-61: resource enumeration, no sanitization)."""
    from ..core.links import extract_all_links

    def links_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = _partition_id()
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                b = bytes(html) if html is not None else b""
                try:
                    resources = extract_all_links(b, config)
                    err = ""
                except Exception as exc:
                    resources, err = [], f"internal_panic: {type(exc).__name__}"
                rows.append(
                    {
                        "url": url,
                        "link_resources": resources,
                        "error": err,
                        "run_id": run_id,
                        "partition_id": pid,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in ALL_LINKS_SCHEMA.fields])

    return links_batch


def run_all_links(
    df: DataFrame,
    config: Config | None = None,
    run_id: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    config = config or Config()
    projected = df.select("url", "html")
    if num_partitions:
        projected = salted_repartition(projected, num_partitions)
    return projected.mapInPandas(make_all_links_batch(config, run_id), ALL_LINKS_SCHEMA)
