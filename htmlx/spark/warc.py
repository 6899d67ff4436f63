"""WARC ingest: Common-Crawl .warc / .warc.gz archives -> the engine's
pages table (url, warc_ts, html, ...).

The reference engine starts at HTML bytes (extractor.go takes content
[]byte); real crawl pipelines start one step earlier, at WARC archives
(ISO 28500 / WARC 1.1 — the Common Crawl container format). This module
is that ingest step, stdlib-only:

  - `.warc.gz`: each record is its own gzip MEMBER (the Common Crawl
    convention, warc-1.1 annex C) — members are split with
    zlib.decompressobj(31) and `unused_data`. A corrupt member is
    skipped by scanning forward for the next gzip magic
    (`\\x1f\\x8b\\x08`) and resuming there, so one damaged record does
    not poison the remaining ~1 GB of a Common-Crawl file; only a
    TRUNCATED trailing member ends the scan (nothing follows it).
  - record grammar (warc-1.1 §4): `WARC/1.x CRLF`, named fields, CRLF,
    a Content-Length-octets block, CRLF CRLF. Malformed records are
    skipped by re-synchronizing on the next `WARC/` magic.
  - response records carry an HTTP response in the block (§6.3): the
    status line + headers are stripped, `Content-Encoding: gzip/deflate`
    payloads are inflated, and the remaining body is the page html.
    Encodings with no codec in the runtime (`br`, `zstd` unless the
    optional libs are importable) and payloads that fail to inflate are
    kept as raw bytes with a NAMED degradation in the `warc_error`
    column — crawl dirt must degrade visibly, never decay into
    downstream `invalid_html` noise or kill a 100 TB job.

100 TB plan: `spark.read.format("binaryFile")` gives one row per
archive; gzip archives are non-splittable, so parallelism = file count
— exactly the Common Crawl layout (crawls ship as ~1 GB x ~72k files
per snapshot, ample for 1000 executors). Record splitting runs in
mapInPandas (per-file Python work is unavoidable for a byte-level
container format; each yielded batch is one archive's records, bounded
by the archive size). Executors must be sized to hold one archive in
memory (the same requirement any WARC reader has).
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

#: Output schema: the engine's pages-table core (url, warc_ts, html)
#: plus the WARC/HTTP envelope fields a curation pipeline filters on.
#: warc_error is the named-degradation channel: NULL for clean records,
#: else a ';'-joined list of markers (content_encoding_unavailable:br,
#: content_encoding_corrupt:gzip, chunked_framing_invalid,
#: archive_codec_unavailable:zstd) — content is kept raw where possible.
WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, warc_type string, "
    "http_status int, content_type string, warc_file string, "
    "warc_error string"
)

_CRLF2 = b"\r\n\r\n"
_GZ_MAGIC = b"\x1f\x8b\x08"


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream member by member (warc.gz:
    one record per member). A member that fails to inflate is SKIPPED
    by scanning forward for the next gzip magic and resuming there
    (Common-Crawl files do contain damaged members; before r8 the first
    one ended the scan and lost the rest of the archive). A member cut
    off at EOF ends the scan — nothing can follow it. False magic hits
    inside a corrupt member's compressed bytes just fail the next
    inflate attempt and the scan moves on. The tail is passed as a
    memoryview slice — a bytes slice here would COPY the remaining
    archive once per member, turning a 1 GB 100k-record Common-Crawl
    file into ~50 TB of memcpy."""
    mv = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(31)
        try:
            out = d.decompress(mv[pos:])
        except zlib.error:
            nxt = data.find(_GZ_MAGIC, pos + 1)
            if nxt < 0:
                return
            pos = nxt  # re-sync on the next member's magic
            continue
        if not d.eof:
            # consumed all input without finishing the member: a
            # truncated TRAILING member (nothing to recover), unless a
            # later member's magic exists — then this member was corrupt
            # in a way zlib tolerated, and the scan re-syncs like above
            nxt = data.find(_GZ_MAGIC, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        yield out
        unused = len(d.unused_data)
        if unused == 0:
            return
        pos = n - unused


def _parse_warc_date(s: str):
    """warc-1.1 §5.4 WARC-Date: W3C ISO 8601, UTC 'Z' suffix."""
    try:
        return datetime.fromisoformat(s.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        return None


def _iter_records(raw: bytes) -> Iterator[dict]:
    """Yield {headers: dict, block: bytes} per WARC record in a raw
    (already-decompressed) stream, re-syncing on 'WARC/' after damage."""
    pos = 0
    n = len(raw)
    while pos < n:
        start = raw.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = raw.find(_CRLF2, start)
        if hdr_end < 0:
            return
        lines = raw[start:hdr_end].split(b"\r\n")
        headers: dict = {}
        last_key = None
        for ln in lines[1:]:
            if ln[:1] in (b" ", b"\t") and last_key is not None:
                # warc-1.1 §4 allows folded (obs-fold) continuation lines
                headers[last_key] += " " + ln.strip().decode("latin-1", "replace")
                continue
            k, sep, v = ln.partition(b":")
            if sep:
                last_key = k.strip().lower().decode("latin-1")
                headers[last_key] = v.strip().decode("latin-1", "replace")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = start + 5  # malformed: re-sync past this magic
            continue
        block_start = hdr_end + 4
        if block_start + clen > n:
            return  # truncated record at EOF
        yield {"headers": headers, "block": raw[block_start : block_start + clen]}
        pos = block_start + clen


def _dechunk(body: bytes) -> bytes | None:
    """Undo HTTP/1.1 chunked transfer framing (RFC 9112 §7.1): hex size
    line (chunk extensions after ';' ignored), chunk octets, CRLF,
    terminated by a zero chunk. None when the framing doesn't parse —
    caller keeps the raw bytes (crawl dirt must degrade, not raise)."""
    out = []
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            return None
        size_field = body[pos:nl].split(b";")[0].strip()
        try:
            size = int(size_field, 16)
        except ValueError:
            return None
        if size == 0:
            return b"".join(out)  # trailers (if any) are not page bytes
        start = nl + 2
        if start + size > len(body):
            return None
        out.append(body[start : start + size])
        pos = start + size + 2  # skip the chunk's trailing CRLF


def _brotli_decompress(body: bytes) -> bytes | None:
    """Inflate a brotli payload when a codec is importable (brotli /
    brotlicffi are NOT baked into this runtime — the import-try is the
    degradation gate, not an expected path)."""
    try:
        import brotli  # type: ignore
    except ImportError:
        try:
            import brotlicffi as brotli  # type: ignore
        except ImportError:
            return None
    try:
        return brotli.decompress(body)
    except Exception:
        raise zlib.error("brotli payload corrupt")


def _zstd_decompress(body: bytes) -> bytes | None:
    """Inflate a zstd payload when a codec is importable (zstandard /
    stdlib compression.zstd, Python >= 3.14 — neither is in this
    runtime; same degradation gate as brotli)."""
    try:
        from compression import zstd  # type: ignore

        return zstd.decompress(body)
    except ImportError:
        pass
    except Exception:
        raise zlib.error("zstd payload corrupt")
    try:
        import zstandard  # type: ignore
    except ImportError:
        return None
    try:
        return zstandard.ZstdDecompressor().decompress(
            body, max_output_size=1 << 30
        )
    except Exception:
        raise zlib.error("zstd payload corrupt")


def _split_http_response(block: bytes):
    """(status:int|None, content_type:str, body:bytes, error:str|None)
    from an HTTP response block; chunked transfer framing undone first
    (WARC stores the raw HTTP message, so Common-Crawl bodies keep
    their framing), then Content-Encoding payloads inflated. Anything
    that cannot be decoded keeps its raw bytes and gets a NAMED marker
    in `error` (';'-joined when several apply): crawl dirt must degrade
    visibly, not raise mid-100TB-job or decay into invalid_html."""
    hdr_end = block.find(_CRLF2)
    if hdr_end < 0 or not block.startswith(b"HTTP/"):
        return None, "", block, None
    head = block[:hdr_end].decode("latin-1", "replace")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype, cenc, chunked = "", "", False
    for ln in lines[1:]:
        k, sep, v = ln.partition(":")
        if not sep:
            continue
        lk = k.strip().lower()
        if lk == "content-type":
            ctype = v.strip()
        elif lk == "content-encoding":
            cenc = v.strip().lower()
        elif lk == "transfer-encoding" and "chunked" in v.lower():
            chunked = True
    body = block[hdr_end + 4 :]
    errors: list[str] = []
    if chunked:
        dechunked = _dechunk(body)
        if dechunked is not None:
            body = dechunked
        else:
            errors.append("chunked_framing_invalid")
    if cenc in ("gzip", "x-gzip"):
        try:
            body = zlib.decompress(body, 31)
        except zlib.error:
            errors.append("content_encoding_corrupt:gzip")
    elif cenc == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(body, -15)  # raw-deflate servers
            except zlib.error:
                errors.append("content_encoding_corrupt:deflate")
    elif cenc in ("br", "zstd"):
        decode = _brotli_decompress if cenc == "br" else _zstd_decompress
        try:
            out = decode(body)
        except zlib.error:
            out, errors = body, errors + [f"content_encoding_corrupt:{cenc}"]
        if out is None:
            errors.append(f"content_encoding_unavailable:{cenc}")
        else:
            body = out
    elif cenc not in ("", "identity"):
        errors.append(f"content_encoding_unavailable:{cenc}")
    return status, ctype, body, ";".join(errors) or None


def iter_warc_pages(
    path: str, content: bytes, record_types: tuple = ("response",)
) -> Iterator[tuple]:
    """All wanted-record rows (url, ts, body, type, status, ctype, file,
    error) from one archive's bytes — the per-file worker, pure Python.
    record_types selects WARC-Type values: ('response',) for page
    archives (HTTP envelope stripped); ('conversion',) for WET
    extracted-text archives (block used verbatim — warc-1.1 §6.8 stores
    the derived text directly, no HTTP envelope, status stays NULL).
    A `.warc.zst` archive with no zstd codec in the runtime (the case
    here) yields ONE degradation row (html NULL,
    warc_error='archive_codec_unavailable:zstd') instead of raising —
    the 100 TB job keeps going and the loss is named, not silent."""
    if path.endswith(".zst"):
        try:
            inflated = _zstd_decompress(content)
            marker = "archive_codec_unavailable:zstd"
        except zlib.error:
            inflated, marker = None, "archive_corrupt:zstd"
        if inflated is None:
            yield ("", None, None, "archive", None, "", path, marker)
            return
        streams: Iterator[bytes] = iter((inflated,))
    elif path.endswith(".gz"):
        streams = _gzip_members(content)
    else:
        streams = iter((content,))
    for raw in streams:
        for rec in _iter_records(raw):
            h = rec["headers"]
            wtype = h.get("warc-type", "")
            if wtype not in record_types:
                continue
            url = h.get("warc-target-uri", "")
            if url.startswith("<") and url.endswith(">"):
                url = url[1:-1]  # warc-1.0 angle-bracket form
            if wtype == "response":
                status, ctype, body, err = _split_http_response(rec["block"])
            else:
                status, ctype, body, err = (
                    None, h.get("content-type", ""), rec["block"], None,
                )
            yield (
                url,
                _parse_warc_date(h.get("warc-date", "")),
                body,
                wtype,
                status,
                ctype or h.get("content-type", ""),
                path,
                err,
            )


def read_warc(
    spark: SparkSession, path, record_types: tuple = ("response",)
) -> DataFrame:
    """Read .warc/.warc.gz archives under `path` (file, dir, glob, or a
    LIST of paths — e.g. the cdx_archive_pruning selection) into a pages
    DataFrame (WARC_PAGES_SCHEMA) of the HTTP *response* records — ready
    for run_extraction / latest_capture / url_filter.
    One archive = one binaryFile row = one Python task."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows = list(iter_warc_pages(path_, bytes(content), record_types))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=[
                            "url", "warc_ts", "html", "warc_type",
                            "http_status", "content_type", "warc_file",
                            "warc_error",
                        ],
                    )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(gen, WARC_PAGES_SCHEMA)


#: Parsed CDXJ index row: everything a pruning join needs to decide
#: which archives (and which byte ranges, on a range-capable reader)
#: contain wanted records.
CDX_SCHEMA = (
    "surt string, warc_ts timestamp, url string, mime string, status int, "
    "digest string, length long, offset long, filename string"
)

_CDXJ_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Read a Common-Crawl-style CDXJ capture index (the `cc-index`
    text files: one line per capture, `SURT-key timestamp14 {json}`)
    into CDX_SCHEMA. 100 TB plan: real Common-Crawl jobs prune by
    url/host/status BEFORE touching archive bytes — a snapshot's index
    is ~200 GB of text vs ~100 TB of WARC, so a keep-list join against
    this table followed by cdx_archive_pruning cuts the archive scan to
    the files (at byte granularity: the (filename, offset, length)
    triples) that actually contain wanted records.

    Entirely JVM-side: text scan -> one split -> from_json -> casts
    (zero Python; .gz index files are non-splittable per file, matching
    the published ~300-file sharding; plain text splits freely).
    Malformed lines (bad json, missing url/filename) are dropped —
    an INDEX row carries no content, so degradation means falling back
    to reading the archive itself."""
    from pyspark.sql import functions as F

    lines = spark.read.text(path)
    parts = F.split(F.col("value"), " ", 3)
    # try_element_at: a malformed line may split into fewer than 3 parts
    # (element_at would throw mid-scan); NULL json then drops the row
    js = F.from_json(F.try_element_at(parts, F.lit(3)), _CDXJ_JSON_SCHEMA)
    return (
        lines.select(
            F.try_element_at(parts, F.lit(1)).alias("surt"),
            F.try_to_timestamp(
                F.try_element_at(parts, F.lit(2)), F.lit("yyyyMMddHHmmss")
            ).alias("warc_ts"),
            js.alias("j"),
        )
        .where(F.col("j").isNotNull() & F.col("j.url").isNotNull()
               & F.col("j.filename").isNotNull())
        .select(
            "surt",
            "warc_ts",
            F.col("j.url").alias("url"),
            F.col("j.mime").alias("mime"),
            F.col("j.status").cast("int").alias("status"),
            F.col("j.digest").alias("digest"),
            F.col("j.length").cast("long").alias("length"),
            F.col("j.offset").cast("long").alias("offset"),
            F.col("j.filename").alias("filename"),
        )
    )


def cdx_archive_pruning(cdx: DataFrame, keep_urls: DataFrame) -> DataFrame:
    """Join a url keep-list against a CDX index and return the archive
    files worth reading: (filename, n_records, bytes_selected). The
    downstream read then loads ONLY those archives (read_warc over the
    explicit file list) and record-filters by url — file-level pruning
    today, and the byte ranges for a range-read fetcher are one groupBy
    away from the same join. keep_urls needs a `url` column; the join
    key is uniform (url), no broadcast hint — at scale both sides are
    large and AQE picks the build side."""
    from pyspark.sql import functions as F

    return (
        cdx.join(keep_urls.select("url").distinct(), "url")
        .groupBy("filename")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_records"),
            F.sum("length").cast("long").alias("bytes_selected"),
        )
    )


WET_SCHEMA = (
    "url string, warc_ts timestamp, text string, content_type string, "
    "wet_file string"
)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET extracted-text archives (.warc.wet/.warc.wet.gz —
    Common Crawl's own boilerplate-stripped text, stored as
    'conversion' records) into (url, warc_ts, text, content_type,
    wet_file). The natural A/B input for comparing this engine's
    extraction against the crawl's published text (e.g. join on url,
    diff token counts). UTF-8 per the WET convention, decoded in the
    same Python pass that splits records with errors='replace' —
    Spark's own `decode` raises MALFORMED_CHARACTER_CODING on crawl
    dirt, which is unacceptable mid-100TB-job."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                rows = [
                    (url, ts, body.decode("utf-8", "replace"), ctype, path_)
                    for (url, ts, body, _t, _s, ctype, _f, _e) in iter_warc_pages(
                        path_, bytes(content), record_types=("conversion",)
                    )
                ]
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["url", "warc_ts", "text", "content_type", "wet_file"],
                    )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(gen, WET_SCHEMA)
