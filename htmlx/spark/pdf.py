"""PDF/layout-parse surface (north_rule: "HTML boilerplate strip, PDF/layout
parse, DOM heuristics").

No PDF rendering library exists in this container, so the text/layout
DECODE step is stubbed behind NotImplementedError — but the Spark plumbing
and the codec-free structural parsing are real and tested:

- header/version sniffing, page counting, object/stream census, and
  embedded-metadata extraction via raw byte scanning (no codec needed),
- the mapInPandas stage shape (schema, batching, error rows, lineage)
  identical to the HTML extraction stage.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PDF_META_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("pdf_version", StringType()),
        StructField("n_pages", IntegerType()),
        StructField("n_objects", IntegerType()),
        StructField("n_streams", IntegerType()),
        StructField("byte_len", LongType()),
        StructField("title", StringType()),
        StructField("producer", StringType()),
        StructField("error", StringType()),
    ]
)

_VERSION_RE = re.compile(rb"^%PDF-(\d\.\d)")
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")
_OBJ_RE = re.compile(rb"\d+\s+\d+\s+obj\b")
_STREAM_RE = re.compile(rb"\bstream\b")
_INFO_RE = {
    "title": re.compile(rb"/Title\s*\(([^)]{0,512})\)"),
    "producer": re.compile(rb"/Producer\s*\(([^)]{0,512})\)"),
}

MAX_PDF_SCAN = 10 * 1024 * 1024  # structural scan cap (DoS bound)


def parse_pdf_structure(payload: bytes) -> dict:
    """Codec-free structural parse of a PDF byte stream."""
    out = {
        "pdf_version": "",
        "n_pages": 0,
        "n_objects": 0,
        "n_streams": 0,
        "byte_len": len(payload),
        "title": "",
        "producer": "",
        "error": "",
    }
    if not payload.startswith(b"%PDF-"):
        out["error"] = "not_a_pdf"
        return out
    m = _VERSION_RE.match(payload)
    if m:
        out["pdf_version"] = m.group(1).decode("ascii", errors="replace")
    scan = payload[:MAX_PDF_SCAN]
    out["n_pages"] = len(_PAGE_RE.findall(scan))
    out["n_objects"] = len(_OBJ_RE.findall(scan))
    out["n_streams"] = len(_STREAM_RE.findall(scan))
    for key, rx in _INFO_RE.items():
        m = rx.search(scan)
        if m:
            out[key] = m.group(1).decode("latin-1", errors="replace")
    return out


def extract_pdf_text(payload: bytes) -> str:
    """Full text/layout extraction — requires a PDF renderer (pdfium/poppler)
    not present in this container; rows degrade to structural metadata with
    error='decoder_unavailable' (see extract_pdf_metadata)."""
    raise NotImplementedError("PDF text extraction requires pdfium/poppler (not in container)")


def extract_pdf_metadata(pdfs: DataFrame) -> DataFrame:
    """mapInPandas stage: (url, payload binary) -> structural metadata rows.
    Same stage shape as the HTML extraction job (per-row errors, Arrow
    batches); the deep text decode is stubbed per module docstring."""
    import pandas as pd

    def pdf_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PDF_META_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf["url"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                meta = parse_pdf_structure(b)
                if not meta["error"]:
                    try:
                        extract_pdf_text(b)
                    except NotImplementedError:
                        meta["error"] = "decoder_unavailable"
                rows.append({"url": url, **meta})
            yield pd.DataFrame(rows, columns=cols)

    return pdfs.mapInPandas(pdf_batch, PDF_META_SCHEMA)
