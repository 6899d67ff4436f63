"""PDF structural parsing (codec-free; deep decode stubbed)."""

import pytest

from htmlx.spark.pdf import extract_pdf_text, parse_pdf_structure


def _fake_pdf(pages=2):
    body = b"%PDF-1.7\n"
    body += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    body += b"2 0 obj\n<< /Type /Pages /Count %d >>\nendobj\n" % pages
    for i in range(pages):
        body += b"%d 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n" % (3 + i)
    body += b"9 0 obj\n<< /Title (Test Doc) /Producer (htmlx) >>\nendobj\n"
    body += b"10 0 obj\n<< >>\nstream\nxxxx\nendstream\nendobj\n"
    body += b"%%EOF\n"
    return body


def test_structure():
    meta = parse_pdf_structure(_fake_pdf(3))
    assert meta["pdf_version"] == "1.7"
    assert meta["n_pages"] == 3  # /Type /Pages excluded by the word boundary
    assert meta["n_objects"] == 7
    assert meta["n_streams"] >= 1
    assert meta["title"] == "Test Doc"
    assert meta["producer"] == "htmlx"
    assert meta["error"] == ""


def test_not_a_pdf():
    assert parse_pdf_structure(b"<html></html>")["error"] == "not_a_pdf"
    assert parse_pdf_structure(b"")["error"] == "not_a_pdf"


def test_text_decode_stubbed():
    with pytest.raises(NotImplementedError):
        extract_pdf_text(_fake_pdf())
