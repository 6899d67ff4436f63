"""URL resolution golden tables — ported from internal/url_test.go."""

import pytest

from htmlx.core.urlutil import (
    extract_domain,
    is_different_domain,
    normalize_base_url,
    resolve_url,
)

# url_test.go:166-246
NORMALIZE_CASES = [
    ("http://example.com", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/", "https://example.com/"),
    ("http://example.com/path", "http://example.com/"),
    ("//example.com", "//example.com/"),
    ("//example.com/", "//example.com/"),
    ("/path/to/page", "/path/to/"),
    ("path/to/page", "path/to/"),
    ("", ""),
    ("javascript:void(0)", ""),
    ("data:text/html,<html></html>", ""),
    ("mailto:test@example.com", ""),
    ("ftp://example.com", ""),
    ("http://example.com/path#fragment", "http://example.com/"),
]


@pytest.mark.parametrize("url,want", NORMALIZE_CASES, ids=[repr(c[0]) for c in NORMALIZE_CASES])
def test_normalize_base_url(url, want):
    assert normalize_base_url(url) == want


# url_test.go:264-366
RESOLVE_CASES = [
    ("http://example.com/path/", "http://other.com/page", "http://other.com/page"),
    ("http://example.com/path/", "https://other.com/page", "https://other.com/page"),
    ("http://example.com/path/", "//other.com/page", "//other.com/page"),
    ("http://example.com/path/to/page/", "/other/path", "http://example.com/other/path"),
    ("http://example.com/path", "/other", "http://example.com/other"),
    ("http://example.com/path/", "other/page.html", "http://example.com/path/other/page.html"),
    ("http://example.com/path/", "./page.html", "http://example.com/path/./page.html"),
    ("http://example.com/path/", "../page.html", "http://example.com/path/../page.html"),
    ("http://example.com/path/", "", ""),
    ("", "page.html", "page.html"),
    ("", "", ""),
    ("http://example.com/path/", "?query=value", "http://example.com/path/?query=value"),
    ("http://example.com/path/", "#section", "http://example.com/path/#section"),
    ("http://example.com", "/other/path", "http://example.com/other/path"),
    ("example.com", "/other/path", "/other/path"),
]


@pytest.mark.parametrize("base,rel,want", RESOLVE_CASES, ids=[f"{c[0]}|{c[1]}" for c in RESOLVE_CASES])
def test_resolve_url(base, rel, want):
    assert resolve_url(base, rel) == want


def test_extract_domain():
    assert extract_domain("https://example.com/path") == "example.com"
    assert extract_domain("//example.com/x") == "example.com"
    assert extract_domain("http://example.com:8080/x") == "example.com:8080"


def test_is_different_domain():
    assert is_different_domain("https://a.com/", "https://b.com/") is True
    assert is_different_domain("https://a.com/", "https://a.com/x") is False
    assert is_different_domain("/rel", "https://b.com/") is False
