"""URL validation and resolution — ports of internal/helpers.go:997-1075
and internal/url.go.

NOTE: ResolveURL deliberately does NOT collapse ``./``/``../`` segments
(url.go:134-145) — do not substitute ``urllib.parse.urljoin``, which does.
"""

from __future__ import annotations

import re

MAX_URL_LENGTH = 2000  # constants.go:6
MAX_DATA_URI_LENGTH = 100000  # constants.go:7

# rejection sets of the reference's per-char validation loops
# (helpers.go:1009-1031), compiled so the scan runs in C
_URL_BAD = re.compile(r"[\x00-\x1f\x7f<>\"']")
_DATA_URI_BAD = re.compile(r"[^\x20-\x7e]|[<>\"'\\]")


def is_valid_url(url: str) -> bool:
    """Port of IsValidURL (helpers.go:997-1075).

    Length caps are UTF-8 BYTE lengths (Go len()), not characters — a
    non-ASCII URL between 2000 bytes and 2000 chars must be rejected just
    like the reference rejects it."""
    if not url:
        return False
    n = len(url) if url.isascii() else len(url.encode("utf-8"))
    if n > MAX_URL_LENGTH:
        return False

    if url.startswith("data:"):
        if n > MAX_DATA_URI_LENGTH:
            return False
        # printable ASCII only, minus <>"'\ — same set as the char loop
        # this regex replaced (C-speed scan)
        return _DATA_URI_BAD.search(url, 5) is None

    if _URL_BAD.search(url) is not None:
        return False

    if url.startswith("//"):
        lower_rest = url[2:].lstrip(" \t\n\r").lower()
        if (
            lower_rest.startswith("javascript:")
            or lower_rest.startswith("vbscript:")
            or lower_rest.startswith("data:")
            or lower_rest.startswith("file:")
        ):
            return False
        return True

    if url.startswith("https://") or url.startswith("http://"):
        return True

    first = url[0]
    if first == "/":
        if n > 1 and (url[1] == "\\" or (url[1] == "." and (n == 2 or url[2] == "." or url[2] == "/"))):
            return False
        return True
    if first == ".":
        if url.startswith("./.") or url.startswith("../"):
            return False
        return True

    if first.isascii() and first.isalnum():
        return True
    return False


def is_external_url(url: str) -> bool:
    """url.go:7-11."""
    return url.startswith("http://") or url.startswith("https://") or url.startswith("//")


def extract_domain(url: str) -> str:
    """url.go:15-31."""
    start = 0
    idx = url.find("://")
    if idx >= 0:
        start = idx + 3
    elif url.startswith("//"):
        start = 2
    path_start = url.find("/", start)
    if path_start >= 0:
        return url[start:path_start]
    return url[start:]


def extract_base_from_url(url: str) -> str:
    """url.go:35-55."""
    if not is_external_url(url):
        return ""
    start = 0
    idx = url.find("://")
    if idx >= 0:
        start = idx + 3
    elif url.startswith("//"):
        start = 2
    path_start = url.find("/", start)
    if path_start >= 0:
        return url[: path_start + 1]
    return url + "/"


def normalize_base_url(base_url: str) -> str:
    """url.go:59-100."""
    if base_url == "":
        return ""
    if ":" in base_url and not base_url.startswith("http://") and not base_url.startswith("https://"):
        return ""
    if is_external_url(base_url):
        start = 0
        idx = base_url.find("://")
        if idx >= 0:
            start = idx + 3
        elif base_url.startswith("//"):
            start = 2
        path_start = base_url.find("/", start)
        if path_start >= 0:
            return base_url[: path_start + 1]
        return base_url + "/"
    last_slash = base_url.rfind("/")
    if last_slash < 0:
        return base_url + "/"
    if last_slash < len(base_url) - 1:
        return base_url[: last_slash + 1]
    return base_url


def _as_directory_base(base_url: str) -> str:
    """url.go:151-164."""
    if base_url.endswith("/"):
        return base_url
    path_start = 0
    scheme_idx = base_url.find("://")
    if scheme_idx >= 0:
        path_start = scheme_idx + 3
    last_slash = base_url.rfind("/", path_start)
    if last_slash >= path_start:
        return base_url[: last_slash + 1]
    return base_url + "/"


def resolve_url(base_url: str, relative_url: str) -> str:
    """Port of ResolveURL (url.go:104-145). Dot segments NOT collapsed."""
    if relative_url == "" or base_url == "":
        return relative_url
    if is_external_url(relative_url):
        return relative_url
    if len(relative_url) >= 2 and relative_url[0] == "/" and relative_url[1] == "/":
        if base_url.startswith("https:"):
            return "https:" + relative_url
        return "http:" + relative_url
    if relative_url[0] == "/":
        idx = base_url.find("://")
        if idx >= 0:
            domain_end = base_url.find("/", idx + 3)
            if domain_end >= 0:
                return base_url[:domain_end] + relative_url
            return base_url + relative_url
        return relative_url
    return _as_directory_base(base_url) + relative_url


def is_different_domain(base_url: str, target_url: str) -> bool:
    """url.go:168-177."""
    if not is_external_url(base_url) or not is_external_url(target_url):
        return False
    return extract_domain(base_url) != extract_domain(target_url)
