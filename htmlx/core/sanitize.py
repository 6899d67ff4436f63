"""DOM sanitization — port of internal/sanitize.go.

Removes script/style/noscript/iframe/embed/object/input/button/svg/math
subtrees, strips on*/formaction/autofocus attributes, dangerous CSS values,
and dangerous URI schemes (javascript:/vbscript:/file:, fullwidth-Unicode
variants, unsafe data: URLs). Each removal emits an audit event.
"""

from __future__ import annotations

import unicodedata

from .dom import ELEMENT, Node

# sanitize.go:10-26
TAGS_TO_REMOVE = frozenset(
    "script style noscript iframe embed object input button svg math".split()
)

# sanitize.go:30-34
DANGEROUS_ATTRIBUTES = frozenset(("formaction", "autofocus"))

# sanitize.go:37-43
DANGEROUS_CSS_PATTERNS = ("expression(", "behavior:", "-moz-binding:", "javascript:", "vbscript:")

# sanitize.go:70-85
URI_ATTRIBUTES = frozenset(
    "href src cite action data poster background longdesc usemap profile xlink:href".split()
)

MAX_AUDIT_URL_LENGTH = 256  # sanitize.go:48
MAX_DATA_URI_LENGTH = 100000  # constants.go:7

# sanitize.go:573-581
SAFE_MEDIA_TYPES = frozenset(
    (
        "image/gif image/jpeg image/jpg image/png image/webp image/bmp "
        "image/x-icon image/vnd.microsoft.icon image/avif image/apng "
        "font/woff font/woff2 font/ttf font/otf "
        "application/font-woff application/font-woff2 application/pdf"
    ).split()
)


class AuditRecorder:
    """Collects audit events as plain dict rows (SURVEY.md §2.2: audit rows
    are data appended to the audit table, replacing the reference's sink
    zoo, audit.go:157-640)."""

    __slots__ = ("events",)

    def __init__(self):
        self.events: list[dict] = []

    def record_blocked_tag(self, tag: str) -> None:
        self.events.append({"event_type": "blocked_tag", "tag": tag})

    def record_blocked_attr(self, attr: str, value: str) -> None:
        self.events.append({"event_type": "blocked_attr", "attribute": attr})

    def record_blocked_url(self, url: str, reason: str) -> None:
        self.events.append(
            {"event_type": "blocked_url", "blocked_url": _truncate_audit_url(url), "message": reason}
        )


NOOP_AUDIT = AuditRecorder()  # events list shared but unused when discarded


def _truncate_audit_url(url: str) -> str:
    """Byte-based truncation (Go len()/slice, sanitize.go:51-56). A slice
    that splits a multibyte char yields U+FFFD per stray byte — the same
    thing Go's JSON encoder emits for the invalid tail bytes."""
    if url.isascii():
        if len(url) <= MAX_AUDIT_URL_LENGTH:
            return url
        return url[:MAX_AUDIT_URL_LENGTH] + "...[truncated]"
    b = url.encode("utf-8")
    if len(b) <= MAX_AUDIT_URL_LENGTH:
        return url
    return b[:MAX_AUDIT_URL_LENGTH].decode("utf-8", "replace") + "...[truncated]"


def _sanitize_style_value(style: str) -> str:
    """sanitize.go:60-68."""
    lower = style.lower()
    for pattern in DANGEROUS_CSS_PATTERNS:
        if pattern in lower:
            return ""
    return style


def sanitize_dom(doc: Node, audit: AuditRecorder) -> None:
    """Port of SanitizeDOM / sanitizeNodeWithAudit (sanitize.go:94-225)."""
    if doc is None:
        return
    _sanitize_node(doc, audit)


def _sanitize_node(n: Node, audit: AuditRecorder) -> None:
    if n.type == ELEMENT:
        tag = n.data.lower()
        if tag in TAGS_TO_REMOVE:
            audit.record_blocked_tag(n.data)
            if n.parent is not None:
                n.parent.remove_child(n)
            return
        if n.attrs:
            out = []
            modified = False
            for key, val in n.attrs:
                k = key.lower()
                if len(k) >= 2 and k.startswith("on"):
                    audit.record_blocked_attr(key, val)
                    modified = True
                    continue
                if k in DANGEROUS_ATTRIBUTES:
                    audit.record_blocked_attr(key, val)
                    modified = True
                    continue
                if k == "style":
                    sanitized = _sanitize_style_value(val)
                    if sanitized == "":
                        audit.record_blocked_attr(key, val)
                        modified = True
                        continue
                    if sanitized != val:
                        val = sanitized
                        modified = True
                if k in URI_ATTRIBUTES:
                    if not _is_safe_uri(val, audit):
                        modified = True
                        continue
                out.append((key, val))
            if modified:
                n.attrs = out
    child = n.first_child
    while child is not None:
        nxt = child.next_sibling
        _sanitize_node(child, audit)
        child = nxt


def _normalize_fullwidth_to_ascii(s: str) -> str:
    """sanitize.go:482-504 — fullwidth U+FF01-FF5E -> ASCII."""
    if not any("！" <= c <= "～" for c in s):
        return s
    return "".join(chr(ord(c) - 0xFEE0) if "！" <= c <= "～" else c for c in s)


def _is_dangerous_scheme(lower_uri: str, scheme: str) -> bool:
    """sanitize.go:465-477."""
    if lower_uri.startswith(scheme):
        return True
    return _normalize_fullwidth_to_ascii(lower_uri).startswith(scheme)


def _is_safe_uri(uri: str, audit: AuditRecorder) -> bool:
    """Port of isSafeURIWithAudit (sanitize.go:388-452). The fullwidth
    normalization is hoisted out of the per-scheme checks (pure perf; the
    reference recomputes it per scheme, sanitize.go:475-476)."""
    if uri == "":
        return True
    normalized = unicodedata.normalize("NFC", uri)
    trimmed = normalized.strip()
    lower_uri = trimmed.lower()
    fw = _normalize_fullwidth_to_ascii(lower_uri)

    for scheme, reason in (
        ("javascript:", "javascript scheme"),
        ("vbscript:", "vbscript scheme"),
        ("file:", "file scheme"),
    ):
        if lower_uri.startswith(scheme) or fw.startswith(scheme):
            audit.record_blocked_url(uri, reason)
            return False

    if trimmed.startswith("//"):
        rest_lower = trimmed[2:].lstrip(" \t\n\r").lower()
        rest_fw = _normalize_fullwidth_to_ascii(rest_lower)
        for scheme in ("javascript:", "vbscript:", "data:", "file:"):
            if rest_lower.startswith(scheme) or rest_fw.startswith(scheme):
                audit.record_blocked_url(uri, "dangerous protocol-relative URL")
                return False

    if lower_uri.startswith("data:"):
        if "image/svg+xml" in lower_uri:
            audit.record_blocked_url(uri, "svg data url")
            return False
        if not _is_valid_data_url(trimmed, audit):
            return False
    return True


def _is_valid_media_type(media_type: str) -> bool:
    """sanitize.go:589-609."""
    if not media_type:
        return False
    slash = media_type.find("/")
    if slash <= 0 or slash == len(media_type) - 1:
        return False
    for c in media_type:
        if not (c.isascii() and (c.isalnum() or c in "-+/._")):
            return False
    return True


def _is_base64_char(c: str) -> bool:
    return c.isascii() and (c.isalnum() or c in "+/")


def _is_valid_data_url(url: str, audit: AuditRecorder) -> bool:
    """Port of isValidDataURLWithAudit (sanitize.go:506-569)."""
    if not url.startswith("data:"):
        return False
    comma = url.find(",")
    if comma == -1 or comma == 5:
        audit.record_blocked_url(url, "malformed data URL")
        return False
    media_part = url[5:comma]
    data_part = url[comma + 1 :]
    # UTF-8 byte cap (Go len(), sanitize.go:522); chars <= bytes so the
    # encode only runs for non-ASCII URLs not already over in chars.
    if len(url) > MAX_DATA_URI_LENGTH or (
        not url.isascii() and len(url.encode("utf-8")) > MAX_DATA_URI_LENGTH
    ):
        audit.record_blocked_url(url, "data URL exceeds size limit")
        return False
    if media_part:
        if media_part.endswith(";base64"):
            media_type = media_part[: -len(";base64")]
        elif ";" in media_part:
            semi = media_part.find(";")
            media_type = media_part[:semi] if semi > 0 else ""
        else:
            media_type = media_part
        if media_type and not _is_valid_media_type(media_type):
            audit.record_blocked_url(url, "invalid media type in data URL")
            return False
        if media_type and media_type.lower().strip() not in SAFE_MEDIA_TYPES:
            audit.record_blocked_url(url, "unsafe media type in data URL: " + media_type)
            return False
    is_base64 = ";base64" in media_part
    for ch in data_part:
        b = ord(ch)
        if is_base64:
            if not _is_base64_char(ch) and ch not in "=\r\n":
                audit.record_blocked_url(url, "invalid base64 in data URL")
                return False
        else:
            if b < 9 or (11 <= b <= 12) or (14 <= b < 32) or b == 127:
                audit.record_blocked_url(url, "invalid character in data URL")
                return False
    return True
