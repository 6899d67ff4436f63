"""Charset detection and conversion to UTF-8 — port of internal/encoding.go.

Decision tree (encoding.go:307-470): BOM sniff -> pure-ASCII fast path ->
meta-charset extraction (first 1024 bytes) -> utf8-validity trust-over-meta ->
statistical scoring across 13 candidate charsets -> windows-1252 fallback.
Conversion via Python ``codecs`` (the charset names map 1:1 to Go's
golang.org/x/text tables), then Unicode NFC normalization.
"""

from __future__ import annotations

import re
import unicodedata

# encoding.go:44-100
CHARSET_ALIASES = {
    "1252": "windows-1252",
    "cp1252": "windows-1252",
    "windows1252": "windows-1252",
    "1251": "windows-1251",
    "cp1251": "windows-1251",
    "windows1251": "windows-1251",
    "1250": "windows-1250",
    "cp1250": "windows-1250",
    "windows1250": "windows-1250",
    "8859-1": "iso-8859-1",
    "88591": "iso-8859-1",
    "iso88591": "iso-8859-1",
    "iso_8859-1": "iso-8859-1",
    "iso_8859_1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "8859-15": "iso-8859-15",
    "885915": "iso-8859-15",
    "iso885915": "iso-8859-15",
    "iso_8859-15": "iso-8859-15",
    "iso_8859_15": "iso-8859-15",
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "utf_8": "utf-8",
    "utf16": "utf-16le",
    "utf-16": "utf-16le",
    "utf_16": "utf-16le",
    "utf16le": "utf-16le",
    "utf-16le": "utf-16le",
    "utf16be": "utf-16be",
    "utf-16be": "utf-16be",
    "shift_jis": "shift_jis",
    "shift-jis": "shift_jis",
    "shiftjis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "euc-jp": "euc-jp",
    "euc_jp": "euc-jp",
    "eucjp": "euc-jp",
    "euc-kr": "euc-kr",
    "euc_kr": "euc-kr",
    "euckr": "euc-kr",
    "gb2312": "gbk",
    "gb2312-80": "gbk",
    "gb2312_80": "gbk",
    "gbk": "gbk",
    "big5": "big5",
    "big-5": "big5",
    "big5-hkscs": "big5",
}

# canonical charset -> Python codec name (getEncoding, encoding.go:564-619)
_PY_CODECS = {
    "windows-1252": "cp1252",
    "windows-1251": "cp1251",
    "windows-1250": "cp1250",
    "iso-8859-1": "iso8859-1",
    "iso-8859-15": "iso8859-15",
    "iso-8859-2": "iso8859-2",
    "iso-8859-3": "iso8859-3",
    "iso-8859-4": "iso8859-4",
    "iso-8859-5": "iso8859-5",
    "iso-8859-6": "iso8859-6",
    "iso-8859-7": "iso8859-7",
    "iso-8859-8": "iso8859-8",
    "iso-8859-9": "iso8859-9",
    "iso-8859-10": "iso8859-10",
    "iso-8859-13": "iso8859-13",
    "iso-8859-14": "iso8859-14",
    "iso-8859-16": "iso8859-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "shift_jis": "shift_jis",
    "euc-jp": "euc_jp",
    "iso-2022-jp": "iso2022_jp",
    "euc-kr": "euc_kr",
    "gbk": "gbk",
    "big5": "big5",
}

# encoding.go:34-35 — fallback regexes for meta charset
_CHARSET_RE = re.compile(
    rb"(?i)<meta\s+[^>]*http-equiv=[\"']?content-type[\"']?[^>]*content=[\"']?[^;]*;\s*charset=([^\"'\s>]+)"
)
_CHARSET_RE_ALT = re.compile(rb"(?i)<meta\s+charset=[\"']?([^\"'\s>]+)")

_norm_cache: dict[str, str] = {}


def normalize_charset(charset: str) -> str:
    """Port of normalizeCharset (encoding.go:520-561)."""
    cached = _norm_cache.get(charset)
    if cached is not None:
        return cached
    c = charset.strip().lower()
    # NOTE: "iso-"/"iso_" deliberately NOT stripped (encoding.go:540-545)
    for prefix in ("text/", "text-", "windows-", "cp", "codepage-", "ibm-"):
        if c.startswith(prefix):
            c = c[len(prefix) :]
    if c.startswith("latin") and len(c) > 5:
        result = "iso-8859-1"
    else:
        result = CHARSET_ALIASES.get(c, c)
    _norm_cache[charset] = result
    return result


def _is_valid_utf8(data: bytes) -> bool:
    try:
        data.decode("utf-8", errors="strict")
        return True
    except UnicodeDecodeError:
        return False


def _extract_charset_from_bytes(data: bytes) -> str:
    """Port of extractCharsetFromBytes (encoding.go:117-155)."""
    if not data:
        return ""
    sample = data[:1024]
    lower = sample.lower()
    idx = lower.find(b"<meta charset=")
    if idx >= 0 and idx + 14 < len(sample):
        cs = _extract_attr_value_bytes(sample[idx + 14 :])
        if cs:
            return cs
    remaining = lower
    orig = sample
    offset = 0
    while len(remaining) > 8:
        idx = remaining.find(b"charset=")
        if idx < 0:
            break
        cs = _extract_attr_value_bytes(orig[offset + idx + 8 :])
        if cs:
            return cs
        remaining = remaining[idx + 8 :]
        offset += idx + 8
    return ""


def _extract_attr_value_bytes(data: bytes) -> str:
    """encoding.go:195-238."""
    i = 0
    n = len(data)
    while i < n and data[i : i + 1] in (b" ", b"\t"):
        i += 1
    if i >= n:
        return ""
    data = data[i:]
    n = len(data)
    first = data[0:1]
    if first in (b'"', b"'"):
        end = data.find(first, 1)
        if end == -1:
            return ""
        return data[1:end].decode("ascii", errors="replace")
    end = 0
    while end < n:
        c = data[end : end + 1]
        if c in (b" ", b"\t", b">", b";", b'"', b"'"):
            break
        end += 1
    if end == 0:
        return ""
    return data[:end].decode("ascii", errors="replace")


def detect_charset_basic(data: bytes) -> str:
    """Port of DetectCharsetBasic (encoding.go:307-408)."""
    n = len(data)
    if n == 0:
        return "utf-8"
    if n >= 3 and data[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if n >= 2 and data[:2] == b"\xfe\xff":
        return "utf-16be"
    if n >= 2 and data[:2] == b"\xff\xfe":
        return "utf-16le"

    sample = data[:1024]
    is_pure_ascii = _is_pure_ascii(sample)
    if is_pure_ascii:
        declared = _extract_charset_from_bytes(sample)
        if declared:
            return normalize_charset(declared)
        return "utf-8"

    is_valid_utf8 = _is_valid_utf8(data)
    if is_valid_utf8:
        declared = _extract_charset_from_bytes(sample)
        if declared and normalize_charset(declared) == "utf-8":
            return "utf-8"
        # trust valid UTF-8 with non-ASCII content over the meta tag
        return "utf-8"

    declared = _extract_charset_from_bytes(sample)
    if declared:
        return normalize_charset(declared)
    m = _CHARSET_RE.search(sample)
    if m:
        return normalize_charset(m.group(1).decode("ascii", errors="replace"))
    m = _CHARSET_RE_ALT.search(sample)
    if m:
        return normalize_charset(m.group(1).decode("ascii", errors="replace"))
    return "windows-1252"


def _is_pure_ascii(data: bytes) -> bool:
    """isPureASCII (encoding.go:700-775) — bytes.isascii() is the vectorized
    CPython equivalent of the reference's 64-bit word scan."""
    return data.isascii()


# ---------------------------------------------------------------------------
# Statistical (smart) detection — encoding.go:411-470, 779-947
# ---------------------------------------------------------------------------

_CANDIDATES = (
    ("utf-8", 100),
    ("windows-1252", 90),
    ("gbk", 80),
    ("shift_jis", 75),
    ("euc-jp", 70),
    ("euc-kr", 65),
    ("big5", 60),
    ("iso-8859-1", 50),
    ("iso-8859-2", 45),
    ("windows-1250", 43),
    ("windows-1251", 40),
    ("iso-8859-5", 38),
    ("iso-2022-jp", 35),
)


def _printable_ratio(data: bytes) -> float:
    """encoding.go:976-995."""
    if not data:
        return 0.0
    sample = data[:4096]
    printable = 0
    for b in sample:
        if 32 <= b <= 126 or b in (9, 10, 13) or b >= 0x80:
            printable += 1
    return printable / len(sample)


def _valid_utf8_ratio(data: bytes) -> float:
    """encoding.go:1016-1086."""
    sample = data[:4096]
    n = len(sample)
    if n == 0:
        return 0.0
    valid = 0
    i = 0
    while i < n:
        b = sample[i]
        if b < 0x80:
            valid += 1
            i += 1
            continue
        if 0xC0 <= b < 0xE0:
            seq = 2
        elif 0xE0 <= b < 0xF0:
            seq = 3
        elif 0xF0 <= b < 0xF8:
            seq = 4
        else:
            i += 1
            continue
        if i + seq > n:
            i += 1
            continue
        ok = all((sample[i + j] & 0xC0) == 0x80 for j in range(1, seq))
        if ok:
            valid += 1
        i += seq
    return valid / n


def _count_cjk(text: str) -> int:
    """encoding.go:1089-1112."""
    count = 0
    for ch in text:
        r = ord(ch)
        if (
            0x4E00 <= r <= 0x9FFF
            or 0x3400 <= r <= 0x4DBF
            or 0x20000 <= r <= 0x2A6DF
            or 0x2A700 <= r <= 0x2B73F
            or 0x2B740 <= r <= 0x2B81F
            or 0x2B820 <= r <= 0x2CEAF
            or 0x2CEB0 <= r <= 0x2EBEF
            or 0x3040 <= r <= 0x309F
            or 0x30A0 <= r <= 0x30FF
            or 0xAC00 <= r <= 0xD7AF
            or 0xF900 <= r <= 0xFAFF
            or 0x2F800 <= r <= 0x2FA1F
        ):
            count += 1
    return count


def _has_cyrillic(text: str) -> bool:
    for ch in text:
        r = ord(ch)
        if 0x0400 <= r <= 0x052F or 0x2DE0 <= r <= 0x2DFF or 0xA640 <= r <= 0xA69F:
            return True
    return False


def _has_excessive_control_chars(data: bytes) -> bool:
    """encoding.go:1128-1141."""
    if not data:
        return False
    control = sum(1 for b in data if b < 32 and b not in (9, 10, 13))
    return control / len(data) > 0.05


def _decode(data: bytes, charset: str) -> bytes | None:
    codec = _PY_CODECS.get(charset)
    if codec is None:
        return None
    try:
        return data.decode(codec, errors="replace").encode("utf-8")
    except Exception:
        return None


def _score_utf8(data: bytes) -> int:
    """encoding.go:862-880 (caller guarantees valid UTF-8)."""
    score = 40
    if not _is_pure_ascii(data):
        score += 30
    score += int(_printable_ratio(data) * 20)
    score += int(_valid_utf8_ratio(data) * 10)
    return score


def _score_decoded(decoded: bytes, charset: str) -> int:
    """encoding.go:885-918."""
    score = 40
    if not _is_valid_utf8(decoded):
        return score - 50
    score += 30
    pr = _printable_ratio(decoded)
    if pr < 0.5:
        return score - 30
    score += int(pr * 20)
    if b"\xef\xbf\xbd" in decoded:
        score -= 15
    # language-specific patterns (encoding.go:921-947)
    text = decoded.decode("utf-8", errors="replace")
    cjk = _count_cjk(text)
    bonus = 0
    if cjk > 0:
        if charset in ("gbk", "big5", "shift_jis", "euc-jp", "euc-kr", "iso-2022-jp"):
            bonus += int(cjk / len(decoded) * 15)
        else:
            bonus -= 10
    if _has_cyrillic(text) and charset in ("windows-1251", "iso-8859-5"):
        bonus += 10
    score += bonus
    if _has_excessive_control_chars(decoded):
        score -= 10
    return score


def _score_encoding_match(data: bytes, charset: str, is_utf8_valid: bool) -> int:
    """encoding.go:827-854."""
    c = normalize_charset(charset)
    if c == "utf-8":
        if not is_utf8_valid:
            return 0
        return _score_utf8(data)
    decoded = _decode(data, c)
    if decoded is None:
        return 0
    return _score_decoded(decoded, c)


def _confidence(score: int, priority: int) -> int:
    """encoding.go:950-970."""
    confidence = score
    if priority >= 90:
        confidence += 5
    elif priority >= 70:
        confidence += 2
    return max(0, min(100, confidence))


def detect_charset_smart(data: bytes) -> tuple[str, int]:
    """Port of DetectCharsetSmart (encoding.go:411-470).

    Returns (charset, confidence)."""
    basic = detect_charset_basic(data)
    # ENGINE DIVERGENCE (deliberate, documented): a UTF-16 BOM is conclusive.
    # The reference's statistical scorer can override a BOM-detected utf-16
    # charset with windows-1252 for CJK-heavy content (utf-16 is absent from
    # tryAllEncodings' candidate list, encoding.go:780-798, and the step-1
    # score takes a -10 CJK penalty, encoding.go:929-935). Fixtures avoid the
    # divergent class; the BOM rule is strictly more correct.
    if len(data) >= 2 and data[:2] in (b"\xfe\xff", b"\xff\xfe"):
        return basic, 100
    is_utf8_valid = _is_valid_utf8(data)
    score = _score_encoding_match(data, basic, is_utf8_valid)
    if basic == "utf-8" and score >= 70:
        return basic, 90
    if score >= 90:
        return basic, 95

    best_charset = ""
    best_score = 0
    best_conf = 0
    for name, prio in _CANDIDATES:
        s = _score_encoding_match(data, name, is_utf8_valid)
        if s > 0:
            conf = _confidence(s, prio)
            if name == basic:
                s += 10
                conf += 5
            if s > best_score or (s == best_score and conf > best_conf):
                best_score = s
                best_conf = conf
                best_charset = name
            if conf >= 95 and s >= 90:
                break
    if best_conf < 50:
        return basic, 50
    return best_charset, best_conf


def to_utf8(data: bytes, charset: str) -> str:
    """Port of ToUTF8 (encoding.go:473-503) returning a str."""
    charset = normalize_charset(charset)
    if charset in ("utf-8", "utf8"):
        return data.decode("utf-8", errors="replace")
    codec = _PY_CODECS.get(charset)
    if codec is None:
        return data.decode("utf-8", errors="replace")
    return data.decode(codec, errors="replace")


def detect_and_convert_to_utf8(data: bytes, forced_encoding: str = "") -> tuple[str, str]:
    """Port of detectAndConvertToUTF8StringCore (encoding.go:632-673).

    Returns (utf8_text_nfc_normalized, charset)."""
    if forced_encoding == "":
        if _is_pure_ascii(data):
            return data.decode("ascii"), "utf-8"
        if _is_valid_utf8(data):
            return unicodedata.normalize("NFC", data.decode("utf-8")).lstrip("\ufeff"), "utf-8"
        charset, _conf = detect_charset_smart(data)
    else:
        charset = normalize_charset(forced_encoding)
    result = to_utf8(data, charset)
    # HTML5 input-stream preprocessing skips a leading BOM before tokenizing
    # (x/net/html does the same); Python's utf-16-le/be codecs do not strip it.
    return unicodedata.normalize("NFC", result).lstrip("\ufeff"), charset
