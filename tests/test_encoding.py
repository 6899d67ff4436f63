"""Encoding detection/conversion — ported from internal/encoding_test.go and
encoding_bytes_test.go (raw GBK/Shift_JIS/windows-1251 byte fixtures)."""

from htmlx.core.encoding import (
    detect_and_convert_to_utf8,
    detect_charset_basic,
    normalize_charset,
    to_utf8,
)


def test_normalize_charset_aliases():
    # encoding.go:44-100 alias table
    cases = {
        "UTF-8": "utf-8",
        "utf8": "utf-8",
        "GB2312": "gbk",
        "gbk": "gbk",
        "Shift-JIS": "shift_jis",
        "sjis": "shift_jis",
        "latin1": "iso-8859-1",
        "LATIN-1": "iso-8859-1",
        "windows-1252": "1252"
        and "windows-1252",  # windows- prefix stripped then aliased back
        "cp1251": "windows-1251",
        "ISO-8859-1": "iso-8859-1",
        "iso-8859-2": "iso-8859-2",  # iso- NOT stripped (encoding.go:540-545)
        "utf-16": "utf-16le",
        "big5-hkscs": "big5",
        "euc_kr": "euc-kr",
    }
    for raw, want in cases.items():
        assert normalize_charset(raw) == want, raw


def test_bom_detection():
    assert detect_charset_basic(b"\xef\xbb\xbfHello") == "utf-8"
    assert detect_charset_basic(b"\xfe\xff\x00H") == "utf-16be"
    assert detect_charset_basic(b"\xff\xfeH\x00") == "utf-16le"


def test_pure_ascii_default_utf8():
    assert detect_charset_basic(b"<html><body>hello</body></html>") == "utf-8"
    assert detect_charset_basic(b"") == "utf-8"


def test_meta_charset_on_ascii():
    html = b'<html><head><meta charset="gbk"></head><body>ascii only</body></html>'
    assert detect_charset_basic(html) == "gbk"
    html2 = b'<meta http-equiv="Content-Type" content="text/html; charset=shift_jis">'
    assert detect_charset_basic(html2) == "shift_jis"


def test_valid_utf8_trusted_over_meta():
    # encoding.go:362-384: valid UTF-8 with non-ASCII wins over wrong meta
    html = '<html><head><meta charset="gbk"></head><body>中文内容</body></html>'.encode("utf-8")
    assert detect_charset_basic(html) == "utf-8"


def test_invalid_bytes_fallback_windows1252():
    # bytes invalid as UTF-8, no meta -> windows-1252 (encoding.go:406-407)
    assert detect_charset_basic(b"caf\xe9 au lait") == "windows-1252"


def test_gbk_roundtrip():
    # NOTE: meta tag present — without one, GBK bytes that decode cleanly
    # under cp1252 score 90 and the reference's step-1 early exit
    # (encoding.go:431-437) picks windows-1252; our port matches that quirk.
    text = "中文测试页面内容，这是一段较长的中文文本。"
    raw = ('<html><head><meta charset="gb2312"></head><body>' + text + "</body></html>").encode("gbk")
    converted, charset = detect_and_convert_to_utf8(raw)
    assert text in converted
    assert charset == "gbk"


def test_shift_jis_roundtrip():
    text = "日本語のテストページです。これは長めの文章です。"
    raw = ('<html><head><meta charset="shift_jis"></head><body>' + text + "</body></html>").encode(
        "shift_jis"
    )
    converted, charset = detect_and_convert_to_utf8(raw)
    assert text in converted


def test_windows1251_roundtrip():
    text = "Русский текст для проверки кодировки. Это довольно длинное предложение."
    raw = ('<html><head><meta charset="windows-1251"></head><body>' + text + "</body></html>").encode(
        "cp1251"
    )
    converted, _charset = detect_and_convert_to_utf8(raw)
    assert text in converted


def test_utf16le_bom_roundtrip():
    text = "UTF-16 content 中文"
    raw = ("<html><body>" + text + "</body></html>").encode("utf-16-le")
    raw = b"\xff\xfe" + raw
    converted, charset = detect_and_convert_to_utf8(raw)
    assert text in converted
    assert charset == "utf-16le"
    assert not converted.startswith("﻿")


def test_forced_encoding():
    raw = "café".encode("cp1252")
    converted, charset = detect_and_convert_to_utf8(raw, "windows-1252")
    assert converted == "café"
    assert charset == "windows-1252"


def test_nfc_normalization():
    # e + combining acute -> é (NFC), encoding.go:670
    raw = "café".encode("utf-8")
    converted, _ = detect_and_convert_to_utf8(raw)
    assert converted == "café"


def test_to_utf8_unknown_charset_passthrough():
    assert to_utf8(b"hello", "x-unknown-charset") == "hello"


def test_eucjp_roundtrip():
    text = "日本語のテキストです。長めの文章で検証します。"
    raw = ('<html><head><meta charset="euc-jp"></head><body>' + text + "</body></html>").encode("euc_jp")
    converted, charset = detect_and_convert_to_utf8(raw)
    assert text in converted
    assert charset == "euc-jp"


def test_big5_roundtrip():
    text = "繁體中文測試頁面，包含足夠長度的內容。"
    raw = ('<html><head><meta charset="big5"></head><body>' + text + "</body></html>").encode("big5")
    converted, charset = detect_and_convert_to_utf8(raw)
    assert text in converted
    assert charset == "big5"


def test_euckr_roundtrip():
    text = "한국어 텍스트 테스트 페이지입니다. 충분히 긴 내용입니다."
    raw = ('<html><head><meta charset="euc-kr"></head><body>' + text + "</body></html>").encode("euc_kr")
    converted, charset = detect_and_convert_to_utf8(raw)
    assert text in converted
    assert charset == "euc-kr"


def test_iso8859_7_greek():
    text = "Ελληνικό κείμενο δοκιμής με αρκετό μήκος."
    raw = ('<html><head><meta charset="iso-8859-7"></head><body>' + text + "</body></html>").encode("iso8859-7")
    converted, charset = detect_and_convert_to_utf8(raw)
    assert text in converted
