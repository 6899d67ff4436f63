"""Namespace/XBRL/SEC custom-tag handling — ported from
internal/extraction_namespace_test.go and extraction_whitespace_test.go."""

import pytest

from htmlx.core.dom import ELEMENT, parse, walk_nodes
from htmlx.core.elements import (
    get_namespace_prefix,
    is_known_inline_namespace_prefix,
    is_namespace_tag,
    should_treat_namespace_tag_as_inline,
)
from htmlx.core.extraction import extract_text_with_structure_and_images


def render_fields(html: str) -> str:
    """Reference harness: render then collapse all whitespace
    (extraction_namespace_test.go:62-75)."""
    out = extract_text_with_structure_and_images(parse(html), None, "markdown")
    return " ".join(out.split())


# extraction_namespace_test.go:18-59 (Contains-style on field-collapsed text)
NS_CASES = [
    (
        "(<ix:nonnumeric>707</ix:nonnumeric>) <ix:nonnumeric>774-7000</ix:nonnumeric>",
        "707 ) 774-7000",
    ),
    ("<p>\n    Net income: <xbrl:value unit=\"USD\">1000000</xbrl:value>\n</p>", "Net income: 1000000"),
    ("<div>\n    City: <dei:CityAreaCode>707</dei:CityAreaCode>\n</div>", "City: 707"),
    (
        "<span>\n<ix:nonnumeric>A</ix:nonnumeric>\n<ix:nonnumeric>B</ix:nonnumeric>\n<ix:nonnumeric>C</ix:nonnumeric>\n</span>",
        "A B C",
    ),
    ("<span>\nText <custom:value>123</custom:value> more text\n</span>", "Text123 more text"),
    (
        "<div><ix:nonnumeric>This is a very long text content that exceeds fifty characters and should be treated as a block element because it has substantial content</ix:nonnumeric></div>",
        "This is a very long text content that exceeds fifty characters",
    ),
]


@pytest.mark.parametrize("html,want", NS_CASES, ids=[c[1][:30] for c in NS_CASES])
def test_namespace_rendering(html, want):
    assert want in render_fields(html)


# extraction_namespace_test.go:84-100 helper-function table
TAG_CASES = [
    ("ix:nonnumeric", True, "ix", True),
    ("xbrl:value", True, "xbrl", True),
    ("dei:cityareacode", True, "dei", True),
    ("us-gaap:revenue", True, "us-gaap", True),
    ("ifrs:assets", True, "ifrs", True),
    ("link:something", True, "link", True),
    ("custom:tag", True, "custom", False),
    ("div", False, "", False),
    ("span", False, "", False),
    ("p", False, "", False),
]


@pytest.mark.parametrize("tag,is_ns,prefix,known", TAG_CASES, ids=[c[0] for c in TAG_CASES])
def test_namespace_tag_helpers(tag, is_ns, prefix, known):
    assert is_namespace_tag(tag) is is_ns
    assert get_namespace_prefix(tag) == prefix
    assert is_known_inline_namespace_prefix(prefix) is known


def _first_ns_node(html: str):
    doc = parse(html)
    found = []

    def visit(n):
        if n.type == ELEMENT and ":" in n.data:
            found.append(n)
            return False
        return True

    walk_nodes(doc, visit)
    return found[0]


# extraction_namespace_test.go:125-150 inline classification
INLINE_CASES = [
    ("<span><ix:nonnumeric>707</ix:nonnumeric></span>", True),
    ("<div><ix:nonnumeric>707</ix:nonnumeric></div>", True),
    (
        "<div><ix:nonnumeric>This is a very long text content that exceeds fifty characters limit</ix:nonnumeric></div>",
        False,
    ),
    ("<span><custom:value>123</custom:value></span>", True),
]


@pytest.mark.parametrize("html,want", INLINE_CASES, ids=[str(i) for i in range(len(INLINE_CASES))])
def test_namespace_inline_classification(html, want):
    assert should_treat_namespace_tag_as_inline(_first_ns_node(html)) is want


def test_sec_style_tags_block():
    # SEC-style uppercase/hyphen tags classify as blocks dynamically
    html = "<sec-document><sec-header>ACCEPTANCE-DATETIME: 20240101</sec-header><type>10-K</type></sec-document>"
    out = extract_text_with_structure_and_images(parse(html), None, "markdown")
    assert "ACCEPTANCE-DATETIME: 20240101" in out
    assert "10-K" in out


def test_padding_left_indent():
    # helpers.go:1099-1166 pt -> markdown nesting prefix
    html = (
        '<div style="padding-left:20pt">level one</div>'
        '<div style="padding-left:50pt">level two</div>'
        '<div style="padding-left:100pt">level three</div>'
    )
    out = extract_text_with_structure_and_images(parse(html), None, "markdown")
    # level-1 prefix is "  - " (leading strip affects only the first line)
    assert out.startswith("  - level one")
    assert "    - level two" in out
    assert "      - level three" in out


def test_sec_full_document():
    """extraction_custom_tags_test.go:12-84 — full SEC Form-4 structure:
    block-classified custom tags create >=3 paragraph separations and all
    key content survives."""
    html = """<SEC-DOCUMENT>0002022111-26-000002.txt : 20260130
<SEC-HEADER>0002022111-26-000002.hdr.sgml : 20260130
<ACCEPTANCE-DATETIME>20260130180232
ACCESSION NUMBER:\t\t0002022111-26-000002
CONFORMED SUBMISSION TYPE:\t4
PUBLIC DOCUMENT COUNT:\t1
</SEC-HEADER>
<DOCUMENT>
<TYPE>4
<SEQUENCE>1
<FILENAME>wk-form4_1769814146.xml
<DESCRIPTION>FORM 4
<TEXT>
<ownershipDocument>
    <schemaVersion>X0508</schemaVersion>
    <documentType>4</documentType>
    <periodOfReport>2026-01-29</periodOfReport>
    <issuer>
        <issuerCik>0001463101</issuerCik>
        <issuerName>Enphase Energy, Inc.</issuerName>
        <issuerTradingSymbol>ENPH</issuerTradingSymbol>
    </issuer>
</ownershipDocument>
</TEXT>
</DOCUMENT>
</SEC-DOCUMENT>"""
    out = extract_text_with_structure_and_images(parse(html), None, "markdown")
    lines = out.split("\n")
    paras = sum(1 for i in range(len(lines) - 1) if not lines[i].strip() and not lines[i + 1].strip())
    assert paras >= 3
    for c in ["0002022111-26-000002", "2026-01-29", "Enphase Energy, Inc.", "ENPH"]:
        assert c in out
