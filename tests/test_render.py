"""Golden tests for the structured text renderer.

Ported from the reference's table-driven tests (exact string equality at the
raw-render layer, i.e. before CleanText, with strings.TrimSpace applied —
matching the reference harness internal/extraction_test.go:63-75):
  - internal/extraction_test.go
  - internal/extraction_block_elements_test.go
"""

import pytest

from htmlx.core.dom import parse
from htmlx.core.extraction import extract_text_with_structure_and_images


def render(html: str, with_images: bool = False, table_format: str = "markdown") -> str:
    doc = parse(html)
    counters = [0, 0] if with_images else None
    out = extract_text_with_structure_and_images(doc, counters, table_format)
    return out.strip()


# internal/extraction_test.go:10-61
STRUCTURE_CASES = [
    ("simple paragraph", "<p>Hello World</p>", "Hello World"),
    ("nested elements", "<div><p>First</p><p>Second</p></div>", "First\n\nSecond"),
    ("block elements add newlines", "<div>Text1</div><div>Text2</div>", "Text1\n\nText2"),
    ("inline elements add spaces", "<p>Hello <strong>World</strong> Test</p>", "Hello World Test"),
    ("script tags excluded", "<div>Visible<script>hidden</script></div>", "Visible"),
    ("style tags excluded", "<div>Visible<style>body{}</style></div>", "Visible"),
    ("nav tags excluded", "<div>Content<nav>Menu</nav></div>", "Content"),
    ("empty", "<div></div>", ""),
    ("whitespace only", "<p>   </p>", ""),
]


@pytest.mark.parametrize("name,html,want", STRUCTURE_CASES, ids=[c[0] for c in STRUCTURE_CASES])
def test_structure(name, html, want):
    assert render(html) == want


# internal/extraction_test.go:86-107 (list markers)
LIST_CASES = [
    (
        "unordered list markers",
        '<ul class="wp-block-list"><li>季度收入</li><li>数据中心</li><li>全年收入</li></ul>',
        "- 季度收入\n- 数据中心\n- 全年收入",
    ),
    ("ordered list markers", "<ol><li>第一项</li><li>第二项</li></ol>", "1. 第一项\n2. 第二项"),
    (
        "nested unordered list indentation",
        "<ul><li>顶层A<ul><li>嵌套1</li><li>嵌套2</li></ul></li><li>顶层B</li></ul>",
        "- 顶层A\n  - 嵌套1\n  - 嵌套2\n\n- 顶层B",
    ),
]


@pytest.mark.parametrize("name,html,want", LIST_CASES, ids=[c[0] for c in LIST_CASES])
def test_list_markers(name, html, want):
    assert render(html) == want


# internal/extraction_test.go:123-157 (image placeholders)
IMAGE_CASES = [
    ("single image", '<div><img src="test.jpg" alt="Test"></div>', "[IMAGE:1]", 1),
    ("multiple images", '<div><img src="1.jpg"><img src="2.jpg"></div>', "[IMAGE:1]\n[IMAGE:2]", 2),
    ("text with images", '<div>Before<img src="test.jpg">After</div>', "Before\n[IMAGE:1]\nAfter", 1),
    ("no images", "<div>Just text</div>", "Just text", 0),
]


@pytest.mark.parametrize("name,html,want,nimg", IMAGE_CASES, ids=[c[0] for c in IMAGE_CASES])
def test_image_placeholders(name, html, want, nimg):
    doc = parse(html)
    counters = [0, 0]
    got = extract_text_with_structure_and_images(doc, counters, "markdown").strip()
    assert got == want
    assert counters[0] == nimg


# internal/extraction_block_elements_test.go:100-186
BLOCK_SPACING_CASES = [
    ("main", "<main>Content 1</main><main>Content 2</main>", "Content 1\n\nContent 2"),
    ("figure", "<figure>Figure 1</figure><p>Text</p>", "Figure 1\n\nText"),
    (
        "dl",
        "<p>Before</p><dl><dt>Term</dt><dd>Definition</dd></dl><p>After</p>",
        "Before\n\nTerm\n: Definition\n\nAfter",
    ),
    (
        "dt tight to dd",
        "<dl><dt>Term 1</dt><dd>Def 1</dd><dt>Term 2</dt><dd>Def 2</dd></dl>",
        "Term 1\n: Def 1\n\nTerm 2\n: Def 2",
    ),
    ("fieldset", "<fieldset>Field 1</fieldset><fieldset>Field 2</fieldset>", "Field 1\n\nField 2"),
    ("details", "<details>Content 1</details><details>Content 2</details>", "Content 1\n\nContent 2"),
    (
        "summary",
        "<details><summary>Title</summary>Content</details><p>Text</p>",
        "Title\n\nContent\n\nText",
    ),
    ("dialog", "<dialog>Dialog 1</dialog><dialog>Dialog 2</dialog>", "Dialog 1\n\nDialog 2"),
    ("address", "<address>123 Main St</address><p>City</p>", "123 Main St\n\nCity"),
    ("canvas", "<canvas>Canvas 1</canvas><canvas>Canvas 2</canvas>", "Canvas 1\n\nCanvas 2"),
    (
        "thead no paragraph spacing",
        "<table><thead><th>H1</th></thead><tbody><td>D1</td></tbody></table>",
        "| H1  |\n| --- |\n| D1  |",
    ),
    (
        "table then text",
        "<table><tr><td>Row 1</td></tr></table><p>Text</p>",
        "| Row 1 |\n| --- |\n\n\nText",
    ),
    ("center no paragraph spacing", "<center>Text 1</center><center>Text 2</center>", "Text 1\nText 2"),
    ("br inline", "<p>Line 1<br>Line 2<br>Line 3</p>", "Line 1\nLine 2\nLine 3"),
    (
        "dl with inline markup",
        "<dl><dt><strong>Term</strong></dt><dd><em>Definition</em></dd></dl>",
        "Term\n: Definition",
    ),
]


@pytest.mark.parametrize("name,html,want", BLOCK_SPACING_CASES, ids=[c[0] for c in BLOCK_SPACING_CASES])
def test_block_spacing(name, html, want):
    assert render(html) == want


def test_figcaption_spacing():
    # extraction_block_elements_test.go:109-113 (with image counter active)
    got = render('<img src="test.jpg"><figcaption>Caption</figcaption><p>Text</p>', with_images=True)
    assert got == "[IMAGE:1]\nCaption\n\nText"


def test_empty_table_no_output():
    assert render("<table></table>") == ""
