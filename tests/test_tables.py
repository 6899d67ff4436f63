"""Table rendering — ported from internal/table/renderer_test.go semantics:
alignment majority votes, colspan expansion, structure rows, HTML mode."""

from htmlx.core.dom import parse
from htmlx.core.extraction import extract_text_with_structure_and_images


def render(html: str, table_format: str = "markdown") -> str:
    return extract_text_with_structure_and_images(parse(html), None, table_format).strip()


def test_simple_table():
    got = render("<table><tr><th>Header1</th><th>Header2</th></tr><tr><td>Cell1</td><td>Cell2</td></tr></table>")
    assert got == "| Header1 | Header2 |\n| --- | --- |\n| Cell1   | Cell2   |"


def test_alignment_attributes():
    got = render(
        '<table><tr><th align="left">Left</th><th align="right">Right</th><th align="center">Mid</th></tr>'
        '<tr><td align="left">L1</td><td align="right">R1</td><td align="center">C1</td></tr></table>'
    )
    lines = got.split("\n")
    assert lines[1] == "| :--- | ---: | :--: |"
    # right-aligned pads on the left, center splits padding
    assert lines[0] == "| Left | Right | Mid |"
    assert lines[2] == "| L1   |    R1 | C1  |"


def test_text_align_style():
    got = render(
        '<table><tr><td style="text-align: right">R</td></tr><tr><td style="text-align:right">R2</td></tr></table>'
    )
    assert "---:" in got


def test_mixed_left_right_gives_default():
    got = render(
        '<table><tr><td align="left">A</td></tr><tr><td align="right">B</td></tr></table>'
    )
    assert ":---" not in got and "---:" not in got
    assert "| --- |" in got


def test_colspan_expansion():
    got = render(
        '<table><tr><th colspan="2">Span</th></tr><tr><td>A</td><td>B</td></tr></table>'
    )
    # colspan cell expands to a placeholder cell; both columns rendered
    lines = got.split("\n")
    assert lines[0].startswith("| Span")
    assert "| A" in lines[2] and "B" in lines[2]


def test_structure_row_skipped_markdown():
    # width-only rows define column widths but are not rendered in markdown
    got = render(
        '<table><tr><td width="100"> </td><td width="200"> </td></tr>'
        "<tr><td>A</td><td>B</td></tr><tr><td>C</td><td>D</td></tr></table>"
    )
    lines = got.split("\n")
    assert len(lines) == 3  # header A|B, separator, C|D — structure row gone
    assert "100" not in got


def test_ragged_rows_padded():
    got = render("<table><tr><td>A</td><td>B</td><td>C</td></tr><tr><td>D</td><td>E</td></tr></table>")
    lines = got.split("\n")
    assert lines[0].count("|") == 4
    assert lines[2].count("|") == 4


def test_min_column_width_three():
    got = render("<table><tr><th>H1</th></tr><tr><td>D1</td></tr></table>")
    assert got == "| H1  |\n| --- |\n| D1  |"


def test_html_format():
    got = render(
        '<table><tr><th align="center" colspan="2">H</th></tr><tr><td rowspan="2">D</td></tr></table>',
        table_format="html",
    )
    assert got.startswith("<table>")
    assert '<th style="text-align:center" colspan="2">H</th>' in got
    assert '<td rowspan="2">D</td>' in got
    assert got.endswith("</table>")


def test_cjk_width_uses_bytes():
    # Go pads by byte length; CJK chars count 3 bytes each
    got = render("<table><tr><th>中文</th></tr><tr><td>ab</td></tr></table>")
    lines = got.split("\n")
    # "中文" = 6 bytes -> column width 6; "ab" padded with 4 spaces
    assert lines[0] == "| 中文 |"
    assert lines[2] == "| ab     |"


def test_implied_tbody():
    # <tr> directly under <table> must behave as if wrapped in tbody
    a = render("<table><tr><td>X</td></tr></table>")
    b = render("<table><tbody><tr><td>X</td></tr></tbody></table>")
    assert a == b == "| X   |\n| --- |"


def test_nbsp_only_cell_is_blank():
    got = render('<table><tr><td width="50"> </td></tr><tr><td>A</td></tr></table>')
    # NBSP-only width row is a structure row -> skipped
    assert got == "| A   |\n| --- |"
