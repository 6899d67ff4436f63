"""HTML-format table rendering through the full pipeline — ported from
html_test.go TestTableColumnWidths / TestTableHTMLFormat."""

from htmlx.core.extract import Config, Extractor


def ex(html: str) -> str:
    return Extractor(Config(table_format="html")).extract(html.encode()).text


def test_width_from_style_preserved():
    out = ex(
        "<table><tr>"
        '<th style="width:1.0%">Name</th><th style="width:50%">Value</th>'
        '<th style="width:49%">Notes</th></tr>'
        "<tr><td>Item 1</td><td>100</td><td>First</td></tr></table>"
    )
    assert "width:1.0%" in out and "width:50%" in out and "width:49%" in out


def test_width_from_attribute_preserved():
    out = ex(
        '<table><tr><th width="100">Column 1</th><th width="200px">Column 2</th></tr>'
        "<tr><td>Data 1</td><td>Data 2</td></tr></table>"
    )
    assert "width:100" in out and "width:200px" in out


def test_width_and_alignment_combined():
    out = ex(
        '<table><tr><th style="width:30%; text-align:left">Name</th>'
        '<th style="width:70%; text-align:right">Value</th></tr>'
        "<tr><td>Item 1</td><td>100</td></tr></table>"
    )
    assert "text-align:left;width:30%" in out
    assert "text-align:right;width:70%" in out


def test_colspan_rowspan_preserved_html():
    out = ex(
        '<table><tr><th colspan="2">Wide</th></tr>'
        '<tr><td rowspan="2">Tall</td><td>A</td></tr><tr><td>B</td></tr></table>'
    )
    assert 'colspan="2"' in out
    assert 'rowspan="2"' in out


def test_structure_rows_kept_in_html_mode():
    # width-only rows are SKIPPED in markdown but KEPT in html format
    # (table/processor.go:116-120)
    html = (
        '<table><tr><td width="100"> </td><td width="200"> </td></tr>'
        "<tr><td>A</td><td>B</td></tr></table>"
    )
    out_html = ex(html)
    assert out_html.count("<tr>") == 2
    out_md = Extractor(Config(table_format="markdown")).extract(html.encode()).text
    assert "100" not in out_md


def test_html_table_shape():
    out = ex("<table><tr><th>H</th></tr><tr><td>D</td></tr></table>")
    assert "<table>" in out and "</table>" in out
    assert "<th>H</th>" in out and "<td>D</td>" in out
