"""Inline link/image formatting — ported from html_test.go
TestLinkFormatting (2544-2750) and comprehensive_entity_test.go."""

from htmlx.core.extract import Config, Extractor, extract


def ex(html: str, link_fmt="none", img_fmt="none") -> "Result":
    return Extractor(Config(inline_link_format=link_fmt, inline_image_format=img_fmt)).extract(
        html.encode()
    )


def test_markdown_inline_links():
    html = """<html><body>
        <p>Text before</p>
        <a href="https://go.dev/tour/">Go Tour</a>
        <p>Text middle</p>
        <a href="https://golang.org">Golang</a>
        <p>Text after</p>
    </body></html>"""
    r = ex(html, link_fmt="markdown")
    assert "[Go Tour](https://go.dev/tour/)" in r.text
    assert "[Golang](https://golang.org)" in r.text


def test_html_inline_links():
    html = '<html><body><p>Text before</p><a href="https://go.dev/tour/" title="Go Tour">Go Tour</a><p>Text after</p></body></html>'
    r = ex(html, link_fmt="html")
    assert '<a href="https://go.dev/tour/"' in r.text
    assert 'title="Go Tour"' in r.text
    assert ">Go Tour</a>" in r.text


def test_none_format_default():
    html = '<html><body><a href="https://go.dev">Go</a><p>Text</p></body></html>'
    r = ex(html, link_fmt="none")
    assert "[LINK:" not in r.text
    assert "Go" in r.text
    assert len(r.links) > 0


def test_empty_href_skipped():
    html = '<html><body><a href="">Empty Link</a><a href="https://go.dev">Valid Link</a></body></html>'
    r = ex(html, link_fmt="markdown")
    assert "[Valid Link](https://go.dev)" in r.text


def test_empty_text_fallback():
    html = '<html><body><a href="https://go.dev"></a></body></html>'
    r = ex(html, link_fmt="markdown")
    assert "[Link 1](https://go.dev)" in r.text


def test_markdown_escape_in_link_text():
    html = '<html><body><a href="https://x.com">has [brackets] here</a></body></html>'
    r = ex(html, link_fmt="markdown")
    assert "[has \\[brackets\\] here](https://x.com)" in r.text


def test_image_alt_fallback_markdown():
    html = '<body><article><p>Enough text for selection right here now.</p><img src="p.jpg"></article></body>'
    r = ex(html, img_fmt="markdown")
    assert "![Image 1](p.jpg)" in r.text


# comprehensive_entity_test.go — end-to-end entity conversion
def test_entities_end_to_end():
    cases = [
        ("<p>A&nbsp;B</p>", ["A B"], [" ", "&nbsp;"]),
        ("<p>A&#160;B</p>", ["A B"], [" ", "&#160;"]),
        ("<p>A&#xa0;B</p>", ["A B"], [" "]),
        ("<p>A&#xA0;B</p>", ["A B"], [" "]),
        ("<p>&amp; &lt; &gt; &quot; &apos;</p>", ["&", "<", ">", '"', "'"], ["&amp;", "&lt;"]),
        ("<p>a&mdash;b&ndash;c</p>", ["—", "–"], ["&mdash;", "&ndash;"]),
        (
            "<p>&lsquo;q&rsquo; &ldquo;d&rdquo;</p>",
            ["‘", "’", "“", "”"],
            ["&lsquo;", "&rdquo;"],
        ),
        ("<p>wait&hellip;</p>", ["…"], ["&hellip;"]),
        ("<p>&copy; &reg; &trade;</p>", ["©", "®", "™"], ["&copy;", "&trade;"]),
    ]
    for html, must, must_not in cases:
        r = extract(html.encode())
        for m in must:
            assert m in r.text, (html, r.text)
        for m in must_not:
            assert m not in r.text, (html, r.text)
