"""Property tests (hypothesis): no exception on arbitrary bytes, determinism
across runs — the engine analogue of fuzz_test.go:13-138."""

from hypothesis import HealthCheck, given, settings, strategies as st

from htmlx.core.extract import Extractor, extract
from htmlx.core.links import extract_all_links

_ex = Extractor()


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=4096))
def test_extract_never_raises(blob):
    r = _ex.extract(blob)
    assert isinstance(r.text, str)
    assert isinstance(r.word_count, int)


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.text(max_size=2048))
def test_extract_text_input_never_raises(s):
    r = _ex.extract(s.encode("utf-8", errors="ignore"))
    assert isinstance(r.text, str)


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=2048))
def test_all_links_never_raises(blob):
    try:
        links = extract_all_links(blob)
    except ValueError:
        return  # size/depth errors are contract errors, not crashes
    assert all(set(l) == {"url", "title", "type"} for l in links)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.binary(max_size=2048))
def test_determinism(blob):
    a = _ex.extract(blob)
    b = _ex.extract(blob)
    assert a.text == b.text
    assert a.title == b.title
    assert a.images == b.images
    assert a.links == b.links
    assert a.videos == b.videos


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.sampled_from(
            ["<p>", "</p>", "<div>", "</div>", "<b>", "</b>", "text ", "&amp;", "<br>",
             "<table>", "<tr>", "<td>x</td>", "</tr>", "</table>", "<li>item</li>",
             "<ul>", "</ul>", "&#65;", "<a href='/x'>l</a>", "<img src='i.jpg'>"]
        ),
        max_size=40,
    )
)
def test_tag_soup_roundtrip(parts):
    html = "".join(parts).encode()
    r = _ex.extract(html)
    assert r.error == "" or r.error.startswith("internal_panic") is False
