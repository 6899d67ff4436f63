"""Media extraction — ported from internal/media_test.go / media.go semantics."""

from htmlx.core.extract import extract
from htmlx.core.media import (
    detect_audio_type,
    detect_video_type,
    extract_attribute_value,
    extract_tag_attributes,
    has_media_reference,
    is_video_url,
)


def test_video_type_detection():
    assert detect_video_type("https://x.com/v.mp4") == "video/mp4"
    assert detect_video_type("https://x.com/v.M4V") == "video/mp4"
    assert detect_video_type("https://x.com/v.webm?t=1") == "video/webm"
    assert detect_video_type("https://x.com/v.mov#frag") == "video/quicktime"
    assert detect_video_type("https://www.youtube.com/embed/abc") == "embed"
    assert detect_video_type("https://player.vimeo.com/video/123") == "embed"
    assert detect_video_type("https://x.com/page.html") == ""


def test_audio_type_detection():
    assert detect_audio_type("https://x.com/a.mp3") == "audio/mpeg"
    assert detect_audio_type("https://x.com/a.OGG?x=1") == "audio/ogg"
    assert detect_audio_type("https://x.com/a.flac") == "audio/flac"
    assert detect_audio_type("https://x.com/a.txt") == ""


def test_is_video_url():
    assert is_video_url("https://x.com/v.mkv")
    assert is_video_url("https://bilibili.com/video/x")
    assert not is_video_url("https://x.com/doc.pdf")


def test_has_media_reference_gate():
    assert has_media_reference("see https://x.com/v.mp4 here")
    assert has_media_reference("<iframe src='https://youtube.com/embed/x'>")
    assert has_media_reference("file.MP3")  # case-insensitive
    assert not has_media_reference("<p>plain text, no media at all</p>")


def test_extract_tag_attributes_raw():
    html = '<IFRAME SRC="https://youtube.com/embed/a"></IFRAME><iframe src=unquoted.mp4 width=5>'
    assert extract_tag_attributes(html, "iframe", "src") == [
        "https://youtube.com/embed/a",
        "unquoted.mp4",
    ]
    assert extract_attribute_value('<embed data="x.mp4" src=\'y.mp4\'>', "src") == "y.mp4"
    assert extract_attribute_value("<embed nodata>", "src") == ""


def test_videos_from_sanitized_iframe():
    # iframe is removed by sanitization but the raw-HTML pre-scan still
    # captures it (media.go:39-48)
    html = (
        b"<article><p>Long enough paragraph with actual text content here.</p>"
        b'<iframe src="https://www.youtube.com/embed/xyz" width="560"></iframe></article>'
    )
    r = extract(html)
    urls = {v["url"]: v for v in r.videos}
    assert "https://www.youtube.com/embed/xyz" in urls
    assert urls["https://www.youtube.com/embed/xyz"]["type"] == "embed"


def test_regex_scan_bare_urls():
    html = (
        b"<article><p>Watch https://cdn.x.com/clip.mp4 and listen "
        b"https://cdn.x.com/song.mp3 today.</p></article>"
    )
    r = extract(html)
    assert [v["url"] for v in r.videos] == ["https://cdn.x.com/clip.mp4"]
    assert [a["url"] for a in r.audios] == ["https://cdn.x.com/song.mp3"]
    assert r.videos[0]["type"] == "video/mp4"


def test_media_gate_skips_clean_docs():
    r = extract(b"<article><p>No media anywhere in this document text.</p></article>")
    assert r.videos == [] and r.audios == []


def test_dedup_first_seen():
    html = (
        b"<article><p>Content text for the scorer to chew on properly.</p>"
        b'<video src="https://x.com/v.mp4"></video>'
        b"<p>also https://x.com/v.mp4 in text</p></article>"
    )
    r = extract(html)
    assert len(r.videos) == 1


def test_raw_scan_gate_1mb():
    # >1MB doc: regex/raw scans silently skipped (output-affecting cap,
    # extract.go:788-790); DOM <video> still found
    filler = b"<p>" + b"x" * 1_100_000 + b"</p>"
    html = b"<article>" + filler + b'<video src="https://x.com/v.mp4"></video>' + \
        b"<p>bare https://x.com/other.mp4 url</p></article>"
    r = extract(html)
    urls = [v["url"] for v in r.videos]
    assert "https://x.com/v.mp4" in urls
    assert "https://x.com/other.mp4" not in urls
