"""Frozen-golden regression suite: every fixture category's output must be
byte-identical to tests/fixtures/golden.json (regenerate ONLY deliberately
via tools/freeze_goldens.py)."""

import json
import os

import pytest

from htmlx.fixtures import build_golden, corpus

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "fixtures", "golden.json")


@pytest.fixture(scope="module")
def frozen():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def live():
    return build_golden()


def test_corpus_urls_stable(frozen, live):
    assert set(frozen) == set(live)
    assert len(frozen) >= 20


@pytest.mark.parametrize("url", [u for u, _ in corpus()], ids=[u.split("/", 3)[-1] for u, _ in corpus()])
def test_fixture_matches_golden(url, frozen, live):
    want = frozen[url]
    got = live[url]
    # byte-identical text is the north-rule invariant
    assert got["text"] == want["text"], url
    assert got["title"] == want["title"]
    assert got["word_count"] == want["word_count"]
    assert got["error"] == want["error"]
    assert got["images"] == want["images"]
    assert got["links"] == want["links"]
    assert got["videos"] == want["videos"]
    assert got["audios"] == want["audios"]
    for extra in ("markdown_text", "link_resources"):
        if extra in want:
            assert got[extra] == want[extra], url
